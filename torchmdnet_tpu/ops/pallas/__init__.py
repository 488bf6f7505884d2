"""Pallas TPU kernels.

:func:`fused_kernel_mode` is the single platform gate for the fused
edge-phase kernels (et_message.py / tn_message.py / t_message.py — GN
deliberately has no fused kernel; its edge phase already sits on the
row-gather floor, see benchmarks/exp_gn_floor.py and PERF.md): they run
compiled on a real TPU (incl. the 'axon' tunnel platform), in interpret mode
only when a test explicitly opts in via TORCHMDNET_TPU_INTERPRET_FUSED=1, and
are otherwise skipped in favor of the composable path — interpret mode is
orders of magnitude slower than the composable ops it would replace, so it
must never be a silent fallback on GPU/CPU.
"""

import os


def fused_jit_options() -> dict:
    """Compiler options that raise the TPU scoped-VMEM limit.

    XLA's buffer assignment sometimes stacks a fused kernel's output in
    scoped VMEM right next to the kernel's own ~16 MB working set, blowing
    the default 16 MB scoped limit ("Ran out of memory in memory space vmem
    while allocating on stack").  Raising the limit through per-jit
    compiler_options works even through the remote-compile tunnel (the
    option rides the compile request; client-side XLA_FLAGS cannot carry
    TPU-only flags).  Empty off-TPU (the option is unknown to CPU/GPU
    compilers).

    IMPORTANT: do not apply unconditionally — a raised limit changes buffer
    assignment for programs that FIT the default and measurably slows them
    (GN DHFR forward 2.83 -> 3.1 ms, fused ET forces 38.6 -> 49.9 ms).
    Use :func:`jit_vmem_retry`, which pays the raise only when the default
    compile actually overflows.
    """
    if fused_kernel_mode() == "compiled":
        # observed stacked needs up to ~34 MB (ET bwd at W=640 + outputs);
        # 48 MB verified running on the v5e (a 64 MB probe executed fine)
        return {
            "compiler_options": {"xla_tpu_scoped_vmem_limit_kib": "49152"}
        }
    return {}


def fused_jit_options_high() -> dict:
    """Second retry rung: the TN second-order kernel's stacked outputs + the
    nested-autodiff working set demand ~74 MB at DHFR (W=384); the v5e's
    128 MB physical VMEM accommodates it when nothing else contends.  Only
    ever applied after BOTH the default and the 48 MB compile overflowed."""
    if fused_kernel_mode() == "compiled":
        return {
            "compiler_options": {"xla_tpu_scoped_vmem_limit_kib": "98304"}
        }
    return {}


def jit_vmem_retry(fn, **jit_kwargs):
    """jax.jit that retries compilation with a raised scoped-VMEM limit.

    Compiles at the platform default first (best buffer assignment); if the
    compile fails with a scoped-vmem stack overflow — which some fused
    kernel + autodiff compositions trigger (see fused_jit_options) — the
    call transparently recompiles with the raised limit and proceeds.
    Donated buffers are safe: compile errors surface before execution, so
    the retry sees live arguments.
    """
    import jax

    base = jax.jit(fn, **jit_kwargs)
    state = {"fallback": None}

    def call(*args, **kwargs):
        if state["fallback"] is not None:
            return state["fallback"](*args, **kwargs)
        try:
            return base(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 - filtered by message below
            msg = str(e)
            if "vmem" not in msg.lower() or "limit" not in msg.lower():
                raise
            for opts_fn in (fused_jit_options, fused_jit_options_high):
                opts = opts_fn()
                if not opts:
                    raise
                cand = jax.jit(fn, **jit_kwargs, **opts)
                try:
                    out = cand(*args, **kwargs)
                except Exception as e2:  # noqa: BLE001
                    msg2 = str(e2)
                    if "vmem" not in msg2.lower() or "limit" not in msg2.lower():
                        raise
                    continue
                state["fallback"] = cand
                return out
            raise

    return call


def fused_kernel_mode():
    """How the fused Pallas kernels may execute on this platform.

    Returns:
        "compiled" on a real TPU (or the axon TPU tunnel), "interpret" when
        TORCHMDNET_TPU_INTERPRET_FUSED=1 is set (tests), else None (the
        caller must use the composable path).
    """
    import jax

    if jax.devices()[0].platform in ("tpu", "axon"):
        return "compiled"
    if os.environ.get("TORCHMDNET_TPU_INTERPRET_FUSED"):
        return "interpret"
    return None
