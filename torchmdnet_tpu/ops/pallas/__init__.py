"""Pallas TPU kernels.

:func:`fused_kernel_mode` is the single platform gate for the fused
edge-phase kernels (et_message.py / tn_message.py / gn_message.py): they run
compiled on a real TPU (incl. the 'axon' tunnel platform), in interpret mode
only when a test explicitly opts in via TORCHMDNET_TPU_INTERPRET_FUSED=1, and
are otherwise skipped in favor of the composable path — interpret mode is
orders of magnitude slower than the composable ops it would replace, so it
must never be a silent fallback on GPU/CPU.
"""

import os


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
