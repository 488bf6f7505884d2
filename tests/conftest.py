"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver dry-runs the real multi-chip path
separately).  The environment's sitecustomize pre-imports jax with the TPU
('axon') platform, so the platform must be forced via jax.config, not env
vars.  x64 is enabled so fp64 gradient checks are possible; all framework
code pins its dtypes explicitly.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests exercise the fused Pallas kernels in interpret mode on CPU; outside
# tests a non-TPU platform falls back to the composable path instead
# (ops/pallas/__init__.py:fused_kernel_mode).
os.environ.setdefault("TORCHMDNET_TPU_INTERPRET_FUSED", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
