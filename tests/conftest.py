"""Test harness configuration.

Tests run on CPU with 8 virtual devices (for sharding tests) and with
f64 enabled — the dense-oracle and finite-difference checks mirror the
reference's 1e-8..1e-10 tolerances (reference: test/coreop.jl), which
need double precision. TPU runs use f32 (see bench.py).
"""

import os

# Force CPU: the session environment presets JAX_PLATFORMS to the TPU
# plugin, but unit tests must run on the host (8 virtual devices, f64).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Belt and braces: if a pytest plugin imported jax before this conftest,
# the env var above is too late — set the config directly (effective any
# time before backend initialization).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
