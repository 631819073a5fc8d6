"""Test harness configuration.

Tests run on CPU with 8 virtual devices (for sharding tests) and with
f64 enabled — the dense-oracle and finite-difference checks mirror the
reference's 1e-8..1e-10 tolerances (reference: test/coreop.jl), which
need double precision. TPU runs use f32 (see bench.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
