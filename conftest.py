"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Must set the environment before the first ``import jax`` anywhere in the
test process (pytest imports this conftest first).
"""
import os

# Force CPU: the session env may point JAX at a single real TPU (axon);
# the test suite must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize re-registers the TPU and rewrites jax_platforms to
# "axon,cpu" regardless of the env var; pin it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
# Tests exercise float64 closed-form identities (the reference is float64
# numpy); production TPU paths pass explicit float32 dtypes regardless.
jax.config.update("jax_enable_x64", True)
