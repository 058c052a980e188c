"""Test harness config.

Default: run everything on a virtual 8-device CPU mesh (the environment
must be set before the first ``import jax`` anywhere in the test
process; pytest imports this conftest first).

Real-chip mode: ``ORPHICS_TPU_TESTS=1 python -m pytest tests/ -m tpu -q``
keeps the session's default (axon TPU) backend and runs only the tests
marked ``tpu`` — the on-chip Pallas kernel/RNG checks that interpreter
mode cannot exercise. In this mode the CPU-mesh tests are skipped (they
need the 8-device virtual mesh) and x64 stays off (TPU is fp32).
"""
import os

import pytest

RUN_TPU = os.environ.get("ORPHICS_TPU_TESTS") == "1"

if not RUN_TPU:
    # Force CPU: the session env may point JAX at a single real TPU (axon);
    # the test suite must run on the virtual 8-device CPU mesh regardless.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compile cache: the suite is compile-bound on repeat
# runs (round-close verification re-runs everything), and jax 0.9
# caches CPU executables too — 2-3x off warm full-suite latency.
_CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

if not RUN_TPU:
    # The axon sitecustomize re-registers the TPU and rewrites jax_platforms
    # to "axon,cpu" regardless of the env var; pin it back to CPU for tests.
    jax.config.update("jax_platforms", "cpu")
    # Tests exercise float64 closed-form identities (the reference is
    # float64 numpy); production TPU paths pass explicit float32 dtypes.
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: requires a real TPU chip (run: ORPHICS_TPU_TESTS=1 "
        "python -m pytest tests/ -m tpu -q)")
    config.addinivalue_line(
        "markers", "slow: multi-process / large-shape tests")
    config.addinivalue_line(
        "markers",
        "quick: fast regression tier (python -m pytest tests/ -m quick)")


# Known-heavy tests that must not represent their module in the quick
# tier (jit-compile-bound or large-shape).
_QUICK_EXCLUDE = (
    "4096", "multichip", "two_process", "example_runs", "checkpoint",
    "lensed_cls", "roundtrip_lmax", "pallas",
)


def pytest_collection_modifyitems(config, items):
    # `-m quick` regression tier: the first non-slow, non-tpu test of
    # every module is auto-marked quick (plus anything explicitly
    # marked). One test per module keeps the tier under ~2 min.
    seen = set()
    for it in items:
        mod = getattr(it, "module", None)
        name = getattr(mod, "__name__", None)
        if name is None or name in seen:
            continue
        if "slow" in it.keywords or "tpu" in it.keywords:
            continue
        if any(tok in it.name.lower() for tok in _QUICK_EXCLUDE):
            continue
        seen.add(name)
        it.add_marker(pytest.mark.quick)
    if RUN_TPU:
        skip = pytest.mark.skip(
            reason="CPU-mesh test skipped in ORPHICS_TPU_TESTS mode")
        for it in items:
            if "tpu" not in it.keywords:
                it.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs a real TPU; run ORPHICS_TPU_TESTS=1 "
                   "pytest tests/ -m tpu")
        for it in items:
            if "tpu" in it.keywords:
                it.add_marker(skip)
