"""Tracing / profiling utilities (SURVEY §5.1).

The reference's tracing layer is minimal: ``pixell.bench.show`` context
blocks (reference ``lensing.py:152``, ``pixcov.py:3``,
``foregrounds.py:10``) and a ``stats.timeit`` wall-time decorator
(reference ``stats.py:902-913``). The TPU build keeps those shapes and
adds what the hardware actually needs: ``jax.profiler`` traces that can
be opened in XProf/TensorBoard or Perfetto, and named scopes that label
compiled regions inside a jitted program.

Usage::

    from orphics_tpu.utils import profiling as prof

    with prof.trace("/tmp/jaxtrace"):          # device + host trace
        out = step(keys)
        prof.sync(out)

    with prof.show("qe recon"):                # bench.show analog
        out = step(keys)
        prof.sync(out)

    @jax.jit
    def step(x):
        with prof.annotate("filter"):          # label inside jit
            y = filt(x)
        return bin(y)

``bench.py`` honors ``BENCH_TRACE=<logdir>`` to wrap the timed reps of
every config in a profiler trace.
"""
from __future__ import annotations

import contextlib
import time
import warnings

import numpy as np
import jax

__all__ = ["trace", "annotate", "show", "sync", "timeit"]

from .fitting import timeit  # re-export: decorator form lives there


def sync(out):
    """Block until ``out`` is actually computed.

    ``jax.block_until_ready`` is a no-op on the axon backend (async work
    is not tracked), so this forces a host transfer of one scalar-sized
    slice — the only honest sync primitive there. On CPU/standard TPU it
    falls back to ``block_until_ready`` (no transfer).
    """
    leaves = jax.tree_util.tree_leaves(out)
    if not leaves:
        return out
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        backend = ""
    if backend == "axon":
        for leaf in leaves:
            if hasattr(leaf, "ravel"):
                _ = np.asarray(jax.numpy.real(leaf.ravel()[:1]))
    else:
        jax.block_until_ready(leaves)
    return out


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """``jax.profiler.trace`` wrapper that degrades gracefully.

    Captures a device+host trace into ``logdir`` (open with XProf /
    TensorBoard's profile plugin, or the generated Perfetto link). On
    backends whose profiler plumbing is unavailable (remote axon
    tunnels), emits a warning and runs the block untraced instead of
    crashing the pipeline.
    """
    try:
        jax.profiler.start_trace(logdir,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception as e:  # pragma: no cover - backend-dependent
        warnings.warn(f"jax.profiler unavailable ({type(e).__name__}: {e}); "
                      "running untraced")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                warnings.warn(f"stop_trace failed: {e}")


def annotate(name: str):
    """Named scope usable inside jitted code: XLA ops emitted under this
    context carry ``name`` in their metadata, so kernels group under it
    in trace viewers. (``jax.named_scope`` — works under ``jit``; for
    host-side spans around dispatch use :func:`trace` + TraceAnnotation.)
    """
    return jax.named_scope(name)


@contextlib.contextmanager
def show(label: str = "block"):
    """The ``pixell.bench.show`` analog: wall-time a block and print it.

    Blocks are synced by the *caller* (call :func:`sync` on the block's
    outputs before leaving it) — an un-synced async dispatch would time
    at ~0. Prints ``<label>: <seconds> s`` like the reference.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        print(f"{label}: {time.perf_counter() - t0:.6f} s")
