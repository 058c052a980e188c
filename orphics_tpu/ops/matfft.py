"""FFT as MXU matmuls — the TPU-native transform for the hot pipelines.

XLA's TPU FFT runs ~4-5x off the HBM roofline for 2048^2 grids (measured
~1.4 ms per c2c on v5e). The systolic array, however, is nearly idle in
FFT-heavy pipelines. This module evaluates the DFT by a single
Cooley-Tukey split N = A*B executed as two batched einsums plus a twiddle
multiply:

  X[ka + A*kb] = sum_b w_N^(b*ka) w_B^(b*kb) [ sum_a w_A^(a*ka) x[B*a+b] ]

i.e. (N/B x B) reshapes contracted against dense DFT(A) / DFT(B) matrices
— 21x more FLOPs than a radix-2 FFT at N=2048, but they ride the MXU at
two orders of magnitude higher throughput. Matmuls use HIGHEST precision
(bf16x3 passes) to hold fp32-level accuracy (~1e-6 relative).

Kept as a pure-XLA einsum reference implementation: the production fast
path is :mod:`orphics_tpu.ops.pallas_fft` (fused Pallas kernels, ~3x
XLA); this module is useful where Pallas is unavailable and for
cross-checking. Falls back to ``jnp.fft`` for axes it cannot factor.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["matfft2", "matifft2", "matfft_axis", "good_size"]

_PREC = jax.lax.Precision.HIGHEST


def _split(n):
    """Pick A*B = n with A, B as close as possible (A >= B)."""
    best = None
    a = int(np.sqrt(n))
    while a >= 2:
        if n % a == 0:
            b, aa = a, n // a
            best = (max(aa, b), min(aa, b))
            break
        a -= 1
    return best


@lru_cache(maxsize=64)
def _plans(n):
    sp = _split(n)
    if sp is None or sp[1] < 2:
        return None
    A, B = sp
    ja = np.arange(A)
    jb = np.arange(B)
    FA = np.exp(-2j * np.pi * np.outer(ja, ja) / A).astype(np.complex64)
    FB = np.exp(-2j * np.pi * np.outer(jb, jb) / B).astype(np.complex64)
    TW = np.exp(-2j * np.pi * np.outer(ja, jb) / n).astype(np.complex64)  # (A,B): ka*b
    # numpy only: jnp constants created inside a trace must not be cached
    return (A, B, FA, FB, TW)


def good_size(n: int) -> bool:
    return _plans(n) is not None


def matfft_axis(x, axis: int = -1, inverse: bool = False):
    """DFT along one axis via the A*B matmul split (complex in/out)."""
    n = x.shape[axis]
    plan = _plans(n)
    if plan is None:
        f = jnp.fft.ifft if inverse else jnp.fft.fft
        return f(x, axis=axis)
    A, B, FA, FB, TW = plan
    if inverse:
        FA, FB, TW = FA.conj(), FB.conj(), TW.conj()
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    x4 = x.reshape(lead + (A, B))                      # [a, b], n = B*a + b
    s1 = jnp.einsum("ka,...ab->...kb", FA, x4, precision=_PREC)
    s2 = s1 * TW                                        # [ka, b]
    x2 = jnp.einsum("pb,...kb->...kp", FB, s2, precision=_PREC)  # [ka, kb]
    out = jnp.swapaxes(x2, -1, -2).reshape(lead + (n,))  # k = ka + A*kb
    if inverse:
        out = out / n
    return jnp.moveaxis(out, -1, axis)


@partial(jax.jit, static_argnames=())
def matfft2(x):
    """2D forward DFT over the trailing two axes (raw normalization)."""
    x = x.astype(jnp.complex64)
    return matfft_axis(matfft_axis(x, -1), -2)


@partial(jax.jit, static_argnames=())
def matifft2(x):
    """2D inverse DFT over the trailing two axes (raw = numpy ifft norm)."""
    x = x.astype(jnp.complex64)
    return matfft_axis(matfft_axis(x, -1, inverse=True), -2, inverse=True)
