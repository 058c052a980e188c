"""Pallas TPU kernel: column-axis DFT as MXU matmuls.

XLA's TPU FFT runs ~8x off the HBM roofline per axis (~0.7-0.8 ms per
2048-axis transform of a 2048^2 map). This kernel evaluates the
column-axis (axis=-2) DFT with a single Cooley-Tukey split N = B*A
(B = N/128 blocks of A = 128 rows; any B >= 2 — power-of-2 B uses
radix-2 butterflies for stage 1, other B a compile-time mixed-radix
DFT) entirely as matrix products that ride the MXU, streaming column
tiles through VMEM:

  n = a + A*b,  k = k2 + B*k1  (a,k1 in [0,A), b,k2 in [0,B))
  G[k2, a, c]   = sum_b  FB[k2, b] X[b, a, c]        (16x16 matmul)
  H[k2, a, c]   = G * w_N^(a k2)                      (twiddle)
  out[k2, k1,c] = sum_a  FA[k1, a] H[k2, a, c]        (128x128 matmuls)

The output rows are stored in the *permuted* order p = A*k2 + k1
(natural frequency k = k2 + B*k1): ``row_perm(N)`` gives the static
permutation. Downstream static grids (bin ids, covsqrt tables, masks)
absorb the permutation at zero cost; ``natural_rows`` applies a single
row gather when natural ordering is required. The inverse kernel accepts
permuted-row input and produces natural-order output, so
ifft(col) o fft(col) round-trips without any gather.

Complex arithmetic is carried as separate re/im fp32 planes (the axon
backend lacks complex support in several paths, and two f32 planes map
better onto the MXU anyway).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    # layout
    "row_perm", "natural_rows", "half_rows", "permuted_bin_tables",
    # 1D passes
    "colfft", "colifft", "colfft_scaled", "rowfft", "rowifft",
    "rowfft_blk0", "rowifft_noise_y", "ifft2pp_noise_y",
    # 2D transforms (permuted and natural order)
    "fft2p", "ifft2p", "fft2pp", "ifft2pp", "ifft2pp_scaled",
    "ifft2pp_noise", "pfft2", "pifft2",
    # fused mirror / power / combine passes
    "mirror_pp", "qc_pp_half", "s_pp_half", "rowqc_pp", "rows_pp",
    "fft2pp_qc", "fft2pp_s", "rowcombine_pp",
    # on-chip noise producers
    "noise_planes",
]

_PREC = jax.lax.Precision.HIGHEST

# MXU dot strategy for the 128-point DFT stages. Mosaic supports only
# DEFAULT (one bf16 pass) and HIGHEST (~6-pass fp32 emulation) in-kernel;
# "split3" evaluates fp32 x fp32 as three bf16 passes (ah bh + ah bl +
# al bh, dropping the ~2^-32 al bl term) — fp32-split-float accuracy
# (~1.5e-5 relative on a 2048-point transform, i.e. ~3e-5 on bandpowers,
# well inside the 1e-4 accuracy budget) at half HIGHEST's MXU time.
# Set ORPHICS_TPU_FFT_PRECISION=exact to force HIGHEST everywhere.
# Interpret mode (CPU tests) always uses HIGHEST (bit-stable references).
_FAST = os.environ.get("ORPHICS_TPU_FFT_PRECISION", "split3") != "exact"


def _bsplit(x):
    """Split fp32 into a bf16 head + bf16 tail with x ~= hi + lo."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mxu_dot(a, b, fast, sa=None, sb=None):
    """fp32 a @ b on the MXU: 3-pass bf16 split-float when ``fast``,
    Precision.HIGHEST otherwise. ``sa``/``sb``: precomputed _bsplit of a
    constant operand (hoisted out of the kernel loops).

    The three bf16 passes (ah bh + ah bl + al bh) are packed into ONE
    dot over a 3K contraction axis — [ah, ah, al] @ [bh; bl; bh] — so
    the Mosaic program stays one matmul op per product (the 3-dot form
    tripled kernel code size and blew compile times past 200 s even for
    small grids)."""
    if not fast:
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=_PREC)
    ah, al = sa if sa is not None else _bsplit(a)
    bh, bl = sb if sb is not None else _bsplit(b)
    a3 = jnp.concatenate([ah, ah, al], axis=-1)
    b3 = jnp.concatenate([bh, bl, bh], axis=-2)
    return jnp.dot(a3, b3, preferred_element_type=jnp.float32)


def _perm_dot(a, J, fast):
    """a @ J where J is a 0/1 permutation matrix: THREE bf16 passes are
    exact (J is exactly representable and each output is one input
    value, so exactness only needs a == a1+a2+a3 — fp32's 24 significand
    bits split exactly into 3x8 bf16 terms), vs 6 HIGHEST passes.
    Packed as one dot over a 3K axis. (A 2-term split is NOT exact:
    bf16(a - bf16(a)) drops fp32 bits 17-24, ~1e-5 relative — measured;
    the mirror must be a bit-exact copy for the Hermitian splits
    downstream.)"""
    if not fast:
        return jnp.dot(a, J, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    a1 = a.astype(jnp.bfloat16)
    r1 = a - a1.astype(jnp.float32)     # exact in fp32 (<= 16 bits)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)  # <= 8 bits
    Jh = J.astype(jnp.bfloat16)
    a3k = jnp.concatenate([a1, a2, a3], axis=-1)
    J3 = jnp.concatenate([Jh, Jh, Jh], axis=-2)
    return jnp.dot(a3k, J3, preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=8)
def _plan(n, inverse):
    A, B = 128, n // 128
    assert A * B == n and B >= 2, f"n={n} must be 128*B"
    sgn = 2j * np.pi / n if inverse else -2j * np.pi / n
    ja = np.arange(A)
    jb = np.arange(B)
    FB = np.exp(sgn * np.outer(jb, jb) * A)           # omega_B^(k2 b)
    FA = np.exp(sgn * np.outer(ja, ja) * B)           # omega_A^(k1 a)
    TW = np.exp(sgn * np.outer(jb, ja))               # omega_N^(k2 a)
    return (A, B,
            FB.real.astype(np.float32), FB.imag.astype(np.float32),
            FA.real.astype(np.float32), FA.imag.astype(np.float32),
            TW.real.astype(np.float32), TW.imag.astype(np.float32))


def row_perm(n: int):
    """perm such that out_permuted[p] holds frequency k: p = A*k2 + k1
    with k = k2 + B*k1 (A=128, B=n//128). Returns (perm, inv_perm):
    ``natural = permuted[inv_perm]`` and ``permuted = natural[perm]``."""
    A, B = 128, n // 128
    ks = np.arange(n)
    p_of_k = A * (ks % B) + ks // B
    inv = np.empty(n, dtype=np.int32)
    inv[ks] = p_of_k          # natural[k] = permuted[p_of_k]
    perm = np.argsort(inv).astype(np.int32)
    return perm, inv


def permuted_bin_tables(modlmap, perm, edges):
    """Radial-binning tables for the MXU bin reduce on doubly-permuted
    full planes: digitize |l| against ``edges`` in the [perm][:, perm]
    layout, with the np.digitize overflow segment (== len(edges))
    folded into the out-of-range segment 0. Returns (idc, icnt, nseg):
    flat int32 segment ids, per-bin inverse counts (skipping segment
    0), and the segment count. Shared by the bench config-3 plan and
    LensedQEPipeline — keep the convention in ONE place.
    digitize(right=True) — (lo, hi] bins — matching Bin2D/RfftBin2D
    (the reference's stats.bin2D convention), so a mode exactly on an
    edge bins identically on the Pallas and XLA paths."""
    import jax.numpy as _jnp
    dig = np.digitize(np.asarray(modlmap, np.float64)[perm][:, perm],
                      np.asarray(edges), right=True).astype(np.int32)
    dig[dig == len(edges)] = 0
    nseg = len(edges)
    idc = _jnp.asarray(dig.ravel())
    icnt = _jnp.asarray(
        (1.0 / np.maximum(np.bincount(dig.ravel(), minlength=nseg),
                          1))[1:].astype(np.float32))
    return idc, icnt, nseg


def _fwd_kernel(FAre_ref, FAim_ref, TWre_ref, TWim_ref,
                xre_ref, xim_ref, ore_ref, oim_ref, *, A, B, fast):
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None
    C = xre_ref.shape[-1]
    # stage 1: B-point DFT over the block index b — static butterflies /
    # mixed-radix with baked twiddles (mostly adds; beats MXU matmuls
    # for this shape)
    xr = [xre_ref[0, b_ * A:(b_ + 1) * A, :] for b_ in range(B)]
    xi = [xim_ref[0, b_ * A:(b_ + 1) * A, :] for b_ in range(B)]
    gr, gi = _fft_static(xr, xi, -1.0)
    _fwd_stage2(FAre, FAim, TWre, TWim, sFre, sFim, gr, gi,
                ore_ref, oim_ref, A=A, B=B, fast=fast)


def _fwd_scaled_kernel(FAre_ref, FAim_ref, TWre_ref,
                       TWim_ref, sc_ref, xre_ref, xim_ref, ore_ref,
                       oim_ref, *, A, B, fast):
    """Forward column DFT with an elementwise pre-multiplier fused onto
    the load (the usual use: an apodization taper — the masked maps
    never materialize in HBM)."""
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None
    xr = [xre_ref[0, b_ * A:(b_ + 1) * A, :]
          * sc_ref[b_ * A:(b_ + 1) * A, :] for b_ in range(B)]
    xi = [xim_ref[0, b_ * A:(b_ + 1) * A, :]
          * sc_ref[b_ * A:(b_ + 1) * A, :] for b_ in range(B)]
    gr, gi = _fft_static(xr, xi, -1.0)
    _fwd_stage2(FAre, FAim, TWre, TWim, sFre, sFim, gr, gi,
                ore_ref, oim_ref, A=A, B=B, fast=fast)


def _fwd_stage2(FAre, FAim, TWre, TWim, sFre, sFim, gr, gi,
                ore_ref, oim_ref, *, A, B, fast):
    # stage 2 streamed per k2: twiddle + 128-point MXU DFT
    for k2 in range(B):
        twr = TWre[k2][:, None]
        twi = TWim[k2][:, None]
        hrk = gr[k2] * twr - gi[k2] * twi
        hik = gr[k2] * twi + gi[k2] * twr
        shr = _bsplit(hrk) if fast else None
        shi = _bsplit(hik) if fast else None
        orr = (_mxu_dot(FAre, hrk, fast, sa=sFre, sb=shr)
               - _mxu_dot(FAim, hik, fast, sa=sFim, sb=shi))
        oii = (_mxu_dot(FAre, hik, fast, sa=sFre, sb=shi)
               + _mxu_dot(FAim, hrk, fast, sa=sFim, sb=shr))
        ore_ref[0, k2 * A:(k2 + 1) * A, :] = orr
        oim_ref[0, k2 * A:(k2 + 1) * A, :] = oii


def _inv_kernel(FAre_ref, FAim_ref, TWre_ref, TWim_ref,
                xre_ref, xim_ref, ore_ref, oim_ref, *, A, B, fast):
    """Inverse with P-permuted input rows -> natural-order output."""
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None
    C = xre_ref.shape[-1]
    inv_n = 1.0 / (A * B)
    # stage 1 streamed per permuted block k2: 128-point MXU DFT + twiddle.
    # The J intermediates are staged in the output refs to save VMEM.
    for k2 in range(B):
        xr = xre_ref[0, k2 * A:(k2 + 1) * A, :]
        xi = xim_ref[0, k2 * A:(k2 + 1) * A, :]
        sxr = _bsplit(xr) if fast else None
        sxi = _bsplit(xi) if fast else None
        ir = (_mxu_dot(FAre, xr, fast, sa=sFre, sb=sxr)
              - _mxu_dot(FAim, xi, fast, sa=sFim, sb=sxi))
        ii = (_mxu_dot(FAre, xi, fast, sa=sFre, sb=sxi)
              + _mxu_dot(FAim, xr, fast, sa=sFim, sb=sxr))
        twr = TWre[k2][:, None]
        twi = TWim[k2][:, None]
        ore_ref[0, k2 * A:(k2 + 1) * A, :] = (ir * twr - ii * twi) * inv_n
        oim_ref[0, k2 * A:(k2 + 1) * A, :] = (ir * twi + ii * twr) * inv_n
    # stage 2: 16-point DFT over k2 -> natural blocks b (rows a + A*b),
    # via radix butterflies with baked twiddles
    jr = [ore_ref[0, k2 * A:(k2 + 1) * A, :] for k2 in range(B)]
    ji = [oim_ref[0, k2 * A:(k2 + 1) * A, :] for k2 in range(B)]
    br, bi = _fft_static(jr, ji, 1.0)
    for b_ in range(B):
        ore_ref[0, b_ * A:(b_ + 1) * A, :] = br[b_]
        oim_ref[0, b_ * A:(b_ + 1) * A, :] = bi[b_]


def _call(kernel, xre, xim, A, B, consts, ctile, interpret):
    b, n, ncols = xre.shape
    nt = ncols // ctile
    assert nt * ctile == ncols, (ncols, ctile)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(b, nt),
        in_specs=[
            const_spec((A, A)), const_spec((A, A)),
            const_spec((B, A)), const_spec((B, A)),
            pl.BlockSpec((1, n, ctile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, ctile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, ctile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, ctile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
    )
    flops_mm = b * ncols * n * (128 + B) * 8
    # consts = (FBre, FBim, FAre, FAim, TWre, TWim) from _plan; the
    # stage-1 B-point DFT uses _fft_static's baked twiddles, so the FB
    # matrices are dead — ship only FA/TW to the kernels
    cj = [jnp.asarray(c) for c in consts[2:]]
    return pl.pallas_call(
        functools.partial(kernel, A=A, B=B, fast=_FAST and not interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(xre.shape, jnp.float32),
                   jax.ShapeDtypeStruct(xre.shape, jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_mm, bytes_accessed=4 * 4 * b * n * ncols,
            transcendentals=0),
    )(*cj, xre, xim)


@functools.partial(jax.jit, static_argnames=("ctile", "interpret"))
def colfft(xre, xim, ctile: int = 128, interpret: bool = False):
    """DFT along axis -2 of (B, N, C) re/im f32 planes; output rows in
    ``row_perm`` order."""
    n = xre.shape[-2]
    A, B, *consts = _plan(n, False)
    return _call(_fwd_kernel, xre, xim, A, B, tuple(consts), ctile, interpret)


@functools.partial(jax.jit, static_argnames=("ctile", "interpret"))
def colfft_scaled(xre, xim, scale, ctile: int = 128,
                  interpret: bool = False):
    """``colfft(scale * xre, scale * xim)`` with the elementwise product
    fused onto the kernel's load — the scaled (e.g. apodized) maps never
    round-trip HBM. ``scale``: (n, n) fp32 in natural map layout."""
    b, n, ncols = xre.shape
    A, B, *consts = _plan(n, False)
    nt = ncols // ctile
    assert nt * ctile == ncols, (ncols, ctile)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    cj = [jnp.asarray(c) for c in consts[2:]]   # skip dead FB
    return pl.pallas_call(
        functools.partial(_fwd_scaled_kernel, A=A, B=B,
                          fast=_FAST and not interpret),
        grid=(nt, b),  # batch innermost: scale tile resident across it
        in_specs=[
            const_spec((A, A)), const_spec((A, A)),
            const_spec((B, A)), const_spec((B, A)),
            pl.BlockSpec((n, ctile), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, ctile), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, ctile), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, n, ctile), lambda j, i: (i, 0, j),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct(xre.shape, jnp.float32)] * 2,
        interpret=interpret,
    )(*cj, scale.astype(jnp.float32), xre, xim)


@functools.partial(jax.jit, static_argnames=("ctile", "interpret"))
def colifft(xre, xim, ctile: int = 128, interpret: bool = False):
    """Inverse DFT along axis -2 accepting ``row_perm``-ordered input and
    producing natural-order output (includes the 1/N factor)."""
    n = xre.shape[-2]
    A, B, *consts = _plan(n, True)
    return _call(_inv_kernel, xre, xim, A, B, tuple(consts), ctile, interpret)


def natural_rows(x, n=None):
    """Reorder permuted-row output to natural frequency order (static row
    gather)."""
    n = n or x.shape[-2]
    _, inv = row_perm(n)
    return jnp.take(x, jnp.asarray(inv), axis=-2)


def fft2p(zre, zim, ctile: int = 128):
    """Full 2D FFT with axis -2 via the Pallas kernel (rows left in
    permuted order) and axis -1 via XLA (row order irrelevant).

    Returns (re, im) planes of fft2(z) with rows permuted by
    ``row_perm``; use static-permuted downstream grids or
    :func:`natural_rows` to reorder.
    """
    yre, yim = colfft(zre, zim, ctile=ctile)
    k = jnp.fft.fft(yre + 1j * yim, axis=-1)
    return k.real, k.imag


def ifft2p(kre, kim, ctile: int = 128):
    """Inverse of :func:`fft2p`: input rows in permuted order, natural
    output."""
    z = jnp.fft.ifft(kre + 1j * kim, axis=-1)
    return colifft(z.real, z.imag, ctile=ctile)


# ----------------------------------------------------------------------
# row-axis (lane) DFT kernel: radix FFT over the 16 lane-chunks (static
# python twiddles, mostly additions) + per-chunk 128-point MXU DFTs from
# the right. Output columns in row_perm order (same contract as colfft).
# ----------------------------------------------------------------------

def _fft_static(re, im, sign):
    """DFT of a list of (R, A) planes over the list index, entirely with
    compile-time constants: radix-2 DIT butterflies for power-of-2
    lengths, mixed-radix Cooley-Tukey (smallest-prime splits, pow2
    sub-lengths routed back to the butterfly path) otherwise. Lists in
    natural order in, natural frequency order out."""
    nloc = len(re)
    if nloc & (nloc - 1) == 0:
        return _fft16_static(re, im, sign)
    p = next(q for q in range(2, nloc + 1) if nloc % q == 0)
    m = nloc // p
    subs = [_fft_static(re[r::p], im[r::p], sign) for r in range(p)]
    out_r = [None] * nloc
    out_i = [None] * nloc
    for kk in range(nloc):
        k = kk % m
        accr, acci = subs[0][0][k], subs[0][1][k]
        for r in range(1, p):
            w = np.exp(sign * 2j * np.pi * r * kk / nloc)
            wr, wi = float(w.real), float(w.imag)
            yr, yi = subs[r][0][k], subs[r][1][k]
            if abs(wi) < 1e-12:     # w = +-1
                tr, ti = wr * yr, wr * yi
            elif abs(wr) < 1e-12:   # w = +-i
                tr, ti = -wi * yi, wi * yr
            else:
                tr = wr * yr - wi * yi
                ti = wr * yi + wi * yr
            accr = accr + tr
            acci = acci + ti
        out_r[kk], out_i[kk] = accr, acci
    return out_r, out_i


def _fft16_static(re, im, sign):
    """Power-of-2 DFT of a list of (R, A) planes via radix-2 DIT with
    baked twiddle constants. re/im: lists in natural order; returns lists
    in natural frequency order."""
    nloc = len(re)
    assert nloc & (nloc - 1) == 0, nloc
    nbits = nloc.bit_length() - 1
    order = [int(format(i, f"0{nbits}b")[::-1], 2) if nbits else 0
             for i in range(nloc)]
    xr = [re[i] for i in order]
    xi = [im[i] for i in order]
    size = 2
    while size <= nloc:
        half = size // 2
        tw = np.exp(sign * 2j * np.pi * np.arange(half) / size)
        for start in range(0, nloc, size):
            for j in range(half):
                wr, wi = float(tw[j].real), float(tw[j].imag)
                a, b = start + j, start + j + half
                if j == 0:  # w = 1
                    tr, ti = xr[b], xi[b]
                elif abs(wr) < 1e-12:  # w = +-i
                    tr, ti = -wi * xi[b], wi * xr[b]
                else:
                    tr = wr * xr[b] - wi * xi[b]
                    ti = wr * xi[b] + wi * xr[b]
                xr[b] = xr[a] - tr
                xi[b] = xi[a] - ti
                xr[a] = xr[a] + tr
                xi[a] = xi[a] + ti
        size *= 2
    return xr, xi


def _rowfft_kernel(FAre_ref, FAim_ref, TWre_ref, TWim_ref,
                   xre_ref, xim_ref, ore_ref, oim_ref, *, A, B, inverse,
                   fast):
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None
    sign = 1.0 if inverse else -1.0
    inv_n = 1.0 / (A * B) if inverse else 1.0
    if inverse:
        # input columns are in permuted order: chunk k2 holds lanes k1.
        # stage 1: per-chunk 128-point inverse DFT + twiddle
        jr = []
        ji = []
        for k2 in range(B):
            xr = xre_ref[0, :, k2 * A:(k2 + 1) * A]
            xi = xim_ref[0, :, k2 * A:(k2 + 1) * A]
            sxr = _bsplit(xr) if fast else None
            sxi = _bsplit(xi) if fast else None
            ir = (_mxu_dot(xr, FAre, fast, sa=sxr, sb=sFre)
                  - _mxu_dot(xi, FAim, fast, sa=sxi, sb=sFim))
            ii = (_mxu_dot(xi, FAre, fast, sa=sxi, sb=sFre)
                  + _mxu_dot(xr, FAim, fast, sa=sxr, sb=sFim))
            twr = TWre[k2][None, :]
            twi = TWim[k2][None, :]
            jr.append(ir * twr - ii * twi)
            ji.append(ir * twi + ii * twr)
        # stage 2: 16-point DFT over k2 -> natural chunks b
        br, bi = _fft_static(jr, ji, sign)
        for b_ in range(B):
            ore_ref[0, :, b_ * A:(b_ + 1) * A] = br[b_] * inv_n
            oim_ref[0, :, b_ * A:(b_ + 1) * A] = bi[b_] * inv_n
    else:
        # stage 1: 16-point DFT over the natural chunk index b
        xr = [xre_ref[0, :, b_ * A:(b_ + 1) * A] for b_ in range(B)]
        xi = [xim_ref[0, :, b_ * A:(b_ + 1) * A] for b_ in range(B)]
        gr, gi = _fft_static(xr, xi, sign)
        # per k2: twiddle + 128-point DFT over lanes (matmul from right)
        for k2 in range(B):
            twr = TWre[k2][None, :]
            twi = TWim[k2][None, :]
            hrk = gr[k2] * twr - gi[k2] * twi
            hik = gr[k2] * twi + gi[k2] * twr
            shr = _bsplit(hrk) if fast else None
            shi = _bsplit(hik) if fast else None
            orr = (_mxu_dot(hrk, FAre, fast, sa=shr, sb=sFre)
                   - _mxu_dot(hik, FAim, fast, sa=shi, sb=sFim))
            oii = (_mxu_dot(hik, FAre, fast, sa=shi, sb=sFre)
                   + _mxu_dot(hrk, FAim, fast, sa=shr, sb=sFim))
            ore_ref[0, :, k2 * A:(k2 + 1) * A] = orr
            oim_ref[0, :, k2 * A:(k2 + 1) * A] = oii


def _rowifft_scaled_kernel(FAre_ref, FAim_ref, TWre_ref, TWim_ref, sc_ref,
                           xre_ref, xim_ref, ore_ref, oim_ref, *, A, B,
                           fast):
    """Inverse row DFT with an elementwise pre-multiplier fused in: the
    caller's ``scale * x`` product never materializes in HBM (the usual
    use is GRF synthesis, ``covsqrt * eta`` feeding ifft2pp)."""
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None
    inv_n = 1.0 / (A * B)
    jr = []
    ji = []
    for k2 in range(B):
        sc = sc_ref[:, k2 * A:(k2 + 1) * A]
        xr = xre_ref[0, :, k2 * A:(k2 + 1) * A] * sc
        xi = xim_ref[0, :, k2 * A:(k2 + 1) * A] * sc
        sxr = _bsplit(xr) if fast else None
        sxi = _bsplit(xi) if fast else None
        ir = (_mxu_dot(xr, FAre, fast, sa=sxr, sb=sFre)
              - _mxu_dot(xi, FAim, fast, sa=sxi, sb=sFim))
        ii = (_mxu_dot(xi, FAre, fast, sa=sxi, sb=sFre)
              + _mxu_dot(xr, FAim, fast, sa=sxr, sb=sFim))
        twr = TWre[k2][None, :]
        twi = TWim[k2][None, :]
        jr.append(ir * twr - ii * twi)
        ji.append(ir * twi + ii * twr)
    br, bi = _fft_static(jr, ji, 1.0)
    for b_ in range(B):
        ore_ref[0, :, b_ * A:(b_ + 1) * A] = br[b_] * inv_n
        oim_ref[0, :, b_ * A:(b_ + 1) * A] = bi[b_] * inv_n


def _rowifft_noise_kernel(FAre_ref, FAim_ref, TWre_ref, TWim_ref, sc_ref,
                          seed_ref, ore_ref, oim_ref, *, A, B, rtile, fast):
    """Inverse row DFT of scale * (white noise): the standard-normal
    Fourier plane is generated *inside* the kernel with the on-chip PRNG
    (24-bit uniform -> erf_inv), so the noise never exists in HBM and
    its VPU cost overlaps the MXU DFT work. Stream = (seed, batch index,
    row-tile index) — reproducible and distinct per block."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    cell = i * pl.num_programs(1) + j
    n = A * B

    def normals(stream):
        # one generator draw per seeding: on this stack a second
        # prng_random_bits after the same seed returns corrupted data,
        # so each (cell, re/im) stream gets its own seed. 23-bit
        # uniforms, NOT 24: with 24 bits the extreme t = 1 - 2^-24
        # rounds to exactly 1.0 in fp32 and erf_inv(1.0) = inf
        # (~2^-24 of all draws); 1 - 2^-23 is representable.
        pltpu.prng_seed(seed_ref[0], 2 * cell + stream)
        bits = pltpu.prng_random_bits((rtile, n))
        ib = jnp.bitwise_and(pltpu.bitcast(bits, jnp.int32), (1 << 23) - 1)
        u = (ib.astype(jnp.float32) + 0.5) * (1.0 / (1 << 23))
        return jnp.sqrt(2.0) * jax.lax.erf_inv(2.0 * u - 1.0)

    sc = sc_ref[:]
    xre = normals(0) * sc
    xim = normals(1) * sc
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None
    inv_n = 1.0 / n
    jr = []
    ji = []
    for k2 in range(B):
        xr = xre[:, k2 * A:(k2 + 1) * A]
        xi = xim[:, k2 * A:(k2 + 1) * A]
        sxr = _bsplit(xr) if fast else None
        sxi = _bsplit(xi) if fast else None
        ir = (_mxu_dot(xr, FAre, fast, sa=sxr, sb=sFre)
              - _mxu_dot(xi, FAim, fast, sa=sxi, sb=sFim))
        ii = (_mxu_dot(xi, FAre, fast, sa=sxi, sb=sFre)
              + _mxu_dot(xr, FAim, fast, sa=sxr, sb=sFim))
        twr = TWre[k2][None, :]
        twi = TWim[k2][None, :]
        jr.append((ir * twr - ii * twi) * inv_n)
        ji.append((ir * twi + ii * twr) * inv_n)
    br, bi = _fft_static(jr, ji, 1.0)
    for b_ in range(B):
        ore_ref[0, :, b_ * A:(b_ + 1) * A] = br[b_]
        oim_ref[0, :, b_ * A:(b_ + 1) * A] = bi[b_]


@functools.partial(jax.jit,
                   static_argnames=("batch", "ctile", "rtile", "interpret"))
def ifft2pp_noise(scale, seed, batch: int, ctile: int = 128,
                  rtile: int = 64, interpret: bool = False):
    """GRF synthesis with the white noise generated on-chip: returns the
    two real maps (batch, n, n) x 2 of ``ifft2pp(scale * eta)`` where
    eta re/im are standard normals drawn inside the first kernel pass
    (never materialized in HBM). ``scale``: (n, n) fp32 doubly-permuted
    covsqrt grid; ``seed``: int32 scalar (stream = seed x block).
    On CPU/interpret the on-chip PRNG is unavailable; falls back to
    jax.random + :func:`ifft2pp_scaled` (different stream, same law)."""
    yre, yim = rowifft_noise_y(scale, seed, batch, rtile=rtile,
                               interpret=interpret)
    return colifft(yre, yim, ctile=ctile, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("batch", "ctile", "rtile", "interpret"))
def ifft2pp_noise_y(scale, seed, batch: int, ctile: int = 128,
                    rtile: int = 64, interpret: bool = False):
    """Like :func:`ifft2pp_noise` but ALSO returns the pre-column
    synthesis intermediate Y' = rowifft(scale * eta): since
    colfft(colifft(Y')) = Y' exactly, an analysis stage (e.g.
    :func:`rowqc_pp`) can consume Y' directly — the maps still
    materialize (one colifft) but the analysis column pass and the map
    re-read are skipped. Returns (m1, m2, yre, yim)."""
    yre, yim = rowifft_noise_y(scale, seed, batch, rtile=rtile,
                               interpret=interpret)
    m1, m2 = colifft(yre, yim, ctile=ctile, interpret=interpret)
    return m1, m2, yre, yim


@functools.partial(jax.jit,
                   static_argnames=("batch", "rtile", "interpret"))
def rowifft_noise_y(scale, seed, batch: int, rtile: int = 64,
                    interpret: bool = False):
    """Pre-column synthesis intermediate Y' = rowifft(scale * eta) with
    the white noise drawn on-chip (the shared producer behind
    :func:`ifft2pp_noise`/:func:`ifft2pp_noise_y`); pipelines that only
    need spectra feed Y' straight into :func:`rowqc_pp`/:func:`rows_pp`
    and skip the column transforms entirely. On CPU/interpret the
    on-chip PRNG is unavailable; falls back to jax.random +
    :func:`rowifft_scaled_y` (different stream, same law)."""
    n = scale.shape[-1]
    if interpret:
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32))
        kr, ki = jax.random.split(key)
        er = jax.random.normal(kr, (batch, n, n), jnp.float32)
        ei = jax.random.normal(ki, (batch, n, n), jnp.float32)
        return _row_call(er, ei, True, rtile, True,
                         scale=scale.astype(jnp.float32))
    A, B, FBre, FBim, FAre, FAim, TWre, TWim = _plan(n, True)
    assert n % rtile == 0, f"rtile {rtile} must divide n {n}"
    nt = n // rtile

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    dblk = pl.BlockSpec((1, rtile, n), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rowifft_noise_kernel, A=A, B=B, rtile=rtile,
                          fast=_FAST),
        grid=(batch, nt),
        in_specs=[const_spec((A, A)), const_spec((A, A)),
                  const_spec((B, A)), const_spec((B, A)),
                  pl.BlockSpec((rtile, n), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[dblk, dblk],
        out_shape=[jax.ShapeDtypeStruct((batch, n, n), jnp.float32)] * 2,
    )(jnp.asarray(FAre), jnp.asarray(FAim), jnp.asarray(TWre),
      jnp.asarray(TWim), scale.astype(jnp.float32),
      jnp.asarray(seed, jnp.int32).reshape(1))


def _noise_planes_kernel(sc_ref, seed_ref, ore_ref, oim_ref, *, rtile, n):
    """scale * (white complex noise) with the noise generated on-chip —
    the spectral-domain producer for pipelines that consume Fourier
    planes directly (no DFT in this kernel). Same PRNG discipline as
    :func:`_rowifft_noise_kernel` (23-bit uniforms -> erf_inv, one
    generator draw per seeding)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    cell = i * pl.num_programs(1) + j

    def normals(stream):
        # Mosaic (libtpu >= 2026-08) rejects 3-word seeds ("Setting seed
        # with more than 2 values is not supported"), so fold the block
        # stream id into the second word with an odd-multiplier mix
        # (bijective mod 2^32: distinct cells stay distinct streams).
        mixed = jax.lax.bitwise_xor(
            seed_ref[1],
            (2 * cell + stream) * jnp.int32(-1640531527))  # 0x9E3779B9
        pltpu.prng_seed(seed_ref[0], mixed)
        bits = pltpu.prng_random_bits((rtile, n))
        ib = jnp.bitwise_and(pltpu.bitcast(bits, jnp.int32), (1 << 23) - 1)
        u = (ib.astype(jnp.float32) + 0.5) * (1.0 / (1 << 23))
        return jnp.sqrt(2.0) * jax.lax.erf_inv(2.0 * u - 1.0)

    sc = sc_ref[:]
    ore_ref[0] = normals(0) * sc
    oim_ref[0] = normals(1) * sc


@functools.partial(jax.jit,
                   static_argnames=("batch", "rtile", "interpret"))
def noise_planes(scale, seed, batch: int, rtile: int = 64,
                 interpret: bool = False):
    """(batch, n, n) x 2 fp32 planes of ``scale * eta`` with eta
    standard complex white noise drawn by the on-chip PRNG (stream =
    seed x block; reproducible, never in HBM unscaled). ``scale`` in
    whatever static layout the consumer uses (typically doubly-permuted
    covsqrt). On CPU/interpret falls back to jax.random (different
    stream, same law).

    ``seed``: a scalar int32 stream id, OR a (2,) int32 word pair
    (e.g. the raw words of a jax PRNG key) — the two-word form seeds
    the on-chip generator with the FULL 64 bits, so long Monte-Carlo
    campaigns don't birthday-collide in a 31-bit space."""
    n = scale.shape[-1]
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    if seed_arr.shape != (1,) and seed_arr.shape != (2,):
        raise ValueError(f"seed must be a scalar or (2,) words; got "
                         f"shape {seed_arr.shape}")
    if seed_arr.shape == (1,):
        seed_arr = jnp.concatenate([seed_arr,
                                    jnp.zeros((1,), jnp.int32)])
    if interpret:
        key = jax.random.fold_in(jax.random.PRNGKey(seed_arr[0]),
                                 seed_arr[1].astype(jnp.uint32))
        kr, ki = jax.random.split(key)
        er = jax.random.normal(kr, (batch, n, n), jnp.float32)
        ei = jax.random.normal(ki, (batch, n, n), jnp.float32)
        return er * scale[None], ei * scale[None]
    assert n % rtile == 0, f"rtile {rtile} must divide n {n}"
    nt = n // rtile
    dblk = pl.BlockSpec((1, rtile, n), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_noise_planes_kernel, rtile=rtile, n=n),
        grid=(batch, nt),
        in_specs=[pl.BlockSpec((rtile, n), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[dblk, dblk],
        out_shape=[jax.ShapeDtypeStruct((batch, n, n), jnp.float32)] * 2,
    )(scale.astype(jnp.float32), seed_arr)


def _row_call(xre, xim, inverse, rtile, interpret, scale=None):
    b, nrows, n = xre.shape
    A, B, FBre, FBim, FAre, FAim, TWre, TWim = _plan(n, inverse)
    # stage-2 contracts from the right: need FA with [a, k1] layout = FA^T;
    # FA is symmetric (omega^(a k1)) so FA itself works.
    nt = nrows // rtile
    assert nt * rtile == nrows, (nrows, rtile)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    in_specs = [const_spec((A, A)), const_spec((A, A)),
                const_spec((B, A)), const_spec((B, A))]
    args = [jnp.asarray(FAre), jnp.asarray(FAim), jnp.asarray(TWre),
            jnp.asarray(TWim)]
    if scale is None:
        kernel = functools.partial(_rowfft_kernel, A=A, B=B,
                                   inverse=inverse,
                                   fast=_FAST and not interpret)
        grid = (b, nt)
        dblk = pl.BlockSpec((1, rtile, n), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    else:
        assert inverse and scale.shape == (nrows, n)
        kernel = functools.partial(_rowifft_scaled_kernel, A=A, B=B,
                                   fast=_FAST and not interpret)
        # batch innermost so the scale block stays resident in VMEM
        # across the whole batch sweep of each row tile
        grid = (nt, b)
        dblk = pl.BlockSpec((1, rtile, n), lambda j, i: (i, j, 0),
                            memory_space=pltpu.VMEM)
        in_specs.append(pl.BlockSpec((rtile, n), lambda j, i: (j, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scale)
    in_specs += [dblk, dblk]
    args += [xre, xim]

    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=in_specs,
        out_specs=[dblk, dblk],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(xre.shape, jnp.float32),
                   jax.ShapeDtypeStruct(xre.shape, jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * nrows * n * (128 + B) * 8,
            bytes_accessed=4 * 4 * b * nrows * n, transcendentals=0),
    )(*args)


@functools.partial(jax.jit, static_argnames=("rtile", "interpret"))
def rowfft(xre, xim, rtile: int = 128, interpret: bool = False):
    """DFT along axis -1 (lanes); output columns in ``row_perm`` order."""
    return _row_call(xre, xim, False, rtile, interpret)


@functools.partial(jax.jit, static_argnames=("rtile", "interpret"))
def rowifft(xre, xim, rtile: int = 128, interpret: bool = False):
    """Inverse DFT along axis -1 accepting ``row_perm``-ordered columns,
    natural-order output (includes 1/N)."""
    return _row_call(xre, xim, True, rtile, interpret)


def full_perm(n: int):
    """(perm, inv) for the doubly-permuted fft2 layout (rows and columns
    both in row_perm order)."""
    return row_perm(n)


# ---------------------------------------------------------------------------
# Fourier-plane mirror Zm(k) = Z(-k) in the doubly-permuted layout.
#
# In row_perm order p = 128*b + a holds k = B*a + b (a in [0,128), b in
# [0,B)), so the mirror k -> (n-k) % n acts on (a, b) as a' = 127-a,
# b' = B-b whenever b != 0. That is *static block structure*: every
# 8-row block maps to one reversed 8-row block and every 128-lane chunk
# to one reversed chunk — expressible as Pallas BlockSpec index maps
# plus an in-register double reversal, i.e. a straight block-copy kernel
# with zero gather cost. Only the b == 0 strips (permuted rows/cols
# 0..127, where the mirror wraps a' = (128-a) % 128) fall outside the
# block structure; they are patched afterwards with cheap strip-sized
# XLA takes (1/B of the full-gather volume). Replaces two full-size
# jnp.take gathers per array (~2 extra HBM round trips each).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _mirror_tables(n):
    perm, inv = row_perm(n)
    mrow = inv[(n - perm) % n].astype(np.int32)   # p -> p' with k' = -k
    J = np.ascontiguousarray(np.eye(128, dtype=np.float32)[::-1])
    return mrow, J


def _rev_block(z, jm, ncc, fast):
    """In-register mirror of an (nb, 8, ncc*128) block: sublane reversal
    of 8 via three swap levels (lax.rev is not lowered on TPU Pallas),
    then per-128-chunk lane reversal as an exact _perm_dot against the
    anti-identity ``jm``, with the chunk order itself reversed in the
    output concat (chunk b -> chunk (B-b) % B; chunk 0 is garbage here,
    patched by the wrapper strips). THE one mirror convention — shared
    by every mirror/power kernel."""
    z = jnp.concatenate([z[:, 4:, :], z[:, :4, :]], axis=1)
    z = jnp.concatenate([z[:, 2:4, :], z[:, 0:2, :],
                         z[:, 6:8, :], z[:, 4:6, :]], axis=1)
    z = jnp.concatenate([z[:, 1:2, :], z[:, 0:1, :],
                         z[:, 3:4, :], z[:, 2:3, :],
                         z[:, 5:6, :], z[:, 4:5, :],
                         z[:, 7:8, :], z[:, 6:7, :]], axis=1)
    nb = z.shape[0]
    chunks = []
    for q in range(ncc):
        c = (ncc - q) % ncc
        piece = z[:, :, 128 * c:128 * (c + 1)].reshape(nb * 8, 128)
        piece = _perm_dot(piece, jm, fast)
        chunks.append(piece.reshape(nb, 8, 128))
    return jnp.concatenate(chunks, axis=-1)


def _mirror_kernel(jm_ref, ar_ref, ai_ref, or_ref, oi_ref, *, ncc, fast):
    or_ref[:] = _rev_block(ar_ref[:], jm_ref[:], ncc, fast)
    oi_ref[:] = _rev_block(ai_ref[:], jm_ref[:], ncc, fast)


def half_rows(n: int):
    """Static tables for the Hermitian half plane in row_perm order.

    The rows with natural ky in [0, n/2) are exactly those with
    a = p mod 128 < 64 (ky = B*a + b), i.e. the lower 64-row half of
    every 128-row b-group — contiguous sub-blocks, no gathers. Returns
    ``p_of_h`` (compact index h -> permuted row p, h in [0, n//2)) and
    ``p_nyq`` (the ky = n/2 row, p = 64)."""
    ncc = n // 128
    h = np.arange((n // 2))
    p_of_h = (128 * (h // 64) + h % 64).astype(np.int32)
    return p_of_h, 64


def _qc_half_kernel(jm_ref, ar_ref, ai_ref, dr_ref, di_ref,
                    oq_ref, oc_ref, *, ncc, fast):
    mr = _rev_block(ar_ref[:], jm_ref[:], ncc, fast)
    mi = _rev_block(ai_ref[:], jm_ref[:], ncc, fast)
    dr = dr_ref[:]
    di = di_ref[:]
    oq_ref[:] = 0.5 * (dr * dr + di * di + mr * mr + mi * mi)
    oc_ref[:] = dr * mr - di * mi


def _s_half_kernel(jm_ref, ar_ref, ai_ref, dr_ref, di_ref, os_ref, *, ncc, fast):
    os_ref[:] = (dr_ref[:] * _rev_block(ai_ref[:], jm_ref[:], ncc, fast)
                 + di_ref[:] * _rev_block(ar_ref[:], jm_ref[:], ncc,
                                          fast))


@functools.partial(jax.jit, static_argnames=("bb", "interpret"))
def s_pp_half(zr, zi, bb: int = 8, interpret: bool = False):
    """Half-plane cross field s = Im(Z(k) Z(-k)) = zr*zmi + zi*zmr.

    For a packed pair Z = fft2(x + i y), the binned cross spectrum of
    the real maps is ``bin(Re(x_hat conj(y_hat))) = bin(s)/2``; s is
    mirror-even pointwise, so full-plane bins follow from
    ``2*bin(half) - bin(ky=0 row) + bin(ky=n/2 row)`` exactly as in
    :func:`qc_pp_half`. Same one-pass block structure and strip
    patches. Returns (batch, n//2, n)."""
    bsz, n, _ = zr.shape
    ncc = n // 128
    nh = n // 2
    while bsz % bb:
        bb //= 2

    def dst(gb, g):
        return (gb, g, 0)

    def src_mirror(gb, g):
        return (gb, 16 * ((ncc - g // 8) % ncc) + 15 - (g % 8), 0)

    def src_pass(gb, g):
        return (gb, 16 * (g // 8) + g % 8, 0)

    fblk = lambda idx: pl.BlockSpec((bb, 8, n), idx,
                                    memory_space=pltpu.VMEM)
    mrow_np, J = _mirror_tables(n)
    s = pl.pallas_call(
        functools.partial(_s_half_kernel, ncc=ncc,
                          fast=_FAST and not interpret),
        grid=(bsz // bb, nh // 8),
        in_specs=[pl.BlockSpec((128, 128), lambda gb, g: (0, 0),
                               memory_space=pltpu.VMEM),
                  fblk(src_mirror), fblk(src_mirror),
                  fblk(src_pass), fblk(src_pass)],
        out_specs=fblk(dst),
        out_shape=jax.ShapeDtypeStruct((bsz, nh, n), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(J), zr, zi, zr, zi)

    mrow = jnp.asarray(mrow_np)
    p_of_h, _ = half_rows(n)
    rsrc = jnp.asarray(((128 - np.arange(64)) % 128).astype(np.int32))
    csrc = jnp.asarray(mrow_np[p_of_h[64:]])
    mtop = mrow[:128]

    def zm_rows(z):
        return jnp.take(jnp.take(z[:, :128, :], rsrc, axis=1), mrow, axis=2)

    def zm_cols(z):
        return jnp.take(jnp.take(z[:, :, :128], mtop, axis=2), csrc, axis=1)

    def z_strip(z):
        t = z[:, :, :128].reshape(bsz, ncc, 128, 128)[:, :, :64]
        return t.reshape(bsz, nh, 128)[:, 64:]

    s = jax.lax.dynamic_update_slice(
        s, zr[:, :64, :] * zm_rows(zi) + zi[:, :64, :] * zm_rows(zr),
        (0, 0, 0))
    s = jax.lax.dynamic_update_slice(
        s, z_strip(zr) * zm_cols(zi) + z_strip(zi) * zm_cols(zr),
        (0, 64, 0))
    return s


@functools.partial(jax.jit, static_argnames=("bb", "interpret"))
def qc_pp_half(zr, zi, bb: int = 8, interpret: bool = False):
    """Half-plane mirror-even power fields for Hermitian-pair analysis.

    Returns ``(qs, c)``, each (batch, n//2, n) fp32 over the compact
    half plane (rows ``half_rows(n)[0]``):

        qs = (|Z(k)|^2 + |Z(-k)|^2) / 2      c = Re(Z(k) Z(-k))

    Both are mirror-even pointwise, so full-plane binned sums follow
    from ``2 * bin(half) - bin(row ky=0) + bin(row ky=n/2)``, after
    which ``bin|F1|^2 = (bq + bc)/2`` etc. as in ``bin_pair_power``.
    One kernel pass: each input array is read exactly once (mirror
    blocks via the static maps of :func:`mirror_pp`), only the two
    half-size power fields are written. The b == 0 strips are patched
    with slice-based recomputation."""
    bsz, n, _ = zr.shape
    ncc = n // 128
    nh = n // 2
    while bsz % bb:
        bb //= 2

    def dst(gb, g):
        return (gb, g, 0)

    def src_mirror(gb, g):
        return (gb, 16 * ((ncc - g // 8) % ncc) + 15 - (g % 8), 0)

    def src_pass(gb, g):
        return (gb, 16 * (g // 8) + g % 8, 0)

    fblk = lambda idx: pl.BlockSpec((bb, 8, n), idx,
                                    memory_space=pltpu.VMEM)
    mrow_np, J = _mirror_tables(n)
    qs, c = pl.pallas_call(
        functools.partial(_qc_half_kernel, ncc=ncc,
                          fast=_FAST and not interpret),
        grid=(bsz // bb, nh // 8),
        in_specs=[pl.BlockSpec((128, 128), lambda gb, g: (0, 0),
                               memory_space=pltpu.VMEM),
                  fblk(src_mirror), fblk(src_mirror),
                  fblk(src_pass), fblk(src_pass)],
        out_specs=[fblk(dst)] * 2,
        out_shape=[jax.ShapeDtypeStruct((bsz, nh, n), jnp.float32)] * 2,
        interpret=interpret,
    )(jnp.asarray(J), zr, zi, zr, zi)

    # strip recomputation where the kernel's mirror blocks wrap (b == 0)
    mrow = jnp.asarray(mrow_np)
    p_of_h, _ = half_rows(n)
    rsrc = jnp.asarray(((128 - np.arange(64)) % 128).astype(np.int32))
    csrc = jnp.asarray(mrow_np[p_of_h[64:]])
    mtop = mrow[:128]

    def zm_rows(z):
        return jnp.take(jnp.take(z[:, :128, :], rsrc, axis=1), mrow, axis=2)

    def zm_cols(z):
        return jnp.take(jnp.take(z[:, :, :128], mtop, axis=2), csrc, axis=1)

    zr_r, zi_r = zr[:, :64, :], zi[:, :64, :]
    mr_r, mi_r = zm_rows(zr), zm_rows(zi)
    qs = jax.lax.dynamic_update_slice(
        qs, 0.5 * (zr_r ** 2 + zi_r ** 2 + mr_r ** 2 + mi_r ** 2),
        (0, 0, 0))
    c = jax.lax.dynamic_update_slice(
        c, zr_r * mr_r - zi_r * mi_r, (0, 0, 0))
    # cols strip: compact rows h >= 64, cols [0, 128): slice cols first
    # so only the thin strip is read
    def z_strip(z):
        s = z[:, :, :128].reshape(bsz, ncc, 128, 128)[:, :, :64]
        return s.reshape(bsz, nh, 128)[:, 64:]

    zr_cd, zi_cd = z_strip(zr), z_strip(zi)
    mr_c, mi_c = zm_cols(zr), zm_cols(zi)
    qs = jax.lax.dynamic_update_slice(
        qs, 0.5 * (zr_cd ** 2 + zi_cd ** 2 + mr_c ** 2 + mi_c ** 2),
        (0, 64, 0))
    c = jax.lax.dynamic_update_slice(
        c, zr_cd * mr_c - zi_cd * mi_c, (0, 64, 0))
    return qs, c


@functools.partial(jax.jit, static_argnames=("bb", "interpret"))
def mirror_pp(zr, zi, bb: int = 8, interpret: bool = False):
    """(Zm_re, Zm_im) with Zm(k) = Z(-k), both in fft2pp's doubly-permuted
    layout. ``zr, zi``: (batch, n, n) fp32. Pallas block-copy over
    full-width row blocks (8 KB DMA runs) for the clean (B-1)/B of the
    plane + cheap slice-based strip patches for the b == 0 rows/cols
    (whose mirrors land back inside the same 128-row/col strips)."""
    bsz, n, _ = zr.shape
    ncc = n // 128
    nrb = n // 8
    while bsz % bb:
        bb //= 2

    def dst(gb, i):
        return (gb, i, 0)

    def src(gb, i):
        b, s = i // 16, i % 16
        return (gb, 16 * ((ncc - b) % ncc) + 15 - s, 0)

    blk = lambda idx: pl.BlockSpec((bb, 8, n), idx,
                                   memory_space=pltpu.VMEM)
    mrow_np, J = _mirror_tables(n)
    omr, omi = pl.pallas_call(
        functools.partial(_mirror_kernel, ncc=ncc,
                          fast=_FAST and not interpret),
        grid=(bsz // bb, nrb),
        in_specs=[pl.BlockSpec((128, 128), lambda gb, i: (0, 0),
                               memory_space=pltpu.VMEM), blk(src), blk(src)],
        out_specs=[blk(dst), blk(dst)],
        out_shape=[jax.ShapeDtypeStruct((bsz, n, n), jnp.float32)] * 2,
        interpret=interpret,
    )(jnp.asarray(J), zr, zi)

    # strip patches: permuted rows/cols 0..127 are the b == 0 frequencies
    # (k multiple of B). Their mirrors satisfy mrow[p] < 128 for p < 128,
    # so the sources are contiguous 128-row/col slices — no full gathers.
    mrow = jnp.asarray(mrow_np)
    mtop, mrest = mrow[:128], mrow[128:]
    for zsrc, out in ((zr, 0), (zi, 1)):
        rows = jnp.take(jnp.take(zsrc[:, :128, :], mtop, axis=1),
                        mrow, axis=2)
        cols = jnp.take(jnp.take(zsrc[:, :, :128], mtop, axis=2),
                        mrest, axis=1)
        o = (omr, omi)[out]
        o = jax.lax.dynamic_update_slice(o, rows, (0, 0, 0))
        o = jax.lax.dynamic_update_slice(o, cols, (0, 128, 0))
        if out == 0:
            omr = o
        else:
            omi = o
    return omr, omi


def fft2pp(zre, zim, ctile: int = 128, rtile: int = 64,
           interpret: bool = False):
    """Full 2D FFT entirely on the Pallas kernels: rows AND columns left
    in ``row_perm`` order (absorb with static tables or take twice)."""
    yre, yim = colfft(zre, zim, ctile=ctile, interpret=interpret)
    return rowfft(yre, yim, rtile=rtile, interpret=interpret)


def ifft2pp(kre, kim, ctile: int = 128, rtile: int = 64,
            interpret: bool = False):
    """Inverse of :func:`fft2pp`: doubly-permuted input, natural output."""
    yre, yim = rowifft(kre, kim, rtile=rtile, interpret=interpret)
    return colifft(yre, yim, ctile=ctile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("ctile", "rtile", "interpret"))
def ifft2pp_scaled(kre, kim, scale, ctile: int = 128, rtile: int = 64,
                   interpret: bool = False):
    """``ifft2pp(scale * kre, scale * kim)`` with the elementwise product
    fused into the first (row) kernel pass — the scaled Fourier plane
    never round-trips HBM. ``scale``: (n, n) fp32 in the doubly-permuted
    layout (e.g. a ``covsqrt`` grid for GRF synthesis)."""
    yre, yim = _row_call(kre, kim, True, rtile, interpret,
                         scale=scale.astype(jnp.float32))
    return colifft(yre, yim, ctile=ctile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("rtile", "interpret"))
def rowifft_scaled_y(kre, kim, scale, rtile: int = 64,
                     interpret: bool = False):
    """Just the pre-column synthesis intermediate Y' of
    :func:`ifft2pp_scaled` (for pipelines that consume Y' directly via
    :func:`rowqc_pp` / :func:`rows_pp` and never need the maps)."""
    return _row_call(kre, kim, True, rtile, interpret,
                     scale=scale.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pfft2(z, interpret: bool = False):
    """Natural-order full-Pallas 2D FFT of a complex (or real) array —
    drop-in for ``jnp.fft.fft2`` on 128*B-sized grids (one static
    reordering gather at the end; pipelines should prefer
    :func:`fft2pp` + permuted static tables)."""
    zre = jnp.real(z).astype(jnp.float32)
    zim = (jnp.imag(z).astype(jnp.float32) if jnp.iscomplexobj(z)
           else jnp.zeros_like(zre))
    squeeze = zre.ndim == 2
    if squeeze:
        zre, zim = zre[None], zim[None]
    Yr, Yi = fft2pp(zre, zim, interpret=interpret)
    # each axis un-permutes with ITS OWN length's permutation
    _, inv_y = row_perm(zre.shape[-2])
    _, inv_x = row_perm(zre.shape[-1])
    Yr = jnp.take(jnp.take(Yr, jnp.asarray(inv_y), axis=-2),
                  jnp.asarray(inv_x), axis=-1)
    Yi = jnp.take(jnp.take(Yi, jnp.asarray(inv_y), axis=-2),
                  jnp.asarray(inv_x), axis=-1)
    out = Yr + 1j * Yi
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def pifft2(k, interpret: bool = False):
    """Natural-order inverse of :func:`pfft2`."""
    kre = jnp.real(k).astype(jnp.float32)
    kim = jnp.imag(k).astype(jnp.float32)
    squeeze = kre.ndim == 2
    if squeeze:
        kre, kim = kre[None], kim[None]
    perm_y, _ = row_perm(kre.shape[-2])
    perm_x, _ = row_perm(kre.shape[-1])
    kre = jnp.take(jnp.take(kre, jnp.asarray(perm_y), axis=-2),
                   jnp.asarray(perm_x), axis=-1)
    kim = jnp.take(jnp.take(kim, jnp.asarray(perm_y), axis=-2),
                   jnp.asarray(perm_x), axis=-1)
    Zr, Zi = ifft2pp(kre, kim, interpret=interpret)
    out = Zr + 1j * Zi
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Fused row-DFT + half-plane power: the full Fourier plane never reaches
# HBM. Each program computes the lane DFT of one 64-row half-plane tile
# AND of its row-mirror tile (rows 127-a of block (B-j)%B), forms the
# mirror in registers (row reversal + per-chunk lane reversal via the
# exact 2-pass J matmul), and writes only the two half-size mirror-even
# power fields qs, c. Saves writing + re-reading the (Zr, Zi) planes
# (~100 MB per 2048^2 pair) at the cost of computing each row DFT twice
# for the mirror halves (MXU time, which is not the bottleneck).
# The b == 0 wrap strips are patched from two cheap partial DFTs:
# rows [0, 128) (rowfft of a 128-row slice of Y) and lane chunk 0
# (a k2 = 0-only row kernel).
# ---------------------------------------------------------------------------

def _dft_rows_fwd(xre, xim, FAre, FAim, TWre, TWim, sFre, sFim,
                  *, A, B, fast):
    """Forward lane DFT of one row block, kept as per-k2 register
    chunks (shared body of the fused row kernels)."""
    xr = [xre[:, b_ * A:(b_ + 1) * A] for b_ in range(B)]
    xi = [xim[:, b_ * A:(b_ + 1) * A] for b_ in range(B)]
    gr, gi = _fft_static(xr, xi, -1.0)
    outr = []
    outi = []
    for k2 in range(B):
        twr = TWre[k2][None, :]
        twi = TWim[k2][None, :]
        hrk = gr[k2] * twr - gi[k2] * twi
        hik = gr[k2] * twi + gi[k2] * twr
        shr = _bsplit(hrk) if fast else None
        shi = _bsplit(hik) if fast else None
        outr.append(_mxu_dot(hrk, FAre, fast, sa=shr, sb=sFre)
                    - _mxu_dot(hik, FAim, fast, sa=shi, sb=sFim))
        outi.append(_mxu_dot(hik, FAre, fast, sa=shi, sb=sFre)
                    + _mxu_dot(hrk, FAim, fast, sa=shr, sb=sFim))
    return outr, outi


def _rev_rows(z, nrow):
    """Reverse axis 0 of a (nrow, A) block with static concats (lax.rev
    is not lowered on TPU Pallas); nrow a power of 2."""
    s = nrow // 2
    while s >= 1:
        pieces = []
        for i in range(0, nrow, 2 * s):
            pieces.append(z[i + s:i + 2 * s])
            pieces.append(z[i:i + s])
        z = jnp.concatenate(pieces, axis=0)
        s //= 2
    return z


def _row_qc_kernel(FAre_ref, FAim_ref, TWre_ref, TWim_ref, jm_ref,
                   ar_ref, ai_ref, br_ref, bi_ref, qs_ref, c_ref,
                   *, A, B, fast):
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None

    def dft_rows(xre, xim):
        return _dft_rows_fwd(xre, xim, FAre, FAim, TWre, TWim, sFre,
                             sFim, A=A, B=B, fast=fast)

    za_r, za_i = dft_rows(ar_ref[0], ai_ref[0])
    zb_r, zb_i = dft_rows(br_ref[0], bi_ref[0])
    jm = jm_ref[:]
    for c_ix in range(B):
        src = (B - c_ix) % B
        mr = _perm_dot(_rev_rows(zb_r[src], 64), jm, fast)
        mi = _perm_dot(_rev_rows(zb_i[src], 64), jm, fast)
        zr = za_r[c_ix]
        zi = za_i[c_ix]
        qs_ref[0, :, c_ix * A:(c_ix + 1) * A] = \
            0.5 * (zr * zr + zi * zi + mr * mr + mi * mi)
        c_ref[0, :, c_ix * A:(c_ix + 1) * A] = zr * mr - zi * mi


def _rowfft_blk0_kernel(FAre_ref, FAim_ref, xre_ref, xim_ref,
                        ore_ref, oim_ref, *, A, B, fast):
    """k2 = 0 lane chunk only of the forward row DFT (the TW factor for
    k2 = 0 is 1): stage-1 adds + ONE 128-DFT matmul."""
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None
    xr = [xre_ref[0, :, b_ * A:(b_ + 1) * A] for b_ in range(B)]
    xi = [xim_ref[0, :, b_ * A:(b_ + 1) * A] for b_ in range(B)]
    # only g[0] = sum_b x_b is needed for k2 = 0
    g0r = xr[0]
    g0i = xi[0]
    for b_ in range(1, B):
        g0r = g0r + xr[b_]
        g0i = g0i + xi[b_]
    s0r = _bsplit(g0r) if fast else None
    s0i = _bsplit(g0i) if fast else None
    ore_ref[0] = (_mxu_dot(g0r, FAre, fast, sa=s0r, sb=sFre)
                  - _mxu_dot(g0i, FAim, fast, sa=s0i, sb=sFim))
    oim_ref[0] = (_mxu_dot(g0i, FAre, fast, sa=s0i, sb=sFre)
                  + _mxu_dot(g0r, FAim, fast, sa=s0r, sb=sFim))


@functools.partial(jax.jit, static_argnames=("interpret",))
def rowfft_blk0(yre, yim, interpret: bool = False):
    """Lane chunk 0 (permuted cols p in [0, 128)) of the forward row
    DFT of all rows: (b, n, 128) re/im."""
    b, nrows, n = yre.shape
    A, B, _, _, FAre, FAim, TWre, TWim = _plan(n, False)
    rtile = 64

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_rowfft_blk0_kernel, A=A, B=B,
                          fast=_FAST and not interpret),
        grid=(b, nrows // rtile),
        in_specs=[const_spec((A, A)), const_spec((A, A)),
                  pl.BlockSpec((1, rtile, n), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, rtile, n), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, rtile, A), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, nrows, A), jnp.float32)] * 2,
        interpret=interpret,
    )(jnp.asarray(FAre), jnp.asarray(FAim), yre, yim)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fft2pp_qc(m1, m2, interpret: bool = False):
    """Half-plane mirror-even power fields of fft2(m1 + i m2) WITHOUT
    materializing the Fourier plane: colfft -> fused row-DFT + qc
    kernel (+ cheap partial-DFT strip patches). Drop-in for
    ``qc_pp_half(*fft2pp(m1, m2))``; also returns the Z rows [0, 128)
    (both planes) for boundary-row (ky = 0 / n/2) bins."""
    yr, yi = colfft(m1, m2, interpret=interpret)
    return rowqc_pp(yr, yi, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rowqc_pp(yr, yi, interpret: bool = False):
    """The post-column stage of :func:`fft2pp_qc`, taking the column-DFT
    intermediate Y directly. Lets synthesis-analysis pipelines exploit
    colfft(colifft(Y)) = Y: the analysis can consume the synthesis's
    pre-column intermediate without re-running either column pass."""
    bsz, n, _ = yr.shape
    ncc = n // 128
    nh = n // 2
    A, B, _, _, FAre, FAim, TWre, TWim = _plan(n, False)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    mrow_np, J = _mirror_tables(n)
    qs, c = pl.pallas_call(
        functools.partial(_row_qc_kernel, A=A, B=B,
                          fast=_FAST and not interpret),
        grid=(bsz, ncc),
        in_specs=[const_spec((A, A)), const_spec((A, A)),
                  const_spec((B, A)), const_spec((B, A)),
                  const_spec((128, 128)),
                  pl.BlockSpec((1, 64, n), lambda i, j: (i, 2 * j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 64, n), lambda i, j: (i, 2 * j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(
                      (1, 64, n),
                      lambda i, j: (i, 2 * ((ncc - j) % ncc) + 1, 0),
                      memory_space=pltpu.VMEM),
                  pl.BlockSpec(
                      (1, 64, n),
                      lambda i, j: (i, 2 * ((ncc - j) % ncc) + 1, 0),
                      memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 64, n), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((bsz, nh, n), jnp.float32)] * 2,
        interpret=interpret,
    )(jnp.asarray(FAre), jnp.asarray(FAim), jnp.asarray(TWre),
      jnp.asarray(TWim), jnp.asarray(J), yr, yi, yr, yi)

    # partial DFTs for the wrap strips: Z rows [0, 128) and lane chunk 0
    zrow_r, zrow_i = rowfft(yr[:, :128, :], yi[:, :128, :],
                            interpret=interpret)
    zcol_r, zcol_i = rowfft_blk0(yr, yi, interpret=interpret)

    mrow = jnp.asarray(mrow_np)
    p_of_h, _ = half_rows(n)
    rsrc = jnp.asarray(((128 - np.arange(64)) % 128).astype(np.int32))
    csrc = jnp.asarray(mrow_np[p_of_h[64:]])
    mtop = mrow[:128]

    def zm_rows(zrow):
        return jnp.take(jnp.take(zrow, rsrc, axis=1), mrow, axis=2)

    zr_r, zi_r = zrow_r[:, :64, :], zrow_i[:, :64, :]
    mr_r, mi_r = zm_rows(zrow_r), zm_rows(zrow_i)
    qs = jax.lax.dynamic_update_slice(
        qs, 0.5 * (zr_r ** 2 + zi_r ** 2 + mr_r ** 2 + mi_r ** 2),
        (0, 0, 0))
    c = jax.lax.dynamic_update_slice(
        c, zr_r * mr_r - zi_r * mi_r, (0, 0, 0))

    def zm_cols(zcol):
        return jnp.take(jnp.take(zcol, mtop, axis=2), csrc, axis=1)

    def z_strip(zcol):
        s = zcol.reshape(bsz, ncc, 128, 128)[:, :, :64]
        return s.reshape(bsz, nh, 128)[:, 64:]

    zr_cd, zi_cd = z_strip(zcol_r), z_strip(zcol_i)
    mr_c, mi_c = zm_cols(zcol_r), zm_cols(zcol_i)
    qs = jax.lax.dynamic_update_slice(
        qs, 0.5 * (zr_cd ** 2 + zi_cd ** 2 + mr_c ** 2 + mi_c ** 2),
        (0, 64, 0))
    c = jax.lax.dynamic_update_slice(
        c, zr_cd * mr_c - zi_cd * mi_c, (0, 64, 0))
    return qs, c, zrow_r, zrow_i


def _row_s_kernel(FAre_ref, FAim_ref, TWre_ref, TWim_ref, jm_ref,
                  ar_ref, ai_ref, br_ref, bi_ref, s_ref, *, A, B, fast):
    """Fused row DFT + mirror-even cross field s = Im(Z Z(-k)) =
    zr zmi + zi zmr (same structure as _row_qc_kernel)."""
    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None

    def dft_rows(xre, xim):
        return _dft_rows_fwd(xre, xim, FAre, FAim, TWre, TWim, sFre,
                             sFim, A=A, B=B, fast=fast)

    za_r, za_i = dft_rows(ar_ref[0], ai_ref[0])
    zb_r, zb_i = dft_rows(br_ref[0], bi_ref[0])
    jm = jm_ref[:]
    for c_ix in range(B):
        src = (B - c_ix) % B
        mr = _perm_dot(_rev_rows(zb_r[src], 64), jm, fast)
        mi = _perm_dot(_rev_rows(zb_i[src], 64), jm, fast)
        s_ref[0, :, c_ix * A:(c_ix + 1) * A] = \
            za_r[c_ix] * mi + za_i[c_ix] * mr


@functools.partial(jax.jit, static_argnames=("interpret",))
def fft2pp_s(m1, m2, interpret: bool = False):
    """Half-plane cross field s = Im(Z Z(-k)) of fft2(m1 + i m2)
    WITHOUT materializing the Fourier plane (the cross-spectrum
    counterpart of :func:`fft2pp_qc`); also returns the Z rows
    [0, 128)."""
    yr, yi = colfft(m1, m2, interpret=interpret)
    return rows_pp(yr, yi, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rows_pp(yr, yi, interpret: bool = False):
    """Post-column stage of :func:`fft2pp_s` (see :func:`rowqc_pp`)."""
    bsz, n, _ = yr.shape
    ncc = n // 128
    nh = n // 2
    A, B, _, _, FAre, FAim, TWre, TWim = _plan(n, False)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    mrow_np, J = _mirror_tables(n)
    s = pl.pallas_call(
        functools.partial(_row_s_kernel, A=A, B=B,
                          fast=_FAST and not interpret),
        grid=(bsz, ncc),
        in_specs=[const_spec((A, A)), const_spec((A, A)),
                  const_spec((B, A)), const_spec((B, A)),
                  const_spec((128, 128)),
                  pl.BlockSpec((1, 64, n), lambda i, j: (i, 2 * j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 64, n), lambda i, j: (i, 2 * j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(
                      (1, 64, n),
                      lambda i, j: (i, 2 * ((ncc - j) % ncc) + 1, 0),
                      memory_space=pltpu.VMEM),
                  pl.BlockSpec(
                      (1, 64, n),
                      lambda i, j: (i, 2 * ((ncc - j) % ncc) + 1, 0),
                      memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 64, n), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nh, n), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(FAre), jnp.asarray(FAim), jnp.asarray(TWre),
      jnp.asarray(TWim), jnp.asarray(J), yr, yi, yr, yi)

    zrow_r, zrow_i = rowfft(yr[:, :128, :], yi[:, :128, :],
                            interpret=interpret)
    zcol_r, zcol_i = rowfft_blk0(yr, yi, interpret=interpret)

    mrow = jnp.asarray(mrow_np)
    p_of_h, _ = half_rows(n)
    rsrc = jnp.asarray(((128 - np.arange(64)) % 128).astype(np.int32))
    csrc = jnp.asarray(mrow_np[p_of_h[64:]])
    mtop = mrow[:128]

    def zm_rows(zrow):
        return jnp.take(jnp.take(zrow, rsrc, axis=1), mrow, axis=2)

    s = jax.lax.dynamic_update_slice(
        s, zrow_r[:, :64, :] * zm_rows(zrow_i)
        + zrow_i[:, :64, :] * zm_rows(zrow_r), (0, 0, 0))

    def zm_cols(zcol):
        return jnp.take(jnp.take(zcol, mtop, axis=2), csrc, axis=1)

    def z_strip(zcol):
        t = zcol.reshape(bsz, ncc, 128, 128)[:, :, :64]
        return t.reshape(bsz, nh, 128)[:, 64:]

    s = jax.lax.dynamic_update_slice(
        s, z_strip(zcol_r) * zm_cols(zcol_i)
        + z_strip(zcol_i) * zm_cols(zcol_r), (0, 64, 0))
    return s, zrow_r, zrow_i


# ---------------------------------------------------------------------------
# Fused row-DFT + Hermitian weighted combine (linear-combination
# pipelines, e.g. ILC coadds): for packed pairs Z_p = fft2(m_2q + i
# m_2q+1) of coadd j, the weighted band sum is
#   C_j = sum_q alpha_q o Z_{j,q} + beta_q o conj(Z_{j,q}(-k))
# with alpha = (w_2q - i w_2q+1)/2, beta = (w_2q + i w_2q+1)/2 (static
# complex weight planes). Each program row-DFTs one 64-row tile AND its
# row-mirror tile, forms conj(Z(-k)) in registers, applies the weights
# and ACCUMULATES over q in the output block (q innermost in the grid),
# so the per-band Fourier planes never exist in HBM and the coadd is
# written once. Same b = 0 wrap strips as the qc fusion, patched from
# per-pair partial DFTs.
# ---------------------------------------------------------------------------

def _row_combine_kernel(FAre_ref, FAim_ref, TWre_ref, TWim_ref, jm_ref,
                        ar_ref, ai_ref, br_ref, bi_ref,
                        alr_ref, ali_ref, ber_ref, bei_ref,
                        ocr_ref, oci_ref, *, A, B, fast, nq):
    q = pl.program_id(2)

    @pl.when(q == 0)
    def _():
        ocr_ref[:] = jnp.zeros_like(ocr_ref)
        oci_ref[:] = jnp.zeros_like(oci_ref)

    FAre, FAim = FAre_ref[:], FAim_ref[:]
    TWre, TWim = TWre_ref[:], TWim_ref[:]
    sFre = _bsplit(FAre) if fast else None
    sFim = _bsplit(FAim) if fast else None

    def dft_rows(xre, xim):
        return _dft_rows_fwd(xre, xim, FAre, FAim, TWre, TWim, sFre,
                             sFim, A=A, B=B, fast=fast)

    za_r, za_i = dft_rows(ar_ref[0], ai_ref[0])
    zb_r, zb_i = dft_rows(br_ref[0], bi_ref[0])
    jm = jm_ref[:]
    for c_ix in range(B):
        src = (B - c_ix) % B
        mr = _perm_dot(_rev_rows(zb_r[src], 64), jm, fast)
        mi = _perm_dot(_rev_rows(zb_i[src], 64), jm, fast)
        zr = za_r[c_ix]
        zi = za_i[c_ix]
        alr = alr_ref[0, :, c_ix * A:(c_ix + 1) * A]
        ali = ali_ref[0, :, c_ix * A:(c_ix + 1) * A]
        ber = ber_ref[0, :, c_ix * A:(c_ix + 1) * A]
        bei = bei_ref[0, :, c_ix * A:(c_ix + 1) * A]
        # alpha o Z + beta o conj(Zm)
        cre = alr * zr - ali * zi + ber * mr + bei * mi
        cim = alr * zi + ali * zr + bei * mr - ber * mi
        ocr_ref[0, :, c_ix * A:(c_ix + 1) * A] += cre
        oci_ref[0, :, c_ix * A:(c_ix + 1) * A] += cim


@functools.partial(jax.jit, static_argnames=("nq", "interpret"))
def rowcombine_pp(yr, yi, alr, ali, ber, bei, nq: int,
                  interpret: bool = False):
    """Fused row DFT + Hermitian weighted combine of packed pairs.

    yr, yi : (ncoadds * nq, n, n) column intermediates (pair p =
        coadd * nq + q). alr/ali/ber/bei: (nq, n, n) static complex
        weight planes in the doubly-permuted layout.
    Returns (Cr, Ci): (ncoadds, n, n) doubly-permuted coadd planes
    (feed :func:`ifft2pp`, optionally packing coadd pairs)."""
    npt, n, _ = yr.shape
    ncoadds = npt // nq
    ncc = n // 128
    ntiles = n // 64
    A, B, _, _, FAre, FAim, TWre, TWim = _plan(n, False)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda c, t, q: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    def idx_pass(c, t, q):
        return (c * nq + q, t, 0)

    def idx_mirror(c, t, q):
        # tile t = 2j + u (u = 0 lower / 1 upper half of 128-row block j)
        return (c * nq + q,
                2 * ((ncc - t // 2) % ncc) + 1 - (t % 2), 0)

    def idx_w(c, t, q):
        return (q, t, 0)

    def idx_out(c, t, q):
        return (c, t, 0)

    mrow_np, J = _mirror_tables(n)
    tile = lambda idx: pl.BlockSpec((1, 64, n), idx,
                                    memory_space=pltpu.VMEM)
    Cr, Ci = pl.pallas_call(
        functools.partial(_row_combine_kernel, A=A, B=B,
                          fast=_FAST and not interpret, nq=nq),
        grid=(ncoadds, ntiles, nq),
        in_specs=[const_spec((A, A)), const_spec((A, A)),
                  const_spec((B, A)), const_spec((B, A)),
                  const_spec((128, 128)),
                  tile(idx_pass), tile(idx_pass),
                  tile(idx_mirror), tile(idx_mirror),
                  tile(idx_w), tile(idx_w), tile(idx_w), tile(idx_w)],
        out_specs=[tile(idx_out)] * 2,
        out_shape=[jax.ShapeDtypeStruct((ncoadds, n, n), jnp.float32)] * 2,
        interpret=interpret,
    )(jnp.asarray(FAre), jnp.asarray(FAim), jnp.asarray(TWre),
      jnp.asarray(TWim), jnp.asarray(J), yr, yi, yr, yi,
      alr, ali, ber, bei)

    # wrap-strip patches from per-pair partial DFTs
    zrow_r, zrow_i = rowfft(yr[:, :128, :], yi[:, :128, :],
                            interpret=interpret)
    zcol_r, zcol_i = rowfft_blk0(yr, yi, interpret=interpret)
    mrow = jnp.asarray(mrow_np)
    mtop = mrow[:128]
    rsrc = jnp.asarray(((128 - np.arange(128)) % 128).astype(np.int32))
    csrc = mrow  # full-row mirror gather for the lane strip

    sh = (ncoadds, nq)

    def per_q(x):
        return x.reshape(sh + x.shape[1:])

    # rows [0, 128): mirror rows stay inside the strip
    zr_s, zi_s = per_q(zrow_r), per_q(zrow_i)
    zmr_s = jnp.take(jnp.take(zrow_r, rsrc, axis=1), mrow, axis=2)
    zmi_s = jnp.take(jnp.take(zrow_i, rsrc, axis=1), mrow, axis=2)
    zmr_s, zmi_s = per_q(zmr_s), per_q(zmi_s)
    al_r = alr[None, :, :128, :]
    al_i = ali[None, :, :128, :]
    be_r = ber[None, :, :128, :]
    be_i = bei[None, :, :128, :]
    cre = (al_r * zr_s - al_i * zi_s + be_r * zmr_s
           + be_i * zmi_s).sum(axis=1)
    cim = (al_r * zi_s + al_i * zr_s + be_i * zmr_s
           - be_r * zmi_s).sum(axis=1)
    Cr = jax.lax.dynamic_update_slice(Cr, cre, (0, 0, 0))
    Ci = jax.lax.dynamic_update_slice(Ci, cim, (0, 0, 0))

    # lane chunk 0 (all rows): lane mirror stays inside the strip
    zc_r, zc_i = per_q(zcol_r), per_q(zcol_i)
    zmc_r = jnp.take(jnp.take(zcol_r, mtop, axis=2), csrc, axis=1)
    zmc_i = jnp.take(jnp.take(zcol_i, mtop, axis=2), csrc, axis=1)
    zmc_r, zmc_i = per_q(zmc_r), per_q(zmc_i)
    al_r = alr[None, :, :, :128]
    al_i = ali[None, :, :, :128]
    be_r = ber[None, :, :, :128]
    be_i = bei[None, :, :, :128]
    cre0 = (al_r * zc_r - al_i * zc_i + be_r * zmc_r
            + be_i * zmc_i).sum(axis=1)
    cim0 = (al_r * zc_i + al_i * zc_r + be_i * zmc_r
            - be_r * zmc_i).sum(axis=1)
    # both patches are exact on their strips (the gathers use the full
    # mirror permutations), including the overlapping corner
    Cr = Cr.at[:, :, :128].set(cre0)
    Ci = Ci.at[:, :, :128].set(cim0)
    return Cr, Ci
