"""Pallas TPU kernel for spline-interpolated map displacement (lensing).

This is the TPU-native replacement for the native interpolation inside
``pixell.lensing.displace_map`` (reference ``orphics/lensing.py:512``):
evaluate a periodic B-spline representation of a map at per-pixel
displaced positions.  The XLA formulation in
:func:`orphics_tpu.models.lensing.lens_map_spline` pays ~100 ns/element
for TPU gathers even with shared indices (~15 ms per 512² map); this
kernel removes the gathers entirely.

Design (TPU-first, no gathers):

* CMB deflections are physically bounded (RMS ~1.3 px at 2' pixels,
  extreme tails a few px), so the displacement is clipped to a static
  cap ``maxdisp_px`` = D pixels per axis (default 8 ≡ 16 arcmin at 2'
  resolution — far beyond any LCDM deflection).  With a bounded integer
  displacement, the scattered spline evaluation becomes a *dense sum
  over NS = 2D + order + 1 static shifts per axis*:

      out[p] = Σ_s Σ_r  Wy_s[p] · Wx_r[p] · C[y(p)+s+c0, x(p)+r+c0]

  where ``Wy_s = Σ_k w_k(ty) · [floor(py)+D+k == s]`` folds the spline
  tap weights ``w_k`` (cubic/quintic B-spline basis at the sub-pixel
  fraction) into per-shift masks.  Every term is a *static* slice of an
  on-chip window — pure VPU multiply-adds, no dynamic indexing.

* The grid is (batch, comp, row-blocks, col-blocks).  The wrap-padded
  coefficient map stays in HBM (``pl.ANY``); each program DMAs its
  (bh+NS, bw+NS) halo window into VMEM scratch (overlapping windows
  cannot be expressed with blocked BlockSpecs), overlapping the copy
  with the weight computation.  Displacements are auto-pipelined
  BlockSpec inputs.

* The spline *prefilter* (deconvolution of the B-spline sampling
  kernel) is exact in Fourier space and stays in XLA where it fuses
  with the surrounding FFT work — see :func:`spline_coeffs`.

Parity: matches ``lens_map_spline`` (the independently-validated XLA
path) to float32 roundoff for displacements within the cap; see
``tests/test_lensing.py`` and the on-chip check in
``tests/test_tpu_chip.py``.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import Geometry
from . import fourier as F

__all__ = ["lens_map_pallas", "spline_coeffs"]

_OFFS = {3: (-1, 0, 1, 2), 5: (-2, -1, 0, 1, 2, 3)}


def _bspline3_weights(t):
    """Cubic B-spline basis at taps floor+(-1,0,1,2) for fraction t."""
    w0 = (1.0 - t) ** 3 / 6.0
    w1 = 2.0 / 3.0 - t * t + 0.5 * t ** 3
    w2 = 2.0 / 3.0 - (1 - t) ** 2 + 0.5 * (1 - t) ** 3
    w3 = t ** 3 / 6.0
    return (w0, w1, w2, w3)


def _bspline5_weights(t):
    """Quintic B-spline basis at taps floor+(-2..3) for fraction t."""
    def b5(x):
        ax = jnp.abs(x)
        r = jnp.where(ax < 1, (33.0 - 30 * ax ** 2 + 15 * ax ** 4
                               - 5 * ax ** 5) / 60.0, 0.0)
        r = jnp.where((ax >= 1) & (ax < 2),
                      (51.0 + 75 * ax - 210 * ax ** 2 + 150 * ax ** 3
                       - 45 * ax ** 4 + 5 * ax ** 5) / 120.0, r)
        return jnp.where((ax >= 2) & (ax < 3), (3.0 - ax) ** 5 / 120.0, r)
    return tuple(b5(t - m) for m in (-2, -1, 0, 1, 2, 3))


def _bspline_freq_response(n, order):
    """Frequency response of the centered B-spline sampling kernel."""
    taps = {3: np.array([1.0, 4.0, 1.0]) / 6.0,
            5: np.array([1.0, 26.0, 66.0, 26.0, 1.0]) / 120.0}[order]
    w = 2 * np.pi * np.fft.fftfreq(n)
    half = (len(taps) - 1) // 2
    resp = np.full(n, taps[half])
    for j in range(1, half + 1):
        resp = resp + 2.0 * taps[half + j] * np.cos(j * w)
    return resp


def spline_coeffs(imap, geom: Geometry, order: int):
    """Periodic B-spline coefficients of ``imap`` via the exact Fourier
    prefilter (deconvolve the sampling-kernel response)."""
    ry = jnp.asarray(_bspline_freq_response(geom.ny, order), jnp.float32)
    rx = jnp.asarray(_bspline_freq_response(geom.nx, order), jnp.float32)
    k = F.fft2(imap, geom, "raw")
    return F.ifft2(k / (ry[:, None] * rx[None, :]), geom, "raw").real


def _lens_kernel(py_ref, px_ref, cref, oref, win, sem, *,
                 order, D, NS, BH, BW, ROW0A, DY, DX, WH, WW):
    b = pl.program_id(0)
    c = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)
    # window start is (8,128)-tile aligned (Mosaic DMA slice constraint);
    # the residual offsets DY/DX are folded into the static compute slices
    copy = pltpu.make_async_copy(
        cref.at[b, c, pl.ds(i * BH + ROW0A, WH), pl.ds(j * BW, WW)],
        win, sem)
    copy.start()

    py = py_ref[0]
    px = px_ref[0]
    fy = jnp.floor(py)
    fx = jnp.floor(px)
    uy = fy.astype(jnp.int32) + D        # integer shift index in [0, 2D]
    ux = fx.astype(jnp.int32) + D
    wfn = _bspline3_weights if order == 3 else _bspline5_weights
    wys = wfn(py - fy)
    wxs = wfn(px - fx)
    ntap = order + 1
    # Fold tap weights into dense per-shift weight planes:
    #   Wy_s = sum_k wys[k] * [uy + k == s]
    # Wy planes are reused NS times (materialized); Wx_r is used once
    # per r and computed on the fly.  The loops run r (lane shift)
    # OUTER so each lane rotation of the window happens once — the
    # inner s loop then uses cheap sublane slices — instead of NS^2
    # lane-offset slice relayouts (which also OOM'd Mosaic's scoped
    # VMEM at larger blocks).
    Wy = [sum(jnp.where(uy == s - k, wys[k], 0.0) for k in range(ntap)
              if 0 <= s - k <= 2 * D) for s in range(NS)]

    copy.wait()
    acc = jnp.zeros((BH, BW), jnp.float32)
    for r in range(NS):
        winr = win[:, DX + r:DX + r + BW]       # one lane rotation
        t_r = jnp.zeros((BH, BW), jnp.float32)
        for s in range(NS):
            t_r += Wy[s] * winr[DY + s:DY + s + BH, :]
        wx_r = sum(jnp.where(ux == r - k, wxs[k], 0.0) for k in range(ntap)
                   if 0 <= r - k <= 2 * D)
        acc += wx_r * t_r
    oref[0, 0] = acc


def blocks(ny, nx):
    """The kernel tiling for an (ny, nx) map, or (None, None) when no
    valid tiling exists. Rows: the largest multiple-of-8 divisor of ny
    up to 64 (ny itself when ny <= 64 — sublane granularity 8). Cols:
    256 or 128 for nx > 256 (lane starts j*BW must stay 128-aligned),
    nx itself otherwise (single column tile, start 0)."""
    if ny <= 64:
        bh = ny
    else:
        bh = next((b for b in range(64, 7, -8) if ny % b == 0), None)
    if nx <= 256:
        bw = nx
    else:
        bw = next((b for b in (256, 128) if nx % b == 0), None)
    return bh, bw


def supported(geom: Geometry) -> bool:
    """Can :func:`lens_map_pallas` tile this geometry? (Callers that
    must accept any shape fall back to ``lens_map_spline``.)"""
    bh, bw = blocks(*geom.shape)
    return bh is not None and bw is not None


@functools.partial(jax.jit,
                   static_argnames=("geom", "order", "maxdisp_px",
                                    "prefiltered", "interpret"))
def lens_map_pallas(imap, alpha, geom: Geometry, order: int = 5,
                    maxdisp_px: int = 8, prefiltered: bool = False,
                    interpret: bool = False):
    """Displace ``imap`` by the deflection ``alpha`` with periodic
    B-spline interpolation, on the MXU-free all-VPU Pallas path.

    Parameters
    ----------
    imap : (ny, nx), (C, ny, nx) or (B, C, ny, nx) map(s).  When a
        batch axis is present each batch entry has its own deflection.
    alpha : (2, ny, nx) or (B, 2, ny, nx) deflection in radians
        (dy, dx), shared across the component axis.
    order : 3 or 5 (cubic / quintic, as ``pixell.lensing.displace_map``).
    maxdisp_px : static per-axis displacement cap D in pixels; the
        displacement is clipped to [-D, D].  The default 8 px is ~16
        arcmin at 2' resolution, far beyond physical CMB deflections;
        raise it for very high-resolution geometries.
    prefiltered : if True, ``imap`` already holds spline coefficients
        (skip the Fourier prefilter) - used by fused pipelines.

    Shape constraint (see :func:`blocks`/:func:`supported`): the map
    must tile into (BH, BW) blocks with BH a multiple-of-8 divisor of
    ny (<= 64; or ny itself when ny <= 64) and BW in {256, 128} for
    nx > 256 (or nx itself when nx <= 256, lane alignment via j = 0).
    Unsupported shapes raise ValueError — callers that must accept any
    geometry fall back to :func:`..models.lensing.lens_map_spline`
    (``LensedQEPipeline`` does this automatically).
    """
    if order not in _OFFS:
        raise ValueError("order must be 3 or 5")
    offs = _OFFS[order]
    D = int(maxdisp_px)
    NS = 2 * D + order + 1
    ny, nx = geom.shape

    ishape = imap.shape
    if imap.ndim == 2:
        imap4 = imap[None, None]
    elif imap.ndim == 3:
        imap4 = imap[None]
    elif imap.ndim == 4:
        imap4 = imap
    else:
        raise ValueError(f"imap rank {imap.ndim} unsupported")
    B, C = imap4.shape[:2]
    if alpha.ndim == 3:
        alpha4 = alpha[None]
    else:
        alpha4 = alpha
    if alpha4.shape[0] != B:
        raise ValueError(f"alpha batch {alpha4.shape[0]} != imap batch {B}")

    coeffs = imap4 if prefiltered else spline_coeffs(imap4, geom, order)
    PAD = D + order  # covers D + |offs| on both sides

    py = jnp.clip(alpha4[:, 0] / geom.dy, -D, D).astype(jnp.float32)
    px = jnp.clip(alpha4[:, 1] / geom.dx, -D, D).astype(jnp.float32)

    BH, BW = blocks(ny, nx)
    if BH is None or BW is None:
        raise ValueError(
            f"map shape {(ny, nx)} has no valid kernel tiling (need a "
            "multiple-of-8 row divisor <= 64 and a column divisor in "
            "{256, 128} for nx > 256); use lens_map_spline for this "
            "geometry")
    # window row 0 holds absolute map row (i*BH - D + offs[0]), i.e.
    # padded row i*BH + ROW0 with ROW0 = PAD - D + offs[0]; Mosaic
    # requires DMA slices tile-aligned, so align the start down to the
    # (8, 128) tile and carry the residual (DY, DX) into the compute
    ROW0 = PAD - D + offs[0]
    ROW0A = (ROW0 // 8) * 8
    DY = ROW0 - ROW0A
    DX = ROW0  # columns start at j*BW (128-aligned); residual is ROW0
    WH = -(-(DY + BH + NS) // 8) * 8
    WW = -(-(DX + BW + NS) // 128) * 128
    # wrap-pad so every aligned window stays in bounds
    pad_bot = max(PAD, (ny // BH - 1) * BH + ROW0A + WH - ny - PAD)
    pad_rgt = max(PAD, (nx // BW - 1) * BW + WW - nx - PAD)
    cpad = jnp.pad(coeffs.astype(jnp.float32),
                   ((0, 0), (0, 0), (PAD, pad_bot), (PAD, pad_rgt)),
                   mode="wrap")

    kernel = functools.partial(_lens_kernel, order=order, D=D, NS=NS,
                               BH=BH, BW=BW, ROW0A=ROW0A, DY=DY, DX=DX,
                               WH=WH, WW=WW)
    out = pl.pallas_call(
        kernel,
        grid=(B, C, ny // BH, nx // BW),
        in_specs=[
            pl.BlockSpec((1, BH, BW), lambda b, c, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BH, BW), lambda b, c, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, BH, BW),
                               lambda b, c, i, j: (b, c, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, ny, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WH, WW), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(py, px, cpad)
    return out.reshape(ishape).astype(imap.dtype)
