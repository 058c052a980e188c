"""Remaining map-space toolkit: stacking/aperture photometry, matched
filters, pure-B purification, CG inpainting, power downsampling, beam
sanitization, gap filling, map rotation/rescaling, healpix thumbnails.

Covers the tail of the reference ``orphics/maps.py`` inventory (SURVEY
§2.1): ``flux`` (:2500), ``MatchedFilter`` (:2576), ``matched_filter``
(:677), ``FourierStack`` (:65), ``Purify``/``iqu_to_pure_lteb``
(:2624,2666), ``inpaint_cg`` (:2185), ``downsample_power`` (:1501),
``SymMat`` (:2882), ``sanitize_beam`` (:299), ``gapfill_edge_conv_flat``
(:819), ``cosine_taper``/``cosine_stitch`` (:960,967), ``MapRotator``
(:1681), ``diagonal_cov``/``ncov``/``pixcov`` maxlike block (:1792-1870),
``thumbnail_healpix`` (:614), ``galactic_mask`` (:1186), ``fsky``/``area``
(:1030-1037), ``analytical_tf`` (:89), ``minimum_ell`` (:363).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import Geometry, arcmin, degree
from ..ops import fourier as F
from ..ops.binning import Bin2D

__all__ = [
    "flux", "MatchedFilter", "matched_filter", "get_normalized_center",
    "FourierStack", "mask_center", "crop_center", "get_central", "Purify",
    "iqu_to_pure_lteb", "inpaint_cg", "analytical_tf", "minimum_ell",
    "cosine_taper", "downsample_power", "SymMat", "symmat_from_data",
    "sanitize_beam", "gapfill_edge_conv_flat", "binary_mask", "area",
    "fsky", "area_sqdeg", "rescale", "rotate", "MapRotator",
    "diagonal_cov", "ncov", "thumbnail_healpix", "galactic_mask",
    "generate_correlated_alm", "ftrans", "real_space_filter", "rfilter",
]


# ------------------------------------------------------------------
# stacking / aperture photometry / matched filtering
# ------------------------------------------------------------------

def flux(thumbs, aperture_radius, geom: Geometry, annulus_width=None,
         modrmap=None, pixsizemap=None):
    """Aperture photometry with annulus mean subtraction (reference
    ``orphics/maps.py:2500``), batched over leading dims."""
    thumbs = jnp.asarray(thumbs)
    if modrmap is None:
        modrmap = geom.modrmap(thumbs.dtype)
    if annulus_width is None:
        annulus_width = (np.sqrt(2.0) - 1.0) * aperture_radius
    if pixsizemap is None:
        pixsizemap = geom.pixsizemap(thumbs.dtype)
    ann = ((modrmap > aperture_radius)
           & (modrmap < aperture_radius + annulus_width))
    disk = modrmap <= aperture_radius
    wann = pixsizemap * ann
    num = jnp.sum(thumbs * wann, axis=(-2, -1))
    den = jnp.sum(wann)
    mean = (num / den)[..., None, None]
    return jnp.sum((thumbs - mean) * pixsizemap * disk, axis=(-2, -1))


class MatchedFilter:
    """Optimal amplitude of a known template in noisy data (reference
    ``orphics/maps.py:2576``): returns (amplitude, variance)."""

    def __init__(self, geom: Geometry, template=None, noise_power=None):
        self.geom = geom
        self.normfact = geom.area / geom.npix ** 2
        self.n2d = noise_power
        self.ktemp = (jnp.fft.fft2(jnp.asarray(template))
                      if template is not None else None)

    def apply(self, imap=None, kmap=None, template=None, noise_power=None,
              kmask=None):
        if kmap is None:
            kmap = jnp.fft.fft2(jnp.asarray(imap))
        ktemp = (self.ktemp if template is None
                 else jnp.fft.fft2(jnp.asarray(template)))
        n2d = self.n2d if noise_power is None else noise_power
        if kmask is None:
            kmask = 1.0
        in2d = jnp.nan_to_num(1.0 / jnp.asarray(n2d), posinf=0.0, neginf=0.0)
        phi_un = jnp.sum((ktemp.conj() * kmap).real
                         * self.normfact * kmask * in2d)
        phi_var = 1.0 / jnp.sum((ktemp.conj() * ktemp).real
                                * self.normfact * kmask * in2d)
        return phi_un * phi_var, phi_var


def matched_filter(kmap, ktemplate, n2d, geom: Geometry, kmask=None):
    """Functional matched filter on k-maps (reference
    ``orphics/maps.py:677``)."""
    mf = MatchedFilter(geom)
    mf.ktemp = ktemplate
    mf.n2d = n2d
    return mf.apply(kmap=kmap, kmask=kmask)


def get_normalized_center(geom: Geometry, dtype=jnp.float32):
    """Unit-integral delta at the patch center (reference
    ``orphics/maps.py:55``)."""
    t = jnp.zeros(geom.shape, dtype)
    return t.at[geom.ny // 2, geom.nx // 2].set(1.0 / geom.pixsize)


class FourierStack:
    """Bin kmap x conj(k-delta-template): radial Fourier-space stacking
    (reference ``orphics/maps.py:65``)."""

    def __init__(self, geom: Geometry, bin_edges):
        self.geom = geom
        self.binner = Bin2D(np.asarray(geom.modlmap(jnp.float64)), bin_edges)
        temp = get_normalized_center(geom)
        self.ktemp = F.fft2(temp, geom, "phys")

    def apply(self, kmap):
        return self.binner.bin((kmap * self.ktemp.conj()).real)


def mask_center(imap):
    """NaN the central pixel(s) (reference ``orphics/maps.py:2601``)."""
    imap = jnp.asarray(imap)
    n = imap.shape[-1]
    c = n // 2
    if n % 2 == 1:
        return imap.at[..., c, c].set(jnp.nan)
    out = imap.at[..., c, c].set(jnp.nan)
    out = out.at[..., c - 1, c].set(jnp.nan)
    out = out.at[..., c, c - 1].set(jnp.nan)
    return out.at[..., c - 1, c - 1].set(jnp.nan)


def crop_center(imap, ny, nx=None):
    nx = ny if nx is None else nx
    Ny, Nx = imap.shape[-2:]
    y0 = (Ny - ny) // 2
    x0 = (Nx - nx) // 2
    return imap[..., y0:y0 + ny, x0:x0 + nx]


def get_central(imap, frac):
    """Central fraction of a map (reference ``get_central``)."""
    if frac is None or frac == 1:
        return imap
    Ny, Nx = imap.shape[-2:]
    return crop_center(imap, int(Ny * frac), int(Nx * frac))


# ------------------------------------------------------------------
# pure-B purification (Smith estimator; reference maps.py:2624-2730)
# ------------------------------------------------------------------

def _fd_shift(a, dy, dx):
    return jnp.roll(a, (-dy, -dx), axis=(-2, -1))


def _deriv4(win, axis, delta):
    """4th-order centered finite difference along an axis (periodic)."""
    def sh(k):
        return jnp.roll(win, -k, axis=axis)
    return (-sh(2) + 8 * sh(1) - 8 * sh(-1) + sh(-2)) / (12.0 * delta)


def init_deriv_window(window, geom: Geometry):
    """Window derivatives for the pure-B estimator (reference
    ``orphics/maps.py:2640``)."""
    w = jnp.asarray(window)
    dx = _deriv4(w, -1, abs(geom.dx))
    dy = _deriv4(w, -2, abs(geom.dy))
    d2x = _deriv4(dx, -1, abs(geom.dx))
    d2y = _deriv4(dy, -2, abs(geom.dy))
    dxdy = _deriv4(dy, -1, abs(geom.dx))
    return dict(Win=w, dWin_dx=dx, dWin_dy=dy, d2Win_dx2=d2x,
                d2Win_dy2=d2y, d2Win_dxdy=dxdy)


def iqu_to_pure_lteb(tmap, qmap, umap, geom: Geometry, windict,
                     method: str = "pure", iau: bool = False):
    """(fT, fE, fB) with E->B leakage purification (Smith 2006 pure
    estimator; capability of reference ``orphics/maps.py:2666``).
    Input maps must already carry the window. Raw-fft outputs.

    Derivation in this framework's conventions (E + iB =
    e^{-2 i phi_l} fft(W (Q+iU)) with phi_l = atan2(lx, ly)): with the
    spin-lowering operator D = d/dy - i d/dx one has
    D^2 e^{-il.x} = -l^2 e^{-2 i phi} e^{-il.x}, so integrating D^2 by
    parts off the plane wave onto (W P+) gives

      B_pure = B_std + (2i/l)[cos(phi) fft(U Wy - Q Wx)
                              - sin(phi) fft(Q Wy + U Wx)]
                     - (1/l^2) fft(U (Wyy - Wxx) - 2 Q Wxy)
      E_pure = E_std + (2i/l)[cos(phi) fft(Q Wy + U Wx)
                              + sin(phi) fft(U Wy - Q Wx)]
                     - (1/l^2) fft(Q (Wyy - Wxx) + 2 U Wxy)

    with Q, U the *unwindowed* fields (boundary terms vanish because the
    window and its gradient vanish at the mask edge). Validated by the
    E-only Monte-Carlo: the pure B power is ~5e3 times below the standard
    estimator's leakage (tests/test_mapstools.py).
    """
    ml = geom.modlmap(jnp.float64)
    ml = jnp.where(ml < 1.0, 1.0, ml)
    lmap = geom.lmap(jnp.float64)
    ang = jnp.arctan2(lmap[1], lmap[0])  # atan2(lx, ly)
    if iau:
        ang = -ang
    c2, s2 = jnp.cos(2 * ang), jnp.sin(2 * ang)
    c1, s1 = jnp.cos(ang), jnp.sin(ang)

    fT = jnp.fft.fft2(tmap)
    fQ = jnp.fft.fft2(qmap)
    fU = jnp.fft.fft2(umap)
    fE = fQ * c2 + fU * s2
    fB = -fQ * s2 + fU * c2
    if method == "standard":
        return fT, fE, fB

    w = windict
    Wx, Wy = w['dWin_dx'], w['dWin_dy']
    Wxx, Wyy, Wxy = w['d2Win_dx2'], w['d2Win_dy2'], w['d2Win_dxdy']
    q = qmap / _safe(w['Win'])
    u = umap / _safe(w['Win'])
    fA = jnp.fft.fft2(q * Wy + u * Wx)   # A = Q Wy + U Wx
    fC = jnp.fft.fft2(u * Wy - q * Wx)   # C = U Wy - Q Wx
    fB = fB + (2.0j / ml) * (c1 * fC - s1 * fA) \
        - jnp.fft.fft2(u * (Wyy - Wxx) - 2.0 * q * Wxy) / ml ** 2
    if method == "hybrid":
        return fT, fE, fB
    fE = fE + (2.0j / ml) * (c1 * fA + s1 * fC) \
        - jnp.fft.fft2(q * (Wyy - Wxx) + 2.0 * u * Wxy) / ml ** 2
    return fT, fE, fB


def _safe(w):
    return jnp.where(jnp.abs(w) > 1e-8, w, 1.0)


class Purify:
    """Pure-B spectra estimator wrapper (reference ``orphics/maps.py:2624``).

    >>> pur = Purify(geom, window)
    >>> fT, fE, fB = pur.lteb_from_iqu(iqu * window)
    """

    def __init__(self, geom: Geometry, window):
        self.geom = geom
        self.windict = init_deriv_window(window, geom)

    def lteb_from_iqu(self, imap, method: str = "pure", iau: bool = False):
        return iqu_to_pure_lteb(imap[0], imap[1], imap[2], self.geom,
                                self.windict, method=method, iau=iau)


# ------------------------------------------------------------------
# CG inpainting (reference maps.py:2185)
# ------------------------------------------------------------------

@partial(jax.jit, static_argnames=("geom", "maxiter"))
def inpaint_cg(imap, rand_map, mask, power2d, geom: Geometry, eps=1e-8,
               maxiter=500):
    """Constrained-realization hole filling by conjugate-gradient Wiener
    solve (Thibaut Louis' algorithm; reference ``orphics/maps.py:2185``).

    mask is 1 in the *good* region; power2d must be nonzero to pixel scale.
    The CG loop is ``jax.scipy.sparse.linalg.cg`` — fully on device.
    """
    from jax.scipy.sparse.linalg import cg
    imap = jnp.asarray(imap)
    mask = jnp.asarray(mask)
    ipow = 1.0 / jnp.asarray(power2d)

    def cinv(x):
        return jnp.fft.ifft2(jnp.fft.fft2(x) * ipow).real

    bad = 1.0 - mask

    def Aop(x):
        return (bad * cinv(bad * x.reshape(geom.shape))).reshape(-1)

    b = -(bad * cinv(mask * (imap - rand_map))).reshape(-1)
    x, _ = cg(Aop, b, x0=b, tol=eps, maxiter=maxiter)
    x = x.reshape(geom.shape) + rand_map * bad
    return imap * mask + x * bad


# ------------------------------------------------------------------
# misc spectra utilities
# ------------------------------------------------------------------

def analytical_tf(geom: Geometry, kfilter, bin_edges):
    """Binned k-mask transfer function (reference ``orphics/maps.py:89``)."""
    binner = Bin2D(np.asarray(geom.modlmap(jnp.float64)), bin_edges)
    return binner.bin(jnp.asarray(kfilter).astype(jnp.float64))


def minimum_ell(geom: Geometry) -> int:
    """Lowest nonzero |l| on the grid (reference ``orphics/maps.py:363``)."""
    ml = np.asarray(geom.modlmap(jnp.float64))
    return int(ml[ml > 0].min())


def cosine_taper(ls, lstart, lwidth):
    """Low-pass cosine taper filter (reference ``orphics/maps.py:960``)."""
    ls = np.asarray(ls, dtype=float)
    fl = np.ones_like(ls)
    sel = ls > lstart
    fl[sel] = 1 - 0.5 * (1 - np.cos(-np.pi * (ls[sel] - lstart) / lwidth))
    fl[ls > lstart + lwidth] = 0
    return fl


def downsample_power(p2d, geom: Geometry, ndown=16, exp=None, fftshift=True):
    """Smooth a 2D power spectrum by block averaging (noise-model /
    empirical-covariance smoothing; reference ``orphics/maps.py:1501``)."""
    from .grf import eig_pow
    p = jnp.asarray(p2d)
    if ndown < 1:
        return p
    ny, nx = p.shape[-2:]
    if fftshift:
        p = jnp.fft.fftshift(p, axes=(-2, -1))
    by, bx = ny // ndown, nx // ndown
    trimmed = p[..., :by * ndown, :bx * ndown]
    low = trimmed.reshape(p.shape[:-2] + (by, ndown, bx, ndown)).mean(
        axis=(-3, -1))
    if exp is not None:
        if low.ndim == 4:  # (ncomp, ncomp, by, bx)
            stack = jnp.moveaxis(low, (0, 1), (-2, -1))
            low = jnp.moveaxis(eig_pow(stack, exp), (-2, -1), (0, 1))
        else:
            low = jnp.abs(low) ** exp * jnp.sign(low)
    # nearest-neighbour upsample back
    up = jnp.repeat(jnp.repeat(low, ndown, axis=-2), ndown, axis=-1)
    out = jnp.zeros_like(p)
    out = out.at[..., :by * ndown, :bx * ndown].set(up)
    # fill trimmed borders with edge values
    out = out.at[..., by * ndown:, :].set(out[..., by * ndown - 1:by * ndown, :])
    out = out.at[..., :, bx * ndown:].set(out[..., :, bx * ndown - 1:bx * ndown])
    if fftshift:
        out = jnp.fft.ifftshift(out, axes=(-2, -1))
    return out


class SymMat:
    """Upper-triangle storage of a symmetric (ncomp, ncomp, ...) matrix
    (reference ``orphics/maps.py:2882``)."""

    def __init__(self, ncomp, shape, data=None):
        self.ncomp = ncomp
        self.shape = shape
        ndat = ncomp * (ncomp + 1) // 2
        self.data = data if data is not None else np.empty((ndat,) + tuple(shape))

    def yx_to_k(self, y, x):
        if y > x:
            return self.yx_to_k(x, y)
        return y * self.ncomp + x - y * (y + 1) // 2

    def __getitem__(self, tup):
        y, x = tup
        return self.data[self.yx_to_k(y, x)]

    def __setitem__(self, tup, value):
        y, x = tup
        self.data[self.yx_to_k(y, x)] = value

    def to_array(self, sel=np.s_[...], flatten=False):
        oshape = (self.data[0].reshape(-1)[sel].shape if flatten
                  else self.data[0][sel].shape)
        out = np.empty((self.ncomp, self.ncomp) + oshape)
        for y in range(self.ncomp):
            for x in range(y, self.ncomp):
                d = self.data[self.yx_to_k(y, x)]
                d = d.reshape(-1) if flatten else d
                out[y, x] = d[sel]
                if x != y:
                    out[x, y] = out[y, x]
        return out


def symmat_from_data(data):
    ndat = data.shape[0]
    ncomp = int(0.5 * (np.sqrt(8 * ndat + 1) - 1))
    return SymMat(ncomp, data.shape[1:], data=data)


def sanitize_beam(ells, lbeam, sval=1e-3, verbose=False):
    """Normalize a beam and continue it with a matched Gaussian below
    ``sval`` (reference ``orphics/maps.py:299``)."""
    ells = np.asarray(ells)
    if ells[0] != 0 or not np.all(np.diff(ells) == 1):
        raise ValueError("ells must be 0..lmax with unit spacing")
    lbeam = np.asarray(lbeam, dtype=float) / lbeam[0]
    if sval is None:
        return lbeam
    low = np.where(lbeam < sval)[0]
    if low.size == 0:
        return lbeam
    i0 = int(low[0]) - 1
    oell, olb = ells[i0], lbeam[i0]
    theta2 = -(16.0 * np.log(2.0)) * np.log(olb) / oell ** 2
    theta_fwhm = np.degrees(np.sqrt(theta2)) * 60.0
    obeam = lbeam.copy()
    obeam[low] = np.asarray(F.gauss_beam(ells[low], theta_fwhm))
    return obeam


def gapfill_edge_conv_flat(imap, mask, geom: Geometry, ivar=None, alpha=-3,
                           edge_rad=1 * arcmin, rmin=2 * arcmin, tol=1e-8,
                           key=None):
    """Gapfill by masked convolution with an r^alpha profile prioritizing
    the hole edges (reference ``orphics/maps.py:819``). ``mask`` is True
    in BAD regions."""
    from ..ops.distance import distance_transform
    imap = jnp.asarray(imap)
    mask = jnp.asarray(mask).astype(bool)
    # centered radial profile (periodic)
    y = np.fft.fftfreq(geom.ny) * geom.ny * abs(geom.dy)
    x = np.fft.fftfreq(geom.nx) * geom.nx * abs(geom.dx)
    r = np.sqrt(y[:, None] ** 2 + x[None, :] ** 2)
    r = np.maximum(r, rmin)
    rprof = jnp.asarray((r / arcmin) ** alpha)
    lprof = jnp.fft.fft2(rprof)
    # weight = ring of good pixels at the mask edge (at least ~1.5 px wide
    # so coarse grids don't produce an empty ring)
    edge_rad = max(edge_rad, 1.6 * max(abs(geom.dy), abs(geom.dx)))
    edist = distance_transform(mask, abs(geom.dy), abs(geom.dx))
    weight = ((edist > 0) & (edist < edge_rad)).astype(imap.dtype)

    def conv(m):
        return jnp.fft.ifft2(lprof * jnp.fft.fft2(m)).real

    rhs = conv(weight * imap)
    div = conv(weight)
    div = jnp.maximum(div, jnp.max(div) * tol * 100)
    omap = rhs / div
    omap = jnp.where(mask, omap, imap)
    if ivar is not None:
        if key is None:
            key = jax.random.PRNGKey(0)
        n = jax.random.normal(key, geom.shape, imap.dtype) / jnp.sqrt(ivar)
        omap = jnp.where(mask, omap + n, omap)
    return omap


def binary_mask(mask, threshold=0.5):
    return (jnp.asarray(mask) > threshold).astype(jnp.float32)


def area(mask, geom: Geometry, threshold=0.5):
    """Unmasked area in steradians (reference ``orphics/maps.py:1033``)."""
    return float(jnp.sum(binary_mask(mask, threshold)
                         * geom.pixsizemap(jnp.float64)))


def fsky(mask, geom: Geometry, threshold=0.5):
    return area(mask, geom, threshold) / 4.0 / np.pi


def area_sqdeg(mask, geom: Geometry, threshold=0.5):
    return area(mask, geom, threshold) / degree ** 2


# ------------------------------------------------------------------
# interpolation-based map transforms
# ------------------------------------------------------------------

def _bilinear_at(imap, py, px):
    """Bilinear sample of (..., ny, nx) at fractional pixel coords."""
    ny, nx = imap.shape[-2:]
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, ny - 2)
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, nx - 2)
    ty = jnp.clip(py - y0, 0.0, 1.0)
    tx = jnp.clip(px - x0, 0.0, 1.0)
    eps = 1e-5  # tolerate roundoff at the exact boundary
    inside = (py >= -eps) & (py <= ny - 1 + eps) \
        & (px >= -eps) & (px <= nx - 1 + eps)

    def at(dy, dx):
        idx = (y0 + dy) * nx + (x0 + dx)
        flat = imap.reshape(imap.shape[:-2] + (-1,))
        return jnp.take(flat, idx.reshape(-1), axis=-1).reshape(
            imap.shape[:-2] + py.shape)

    out = (at(0, 0) * (1 - ty) * (1 - tx) + at(0, 1) * (1 - ty) * tx
           + at(1, 0) * ty * (1 - tx) + at(1, 1) * ty * tx)
    return jnp.where(inside, out, 0.0)


def rescale(imap, factor, geom: Geometry):
    """Zoom a thumbnail by ``factor`` keeping its shape (reference
    ``orphics/maps.py:rescale``)."""
    ny, nx = geom.shape
    cy, cx = (ny - 1) / 2.0, (nx - 1) / 2.0
    iy = (jnp.arange(ny) - cy) * factor + cy
    ix = (jnp.arange(nx) - cx) * factor + cx
    py = jnp.broadcast_to(iy[:, None], (ny, nx))
    px = jnp.broadcast_to(ix[None, :], (ny, nx))
    return _bilinear_at(jnp.asarray(imap), py, px)


def rotate(imap, angle, geom: Geometry):
    """Rotate a map about its center by ``angle`` radians (clockwise
    positive, reference ``orphics/maps.py:rotate``)."""
    ny, nx = geom.shape
    cy, cx = (ny - 1) / 2.0, (nx - 1) / 2.0
    yy = jnp.arange(ny)[:, None] - cy
    xx = jnp.arange(nx)[None, :] - cx
    c, s = jnp.cos(angle), jnp.sin(angle)
    py = c * yy - s * xx + cy
    px = s * yy + c * xx + cx
    return _bilinear_at(jnp.asarray(imap),
                        jnp.broadcast_to(py, (ny, nx)),
                        jnp.broadcast_to(px, (ny, nx)))


class MapRotator:
    """Recenter a source-geometry patch onto a target geometry by sky-
    coordinate lookup + bilinear interpolation (flat-sky version of
    reference ``orphics/maps.py:1681``)."""

    def __init__(self, geom_source: Geometry, geom_target: Geometry):
        self.gs = geom_source
        self.gt = geom_target
        pos = geom_target.posmap(jnp.float64)
        # recenter: target coords relative to its center land on source
        # coords relative to the source center
        rel = jnp.stack([pos[0] - geom_target.y0, pos[1]])
        src = jnp.stack([rel[0] + geom_source.y0, rel[1]])
        self.pix_target = geom_source.sky2pix(src)

    def rotate(self, imap):
        return _bilinear_at(jnp.asarray(imap), self.pix_target[0],
                            self.pix_target[1])


# ------------------------------------------------------------------
# maxlike covariance block (reference maps.py:1792-1870)
# ------------------------------------------------------------------

def diagonal_cov(power2d, geom: Geometry):
    """Dense pix-pix covariance of a diagonal (in Fourier) power — the
    block-circulant construction (reference ``orphics/maps.py:1792``)."""
    from .pixcov import ps2d_to_mat
    p = jnp.asarray(power2d)
    if p.ndim == 2:
        p = p[None, None]
    ncomp = p.shape[0]
    npx = geom.npix
    out = jnp.zeros((ncomp, ncomp, npx, npx))
    for i in range(ncomp):
        for j in range(ncomp):
            out = out.at[i, j].set(ps2d_to_mat(p[i, j], geom))
    return out


def ncov(geom: Geometry, noise_uk_arcmin):
    """White-noise pixel covariance (reference ``orphics/maps.py:1810``)."""
    var = (noise_uk_arcmin * arcmin) ** 2 / geom.pixsize
    return jnp.eye(geom.npix) * var


# ------------------------------------------------------------------
# healpix interop
# ------------------------------------------------------------------

def thumbnail_healpix(hp_map, ra_deg, dec_deg, width_arcmin=30.0,
                      px_res_arcmin=0.5):
    """Nearest-neighbour gnomonic-style thumbnail from a healpix RING map
    (reference ``thumbnail_healpix``/``cutout_gnomonic``,
    ``orphics/maps.py:614,2425``)."""
    from ..utils import healpix as hp
    hp_map = np.asarray(hp_map)
    nside = hp.npix2nside(hp_map.size)
    n = int(width_arcmin / px_res_arcmin)
    g = Geometry(n, n, px_res_arcmin * arcmin, px_res_arcmin * arcmin)
    pos = np.asarray(g.posmap(jnp.float64))
    dec0 = np.radians(dec_deg)
    ra0 = np.radians(ra_deg)
    dec = dec0 + pos[0]
    ra = ra0 + pos[1] / np.cos(dec0)
    pix = hp.ang2pix(nside, np.pi / 2 - dec.reshape(-1),
                     np.mod(ra.reshape(-1), 2 * np.pi))
    return hp_map[pix].reshape(n, n), g


def galactic_mask(geom: Geometry, nside, theta1, theta2):
    """Mask a colatitude strip (e.g. the galactic plane in galactic
    coords) projected onto a flat geometry (reference
    ``orphics/maps.py:1186``; identity rotation — coordinate rotation is
    the caller's concern)."""
    from ..utils import healpix as hp
    orig = np.ones(hp.nside2npix(nside))
    orig[hp.query_strip(nside, theta1, theta2)] = 0
    pos = np.asarray(geom.posmap(jnp.float64))
    theta = np.pi / 2 - pos[0].reshape(-1)
    phi = np.mod(pos[1].reshape(-1), 2 * np.pi)
    pix = hp.ang2pix(nside, theta, phi)
    return jnp.asarray(orig[pix].reshape(geom.shape))


def generate_correlated_alm(input_alm_f1, Clf1f1, Clf2f2, Clf1f2, key=None):
    """alm of a field correlated with an existing one per given spectra
    (reference ``orphics/maps.py:generate_correlated_alm``)."""
    from ..ops.alm import almxfl, synalm, getlmax
    Clf1f1 = np.asarray(Clf1f1)
    Clf1f2 = np.asarray(Clf1f2)
    Clf2f2 = np.asarray(Clf2f2)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.nan_to_num(Clf1f2 / Clf1f1)
    correlated = almxfl(jnp.asarray(input_alm_f1), jnp.asarray(ratio))
    ps_noise = Clf2f2 - np.nan_to_num(Clf1f2 ** 2 / Clf1f1)
    ps_noise[ps_noise < 0] = 0
    if key is None:
        key = jax.random.PRNGKey(0)
    lmax = getlmax(np.asarray(input_alm_f1).shape[-1])
    noise = synalm(key, jnp.asarray(ps_noise), lmax)
    return correlated + noise


def interpolate_grid(in_grid, in_y, in_x, out_y=None, out_x=None, kx=3,
                     ky=3, **kwargs):
    """Regular-grid spline interpolation (reference
    ``orphics/maps.py:interpolate_grid``; host-side scipy)."""
    from scipy.interpolate import RectBivariateSpline
    spl = RectBivariateSpline(np.asarray(in_y), np.asarray(in_x),
                              np.asarray(in_grid), kx=kx, ky=ky, **kwargs)
    if out_y is None and out_x is None:
        return spl
    return spl(np.asarray(out_y), np.asarray(out_x))


def ftrans(p2d, tfunc=jnp.log10):
    """fftshift + transform for visualizing 2D spectra (reference
    ``orphics/maps.py:ftrans``)."""
    return tfunc(jnp.fft.fftshift(jnp.asarray(p2d), axes=(-2, -1)))


def real_space_filter(kfilter):
    """Real-space kernel of a k-space filter (reference
    ``orphics/maps.py:real_space_filter``)."""
    k = jnp.asarray(kfilter).astype(jnp.complex64)
    return jnp.fft.ifftshift(jnp.fft.ifft2(k).real, axes=(-2, -1))


def rfilter(imap, kfilter=None, rfilt=None):
    """Filter by real-space convolution (periodic; reference
    ``orphics/maps.py:rfilter``)."""
    if rfilt is None:
        rfilt = real_space_filter(kfilter)
    kf = jnp.fft.fft2(jnp.fft.ifftshift(rfilt, axes=(-2, -1)))
    return jnp.fft.ifft2(jnp.fft.fft2(jnp.asarray(imap)) * kf).real
