"""numpy ``pixell.enmap`` subset — see package docstring for scope."""
import numpy as np

_degree = np.pi / 180.0


class _WCSCore:
    def __init__(self, cdelt, crval, crpix):
        self.cdelt = np.asarray(cdelt, dtype=float)   # degrees, (ra, dec)
        self.crval = np.asarray(crval, dtype=float)
        self.crpix = np.asarray(crpix, dtype=float)


class WCS:
    """Tiny CAR-only WCS: exposes ``.wcs.cdelt`` (degrees) the way the
    reference reads it (``orphics/maps.py:1234,2182``)."""

    def __init__(self, cdelt, crval=(0.0, 0.0), crpix=(0.0, 0.0)):
        self.wcs = _WCSCore(cdelt, crval, crpix)

    def copy(self):
        return WCS(self.wcs.cdelt.copy(), self.wcs.crval.copy(),
                   self.wcs.crpix.copy())

    def __repr__(self):
        return f"ShimWCS(cdelt={self.wcs.cdelt}, crval={self.wcs.crval})"


class ndmap(np.ndarray):
    def __new__(cls, arr, wcs):
        obj = np.asarray(arr).view(cls)
        obj.wcs = wcs
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self.wcs = getattr(obj, "wcs", None)

    # the handful of methods reference code calls on map objects
    def modlmap(self):
        return modlmap(self.shape, self.wcs)

    def posmap(self):
        return posmap(self.shape, self.wcs)

    def lmap(self):
        return lmap(self.shape, self.wcs)

    def extent(self):
        return extent(self.shape, self.wcs)

    def pixsize(self):
        return pixsize(self.shape, self.wcs)

    def area(self):
        return area(self.shape, self.wcs)

    def copy(self, order="C"):
        return ndmap(np.asarray(self).copy(order), self.wcs)


def enmap(arr, wcs=None, copy=True):
    if copy:
        arr = np.array(arr)
    return ndmap(arr, wcs)


def samewcs(arr, *refs):
    for r in refs:
        w = getattr(r, "wcs", None)
        if w is not None:
            return ndmap(np.asarray(arr), w)
    return ndmap(np.asarray(arr), None)


def zeros(shape, wcs=None, dtype=np.float64):
    return ndmap(np.zeros(shape, dtype=dtype), wcs)


def ones(shape, wcs=None, dtype=np.float64):
    return ndmap(np.ones(shape, dtype=dtype), wcs)


def empty(shape, wcs=None, dtype=np.float64):
    return ndmap(np.empty(shape, dtype=dtype), wcs)


# ---------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------

def geometry(pos, res=None, proj="car", **kw):
    """CAR geometry from a [[dec0,ra0],[dec1,ra1]] bounding box (radians)
    and a pixel size ``res`` (radians). Pixel centers sit at
    edge + (i+0.5)*res, i.e. symmetric about the box center."""
    pos = np.asarray(pos, dtype=float)
    ny = int(round(abs(pos[1, 0] - pos[0, 0]) / res))
    nx = int(round(abs(pos[1, 1] - pos[0, 1]) / res))
    cd = res / _degree
    crval = ((pos[0, 1] + pos[1, 1]) / 2 / _degree,
             (pos[0, 0] + pos[1, 0]) / 2 / _degree)  # (ra, dec) degrees
    return (ny, nx), WCS(cdelt=(-cd, cd), crval=crval)


def _pixshape_rad(wcs):
    dra, ddec = wcs.wcs.cdelt * _degree
    return abs(ddec), abs(dra)          # (dy, dx)


def pixshape(shape, wcs):
    return np.array(_pixshape_rad(wcs))


def pixsize(shape, wcs):
    dy, dx = _pixshape_rad(wcs)
    return dy * dx


def area(shape, wcs):
    dy, dx = _pixshape_rad(wcs)
    return shape[-2] * shape[-1] * dy * dx


def extent(shape, wcs):
    dy, dx = _pixshape_rad(wcs)
    return np.array([shape[-2] * dy, shape[-1] * dx])


def laxes(shape, wcs, oversample=1, **kw):
    dy, dx = _pixshape_rad(wcs)
    ly = 2 * np.pi * np.fft.fftfreq(shape[-2], d=dy)
    lx = 2 * np.pi * np.fft.fftfreq(shape[-1], d=dx)
    return ly, lx


def lmap(shape, wcs):
    ly, lx = laxes(shape, wcs)
    lyy = np.broadcast_to(ly[:, None], (shape[-2], shape[-1]))
    lxx = np.broadcast_to(lx[None, :], (shape[-2], shape[-1]))
    return ndmap(np.stack([lyy, lxx]), wcs)


def modlmap(shape, wcs):
    ly, lx = laxes(shape, wcs)
    return ndmap(np.hypot(ly[:, None], lx[None, :]), wcs)


def _axes_rad(shape, wcs):
    dy, dx = _pixshape_rad(wcs)
    ny, nx = shape[-2], shape[-1]
    dec0 = wcs.wcs.crval[1] * _degree
    y = (np.arange(ny) - (ny - 1) / 2.0) * dy + dec0
    x = (np.arange(nx) - (nx - 1) / 2.0) * dx
    return y, x


def posmap(shape, wcs):
    y, x = _axes_rad(shape, wcs)
    ny, nx = shape[-2], shape[-1]
    yy = np.broadcast_to(y[:, None], (ny, nx))
    xx = np.broadcast_to(x[None, :], (ny, nx))
    return ndmap(np.stack([yy, xx]), wcs)


def modrmap(shape, wcs):
    y, x = _axes_rad(shape, wcs)
    dec0 = wcs.wcs.crval[1] * _degree
    return ndmap(np.hypot((y - dec0)[:, None], x[None, :]), wcs)


def pixsizemap(shape, wcs):
    y, _ = _axes_rad(shape, wcs)
    dy, dx = _pixshape_rad(wcs)
    ps = dy * dx * np.cos(y)
    return ndmap(np.broadcast_to(ps[:, None], (shape[-2], shape[-1])).copy(),
                 wcs)


def pixmap(shape, wcs):
    ny, nx = shape[-2], shape[-1]
    iy = np.broadcast_to(np.arange(ny, dtype=float)[:, None], (ny, nx))
    ix = np.broadcast_to(np.arange(nx, dtype=float)[None, :], (ny, nx))
    return ndmap(np.stack([iy, ix]), wcs)


def sky2pix(shape, wcs, coords, safe=True, corner=False):
    coords = np.asarray(coords)
    dy, dx = _pixshape_rad(wcs)
    dec0 = wcs.wcs.crval[1] * _degree
    py = (coords[0] - dec0) / dy + (shape[-2] - 1) / 2.0
    px = coords[1] / dx + (shape[-1] - 1) / 2.0
    return np.stack([py, px])


def pix2sky(shape, wcs, pix):
    pix = np.asarray(pix)
    dy, dx = _pixshape_rad(wcs)
    dec0 = wcs.wcs.crval[1] * _degree
    y = (pix[0] - (shape[-2] - 1) / 2.0) * dy + dec0
    x = (pix[1] - (shape[-1] - 1) / 2.0) * dx
    return np.stack([y, x])


def scale_geometry(shape, wcs, scale):
    ny = int(shape[-2] * scale)
    nx = int(shape[-1] * scale)
    w = wcs.copy()
    w.wcs.cdelt = w.wcs.cdelt / scale
    return shape[:-2] + (ny, nx), w


# ---------------------------------------------------------------------
# FFTs (unitary in enmap convention)
# ---------------------------------------------------------------------

def fft(emap, omap=None, nthread=0, normalize=True, **kw):
    res = np.fft.fft2(np.asarray(emap), axes=(-2, -1))
    npix = np.prod(emap.shape[-2:])
    if normalize is True:
        res = res / npix ** 0.5
    elif normalize in ("phy", "phys", "physical"):
        res = res / npix ** 0.5 * pixsize(emap.shape, emap.wcs) ** 0.5
    return samewcs(res, emap)


def ifft(kmap, omap=None, nthread=0, normalize=True, **kw):
    res = np.fft.ifft2(np.asarray(kmap), axes=(-2, -1))
    npix = np.prod(kmap.shape[-2:])
    if normalize is True:
        res = res * npix ** 0.5
    elif normalize in ("phy", "phys", "physical"):
        res = res * npix ** 0.5 / pixsize(kmap.shape, kmap.wcs) ** 0.5
    else:
        res = res * npix
    return samewcs(res, kmap)


def grad(emap):
    """(2, ny, nx) [d/dy, d/dx] via Fourier derivatives (the pixell
    flat-sky gradient)."""
    k = fft(emap)
    ly, lx = laxes(emap.shape, emap.wcs)
    gy = ifft(samewcs(1j * ly[:, None] * np.asarray(k), emap)).real
    gx = ifft(samewcs(1j * lx[None, :] * np.asarray(k), emap)).real
    return ndmap(np.stack([np.asarray(gy), np.asarray(gx)]), emap.wcs)


def rand_gauss(shape, wcs):
    return ndmap(np.random.standard_normal(shape), wcs)


def rand_gauss_harm(shape, wcs):
    """Complex standard normal per mode: E|a|^2 = 2, so that
    ``ifft(covsqrt * a).real`` has the target power (the .real halves
    the complex variance) — pixell's documented behavior."""
    return ndmap(np.random.standard_normal(shape)
                 + 1j * np.random.standard_normal(shape), wcs)


def queb_rotmat(lmap_, inverse=False, iau=False, spin=2):
    a = spin * np.arctan2(-np.asarray(lmap_)[1], np.asarray(lmap_)[0])
    if iau:
        a = -a
    c, s = np.cos(a), np.sin(a)
    if inverse:
        s = -s
    return samewcs(np.array([[c, -s], [s, c]]), lmap_)


def map_mul(mat, vec):
    mat = np.asanyarray(mat)
    if mat.ndim <= 3:
        return mat * vec
    v = np.asarray(vec)
    squeeze = v.ndim == 2          # pixell reshapes a flat map to (1,ny,nx)
    if squeeze:
        v = v[None]
    out = np.einsum("...abyx,...byx->...ayx", mat, v)
    if squeeze:
        out = out.reshape(np.asarray(vec).shape)
    return samewcs(out, mat, vec)


def harm2map(kmap, iau=False, spin=2, keep_imag=False):
    kmap = np.asanyarray(kmap)
    if kmap.ndim > 2 and kmap.shape[-3] >= 3:
        rot = queb_rotmat(lmap(kmap.shape[-2:], kmap.wcs), inverse=True,
                          iau=iau, spin=spin)
        out = np.array(kmap)
        out[..., -2:, :, :] = map_mul(rot, kmap[..., -2:, :, :])
        kmap = samewcs(out, kmap)
    res = ifft(kmap)
    return res if keep_imag else samewcs(np.real(res), kmap)


def map2harm(emap, iau=False, spin=2, normalize=True):
    kmap = fft(emap, normalize=normalize)
    if kmap.ndim > 2 and kmap.shape[-3] >= 3:
        rot = queb_rotmat(lmap(kmap.shape[-2:], emap.wcs), iau=iau, spin=spin)
        out = np.array(kmap)
        out[..., -2:, :, :] = map_mul(rot, kmap[..., -2:, :, :])
        kmap = samewcs(out, emap)
    return kmap


# ---------------------------------------------------------------------
# spectra <-> 2D grids
# ---------------------------------------------------------------------

def multi_pow(mat, exp, axes=(0, 1), lim=1e-14):
    """Matrix power over the leading (ncomp, ncomp) axes via eigh;
    plain elementwise power for 2D input."""
    mat = np.asanyarray(mat)
    if mat.ndim == 2 or (mat.ndim > 2 and mat.shape[0] != mat.shape[1]):
        return samewcs(np.power(np.maximum(np.asarray(mat, float), 0.0),
                                exp), mat)
    n = mat.shape[0]
    rest = mat.shape[2:]
    flat = np.asarray(mat, float).reshape(n, n, -1).transpose(2, 0, 1)
    w, v = np.linalg.eigh(flat)
    wmax = np.max(np.abs(w), axis=-1, keepdims=True)
    good = w > wmax * lim
    wp = np.where(good, np.abs(w) ** exp * np.sign(w) ** 0, 0.0)
    out = np.einsum("kab,kb,kcb->kac", v, wp, v)
    return samewcs(out.transpose(1, 2, 0).reshape((n, n) + rest), mat)


def spec2flat(shape, wcs, cov, exp=1.0, mode="constant", smooth=None,
              border=None, oversample=1):
    """(C(|l|) * npix / area)**exp on the 2D l-grid. cov is
    (ncomp, ncomp, nl) sampled at integer l. Outside the table the
    spectrum is zero (mode='constant'). No smoothing."""
    cov = np.asarray(cov, dtype=float)
    oshape = tuple(shape)
    if len(oshape) == 2:
        oshape = (1,) + oshape
    ncomp = oshape[-3]
    cov = cov[:ncomp, :ncomp]
    if exp != 1.0:
        cov = np.asarray(multi_pow(cov, exp))
    cov[~np.isfinite(cov)] = 0
    ml = np.asarray(modlmap(shape, wcs))
    ls = np.arange(cov.shape[-1], dtype=float)
    norm = (np.prod(shape[-2:]) / area(shape, wcs)) ** exp
    out = np.empty((ncomp, ncomp) + ml.shape)
    for i in range(ncomp):
        for j in range(ncomp):
            out[i, j] = np.interp(ml, ls, cov[i, j], left=0.0, right=0.0)
    return ndmap(out * norm, wcs)


def downgrade(arr, factor, op=np.mean):
    factor = np.zeros(2, dtype=int) + np.asarray(factor, dtype=int)
    a = np.asarray(arr)
    ny = a.shape[-2] // factor[0] * factor[0]
    nx = a.shape[-1] // factor[1] * factor[1]
    a = a[..., :ny, :nx]
    a = a.reshape(a.shape[:-2] + (ny // factor[0], factor[0],
                                  nx // factor[1], factor[1]))
    return samewcs(op(op(a, axis=-1), axis=-2), arr)


def upgrade(arr, factor):
    a = np.asarray(arr)
    out = np.repeat(np.repeat(a, factor, axis=-2), factor, axis=-1)
    return samewcs(out, arr)


def read_map(path, **kw):
    raise NotImplementedError("shim pixell: no FITS map IO")


def write_map(path, emap, **kw):
    raise NotImplementedError("shim pixell: no FITS map IO")
