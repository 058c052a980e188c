"""Shim ``pixell.lensing``: displace_map with pixell's call semantics
— ``grad_phi`` is the deflection FIELD in sky coordinates (2, ny, nx);
the output pixel at sky position p reads the input at p + grad_phi —
interpolated by scipy's independent cubic B-spline (cyclic borders).

Caveat (documented in PARITY.md): real pixell applies a geodesic
rotation to the displacement and its compiled bicubic spline differs
from scipy's in the outermost boundary pixels; on the few-degree flat
patches the parity tests use, both effects are below the asserted
tolerances away from the border."""
import numpy as np

from . import enmap as _enmap


def displace_map(imap, grad_phi, order=3, geodesic=True):
    from scipy.ndimage import map_coordinates
    imap_arr = np.asarray(imap, dtype=float)
    shape = imap_arr.shape[-2:]
    wcs = getattr(imap, "wcs", None)
    pos = np.asarray(_enmap.posmap(shape, wcs)) + np.asarray(grad_phi,
                                                             dtype=float)
    pix = np.asarray(_enmap.sky2pix(shape, wcs, pos, safe=False))

    def _one(m):
        return map_coordinates(m, pix, order=order, mode="grid-wrap")

    if imap_arr.ndim == 2:
        out = _one(imap_arr)
    else:
        flat = imap_arr.reshape((-1,) + shape)
        out = np.stack([_one(m) for m in flat]).reshape(imap_arr.shape)
    return _enmap.samewcs(out, imap)


def displace_map_abs_pix(imap, pix, order=3):
    """Interpolate at ABSOLUTE fractional pixel positions (the scipy
    primitive the displacement parity test drives directly)."""
    from scipy.ndimage import map_coordinates
    out = map_coordinates(np.asarray(imap, dtype=float),
                          np.asarray(pix, dtype=float),
                          order=order, mode="grid-wrap")
    return _enmap.samewcs(out, imap)
