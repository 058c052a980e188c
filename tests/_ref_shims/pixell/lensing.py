"""Shim ``pixell.lensing``: displace_map via scipy's independent cubic
B-spline interpolation (cyclic borders), matching pixell's
``utils.interpol(imap, pix, order=...)`` semantics — ``pix`` are the
ABSOLUTE (2, ny, nx) fractional pixel positions each output pixel reads
from."""
import numpy as np
from . import enmap as _enmap


def displace_map(imap, pix, order=3, geodesic=True):
    from scipy.ndimage import map_coordinates
    out = map_coordinates(np.asarray(imap, dtype=float),
                          np.asarray(pix, dtype=float),
                          order=order, mode="grid-wrap")
    return _enmap.samewcs(out, imap)
