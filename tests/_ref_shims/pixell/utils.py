"""numpy ``pixell.utils`` subset for the parity shim."""
import numpy as np

degree = np.pi / 180.0
arcmin = degree / 60.0
arcsec = arcmin / 60.0
fwhm = 1.0 / (8 * np.log(2)) ** 0.5
T_cmb = 2.7255e6


def eigpow(A, e, axes=(-2, -1), lim=1e-14):
    A = np.asarray(A, dtype=float)
    moved = np.moveaxis(np.moveaxis(A, axes[0], -2), axes[1], -1)
    w, v = np.linalg.eigh(moved)
    wmax = np.max(np.abs(w), axis=-1, keepdims=True)
    wp = np.where(np.abs(w) > wmax * lim, np.abs(w) ** e, 0.0)
    out = np.einsum("...ab,...b,...cb->...ac", v, wp, v)
    return np.moveaxis(np.moveaxis(out, -1, axes[1]), -2, axes[0])


def sbox2slice(sbox):
    return tuple(slice(int(b[0]), int(b[1]), int(b[2]) if len(b) > 2 else None)
                 for b in np.asarray(sbox))


def nint(x):
    return np.round(x).astype(int)


def rect2width_height(*a, **kw):
    raise NotImplementedError("shim pixell.utils")


def allgather(a, comm):
    return np.asarray(a)[None]
