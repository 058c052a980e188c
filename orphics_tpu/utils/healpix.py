"""HEALPix RING pixelization without healpy.

Loads the native C++ implementation (``orphics_tpu/csrc/healpix.cpp``,
built to ``liborphics_healpix.so`` via the repo Makefile) through ctypes;
falls back to an equivalent vectorized numpy implementation when the
shared library is absent. Both paths are cross-tested against each other.

Covers the healpy surface the reference uses for catalogs/masks:
``ang2pix``, ``pix2ang``, ``nside2npix``, ``npix2nside``,
``nside2pixarea``, ``query_strip``.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["nside2npix", "npix2nside", "nside2pixarea", "ang2pix",
           "pix2ang", "query_strip", "have_native"]

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(__file__))
    for cand in (os.path.join(here, "csrc", "liborphics_healpix.so"),
                 os.path.join(here, "liborphics_healpix.so")):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.ang2pix_ring.argtypes = [
                ctypes.c_long, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_long]
            lib.pix2ang_ring.argtypes = [
                ctypes.c_long, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_long]
            _LIB = lib
            return lib
    _LIB = False
    return False


def have_native() -> bool:
    return bool(_load())


def nside2npix(nside: int) -> int:
    return 12 * nside * nside


def npix2nside(npix: int) -> int:
    nside = int(np.sqrt(npix / 12))
    if nside2npix(nside) != npix:
        raise ValueError("invalid npix")
    return nside


def nside2pixarea(nside: int) -> float:
    return 4 * np.pi / nside2npix(nside)


def _ang2pix_np(nside, theta, phi):
    """Vectorized RING ang2pix (HEALPix primer algorithm)."""
    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi / (0.5 * np.pi), 4.0)
    npix = nside2npix(nside)
    pix = np.empty(z.shape, dtype=np.int64)

    eq = za <= 2.0 / 3.0
    # equatorial belt
    temp1 = nside * (0.5 + tt[eq])
    temp2 = nside * z[eq] * 0.75
    jp = np.floor(temp1 - temp2).astype(np.int64)
    jm = np.floor(temp1 + temp2).astype(np.int64)
    ir = nside + 1 + jp - jm
    kshift = 1 - (ir & 1)
    nl4 = 4 * nside
    ip = np.floor((jp + jm - nside + kshift + 1) / 2.0).astype(np.int64) % nl4
    pix[eq] = 2 * nside * (nside - 1) + (ir - 1) * nl4 + ip
    # polar caps
    po = ~eq
    tp = tt[po] - np.floor(tt[po])
    tmp = nside * np.sqrt(3.0 * (1.0 - za[po]))
    jp = np.floor(tp * tmp).astype(np.int64)
    jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
    ir = jp + jm + 1
    ipp = np.floor(tt[po] * ir).astype(np.int64) % (4 * ir)
    north = z[po] > 0
    pp = np.where(north, 2 * ir * (ir - 1) + ipp,
                  npix - 2 * ir * (ir + 1) + ipp)
    pix[po] = pp
    return pix


def _pix2ang_np(nside, pix):
    pix = np.asarray(pix, dtype=np.int64)
    npix = nside2npix(nside)
    ncap = 2 * nside * (nside - 1)
    z = np.empty(pix.shape)
    phi = np.empty(pix.shape)

    north = pix < ncap
    p = pix[north]
    iring = ((1 + np.sqrt(1.0 + 2.0 * p)) * 0.5).astype(np.int64)
    iring = np.where(2 * iring * (iring - 1) > p, iring - 1, iring)
    iring = np.where(2 * iring * (iring + 1) <= p, iring + 1, iring)
    iphi = p - 2 * iring * (iring - 1) + 1
    z[north] = 1.0 - iring.astype(float) ** 2 / (3.0 * nside ** 2)
    phi[north] = (iphi - 0.5) * np.pi / (2.0 * iring)

    eq = (pix >= ncap) & (pix < npix - ncap)
    ip = pix[eq] - ncap
    nl4 = 4 * nside
    iring = ip // nl4 + nside
    iphi = ip % nl4 + 1
    fodd = np.where((iring + nside) & 1, 1.0, 0.5)
    z[eq] = (2.0 * nside - iring) * 2.0 / (3.0 * nside)
    phi[eq] = (iphi - fodd) * np.pi / (2.0 * nside)

    south = pix >= npix - ncap
    ip = npix - pix[south]
    iring = ((1 + np.sqrt(2.0 * ip - 1.0)) * 0.5).astype(np.int64)
    iring = np.where(2 * iring * (iring - 1) >= ip, iring - 1, iring)
    iring = np.where(2 * iring * (iring + 1) < ip, iring + 1, iring)
    iphi = 4 * iring + 1 - (ip - 2 * iring * (iring - 1))
    z[south] = -1.0 + iring.astype(float) ** 2 / (3.0 * nside ** 2)
    phi[south] = (iphi - 0.5) * np.pi / (2.0 * iring)
    return np.arccos(np.clip(z, -1, 1)), np.mod(phi, 2 * np.pi)


def ang2pix(nside, theta, phi, lonlat: bool = False):
    """healpy-compatible RING ang2pix."""
    theta = np.ascontiguousarray(np.atleast_1d(theta), dtype=np.float64)
    phi = np.ascontiguousarray(np.atleast_1d(phi), dtype=np.float64)
    if lonlat:
        lon, lat = theta, phi
        theta = np.radians(90.0 - lat)
        phi = np.radians(lon)
        theta = np.ascontiguousarray(theta)
        phi = np.ascontiguousarray(phi)
    lib = _load()
    if lib:
        out = np.empty(theta.shape, dtype=np.int64)
        lib.ang2pix_ring(
            int(nside),
            theta.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            phi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            theta.size)
        return out
    return _ang2pix_np(int(nside), theta, phi)


def pix2ang(nside, pix, lonlat: bool = False):
    """healpy-compatible RING pix2ang (pixel centers)."""
    pix = np.ascontiguousarray(np.atleast_1d(pix), dtype=np.int64)
    lib = _load()
    if lib:
        theta = np.empty(pix.shape, dtype=np.float64)
        phi = np.empty(pix.shape, dtype=np.float64)
        lib.pix2ang_ring(
            int(nside),
            pix.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            theta.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            phi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), pix.size)
    else:
        theta, phi = _pix2ang_np(int(nside), pix)
    if lonlat:
        return np.degrees(phi), 90.0 - np.degrees(theta)
    return theta, phi


def query_strip(nside, theta1, theta2):
    """Pixels whose centers fall in the colatitude strip [theta1, theta2]
    (healpy ``query_strip``, used by reference ``galactic_mask``,
    ``orphics/maps.py:1186``)."""
    pix = np.arange(nside2npix(nside), dtype=np.int64)
    theta, _ = pix2ang(nside, pix)
    return pix[(theta >= theta1) & (theta <= theta2)]
