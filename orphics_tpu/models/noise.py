"""Instrument noise models: white, atmospheric (red), inverse-variance.

Reference: ``orphics/maps.py`` — ``atm_factor`` (:1137), ``rednoise``
(:1142), ``modulated_noise_map`` (:1152), ``rms_from_ivar`` (:1204),
``psizemap`` (:1228), ``ivar`` (:1240), ``white_noise`` (:1246),
``get_masked_ivar`` (:80). All jittable, PRNG-key seeded, batched.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import Geometry, arcmin
from ..ops import fourier as F

__all__ = ["atm_factor", "rednoise", "ivar", "rms_from_ivar", "white_noise",
           "white_noise_with_atm_func",
           "modulated_noise_map", "get_masked_ivar", "noise_func",
           "get_atmosphere", "getAtmosphere"]


def atm_factor(ells, lknee, alpha):
    """(lknee/l)^(-alpha) atmospheric factor (reference ``maps.py:1137``)."""
    ells = jnp.asarray(ells, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    if lknee > 1e-3:
        inv = jnp.where(ells > 0, 1.0 / jnp.where(ells == 0, 1.0, ells), 0.0)
        return (lknee * inv) ** (-alpha)
    return jnp.zeros_like(ells)


def rednoise(ells, rms_noise, lknee=0.0, alpha=1.0):
    """[(lknee/l)^(-alpha) + 1] * (rms in rad)^2 (reference ``maps.py:1142``)."""
    rms = rms_noise * arcmin
    return (atm_factor(ells, lknee, alpha) + 1.0) * rms ** 2


def noise_func(ell, fwhm, rms_noise, lknee=0.0, alpha=0.0, dimensionless=False,
               TCMB=2.7255e6):
    """Beam-deconvolved noise power (reference ``orphics/cosmology.py:1143``)."""
    atm = atm_factor(ell, lknee, alpha)
    rms = rms_noise * arcmin
    white = rms ** 2
    out = (atm + 1.0) * white / F.gauss_beam(ell, fwhm) ** 2
    if dimensionless:
        out = out / TCMB ** 2
    return out


def get_atmosphere(beam_fwhm_arcmin):
    """(lknee_T, alpha_T, lknee_P, alpha_P) vs beam FWHM — the
    M. Hasselfield best-fit atmosphere model of reference
    ``orphics/cosmology.py:1173`` ``getAtmosphere``: parameters tabulated
    for 0.5/5/7-m apertures at 150 GHz, linearly interpolated (with
    extrapolation) in the diffraction beam size 1.22 lambda/D."""
    tt_alpha = -4.7
    tt_lknee = np.array([350.0, 3400.0, 4900.0])
    pp_lknee = np.array([60.0, 330.0, 460.0])
    pp_alpha = np.array([-2.6, -3.8, -3.9])
    size_m = np.array([0.5, 5.0, 7.0])
    wavelength = 299792458.0 / 150.0e9
    resin = 1.22 * wavelength / size_m * 60.0 * 180.0 / np.pi  # arcmin

    # resin is decreasing with size; sort ascending for interp
    order = np.argsort(resin)
    b = np.asarray(beam_fwhm_arcmin, dtype=float)
    def interp_extrap(ys):
        xs = resin[order]; yy = ys[order]
        out = np.interp(b, xs, yy)
        # linear extrapolation beyond the table
        out = np.where(b < xs[0], yy[0] + (b - xs[0]) * (yy[1] - yy[0]) / (xs[1] - xs[0]), out)
        out = np.where(b > xs[-1], yy[-1] + (b - xs[-1]) * (yy[-1] - yy[-2]) / (xs[-1] - xs[-2]), out)
        # scalar in -> scalar out; arrays pass through (the reference's
        # interp1d supported vectorized beam inputs)
        return float(out) if np.ndim(beam_fwhm_arcmin) == 0 else out
    tt_a = (tt_alpha if np.ndim(beam_fwhm_arcmin) == 0
            else np.full(np.shape(beam_fwhm_arcmin), tt_alpha))
    return (interp_extrap(tt_lknee), tt_a,
            interp_extrap(pp_lknee), interp_extrap(pp_alpha))


def getAtmosphere(beamFWHMArcmin=None, returnFunctions=False):
    """Reference-signature alias for :func:`get_atmosphere`
    (``orphics/cosmology.py:1173``): accepts the reference's kwarg
    spellings and, with ``returnFunctions=True``, returns the four
    callables ``(lknee_T(b), alpha_T(b), lknee_P(b), alpha_P(b))``
    instead of values at a specific beam."""
    if beamFWHMArcmin is None:
        assert returnFunctions, "need a beam FWHM or returnFunctions=True"
    if not returnFunctions:
        return get_atmosphere(beamFWHMArcmin)
    return (lambda b: get_atmosphere(b)[0],
            lambda b: get_atmosphere(b)[1],
            lambda b: get_atmosphere(b)[2],
            lambda b: get_atmosphere(b)[3])


def ivar(geom: Geometry, noise_muK_arcmin, ipsizemap=None):
    """Inverse-variance map for a white noise level (reference
    ``maps.py:1240``)."""
    if ipsizemap is None:
        ipsizemap = geom.pixsizemap()
    pmap = ipsizemap * (180.0 * 60.0 / np.pi) ** 2
    return pmap / noise_muK_arcmin ** 2


def rms_from_ivar(ivar_map, parea=None, geom: Geometry = None):
    """Per-pixel rms (uK-arcmin) from an ivar map (reference
    ``maps.py:1204``)."""
    ivar_map = jnp.asarray(ivar_map)
    if parea is None:
        parea = geom.pixsizemap()
    var = jnp.where(ivar_map > 0, 1.0 / jnp.where(ivar_map <= 0, 1.0, ivar_map), 0.0)
    return jnp.sqrt(var * parea) * 180.0 * 60.0 / np.pi


def white_noise(key, geom: Geometry = None, noise_muK_arcmin=None, div=None,
                shape=None, dtype=jnp.float32):
    """Non-band-limited white noise map (reference ``maps.py:1246``)."""
    if div is None:
        div = ivar(geom, noise_muK_arcmin)
    shape = shape if shape is not None else jnp.shape(div)
    return jax.random.normal(key, shape, dtype) / jnp.sqrt(div).astype(dtype)


def modulated_noise_map(key, ivar_map, geom: Geometry, lknee=None, alpha=None,
                        lmax=None, n_ell_standard=None, lmin=None,
                        dtype=jnp.float32):
    """Noise map with spatial modulation from ivar and an l-shape from a
    whitened N_ell (reference ``maps.py:1152``), flat-sky version: a GRF
    with spectrum N_ell_standard (asymptoting to 1) times the per-pixel rms.
    """
    if n_ell_standard is None and lknee is not None:
        ells = np.arange((lmax or int(geom.lmax())) + 1)
        nl = np.nan_to_num(np.asarray(atm_factor(ells, lknee, alpha))) + 1.0
        if lmin is not None:
            nl[ells < lmin] = 0
        n_ell_standard = nl
    if n_ell_standard is None:
        return jax.random.normal(key, geom.shape, dtype) / jnp.sqrt(ivar_map)
    from .grf import MapGen
    mgen = MapGen(geom, np.asarray(n_ell_standard)[None, None], dtype=dtype)
    smap = mgen.get_map(key)
    rms = rms_from_ivar(ivar_map, geom=geom)
    return rms * smap * np.pi / 180.0 / 60.0


def get_masked_ivar(ivar_map, geom: Geometry, grow_arcmin=10.0, threshold=1e-10):
    """Zero ivar within grow_arcmin of empty regions (reference
    ``maps.py:80``)."""
    from ..ops.distance import grow_mask
    mask = (jnp.asarray(ivar_map) > threshold).astype(jnp.float32)
    g = grow_mask(mask, geom, grow_arcmin * arcmin)
    return jnp.where(g > 0, ivar_map, 0.0)


def white_noise_with_atm_func(ells, uk_arcmin, lknee, alpha,
                              dimensionless=False, TCMB=2.7255e6):
    """White noise power with a 1/f atmosphere factor (reference
    ``orphics/cosmology.py:1164``)."""
    ells = jnp.asarray(ells)
    noise_white = (uk_arcmin * np.pi / (180.0 * 60.0)) ** 2
    dfact = (1.0 / TCMB ** 2) if dimensionless else 1.0
    return (atm_factor(ells, lknee, alpha) + 1.0) * noise_white * dfact
