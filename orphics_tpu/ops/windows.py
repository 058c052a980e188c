"""Apodization windows and tapers (reference ``orphics/maps.py:1873-1920``).

Pure functions of static shapes — computed in numpy at setup, returned as
device arrays (they are jit constants in pipelines).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["cosine_window", "get_taper", "get_taper_deg",
           "sigma_from_fwhm", "fwhm_from_sigma"]


def cosine_window(ny, nx, len_apod_y=30, len_apod_x=30, pad_y=0, pad_x=0):
    """Separable cosine-squared edge taper (reference ``maps.py:1891``,
    after a routine by Thibaut Louis)."""
    win = np.ones((ny, nx))
    ii = np.arange(nx)[None, :] * np.ones((ny, 1))
    jj = np.arange(ny)[:, None] * np.ones((1, nx))
    if len_apod_x > 0:
        r = ii - pad_x
        sel = ii <= (len_apod_x + pad_x)
        win[sel] = 0.5 * (1 - np.cos(-np.pi * r[sel] / len_apod_x))
        r = (nx - 1) - ii - pad_x
        sel = ii >= ((nx - 1) - len_apod_x - pad_x)
        win[sel] = 0.5 * (1 - np.cos(-np.pi * r[sel] / len_apod_x))
    if len_apod_y > 0:
        r = jj - pad_y
        sel = jj <= (len_apod_y + pad_y)
        win[sel] *= 0.5 * (1 - np.cos(-np.pi * r[sel] / len_apod_y))
        r = (ny - 1) - jj - pad_y
        sel = jj >= ((ny - 1) - len_apod_y - pad_y)
        win[sel] *= 0.5 * (1 - np.cos(-np.pi * r[sel] / len_apod_y))
    if pad_y:
        win[:pad_y, :] = 0
        win[ny - pad_y:, :] = 0
    if pad_x:
        win[:, :pad_x] = 0
        win[:, nx - pad_x:] = 0
    return jnp.asarray(win, dtype=jnp.float32)


def get_taper(geom, taper_percent=12.0, pad_percent=3.0, weight=None):
    """Percent-of-patch cosine taper; returns (taper, w2)
    (reference ``maps.py:1873``)."""
    ny, nx = geom.shape
    n = int(min(ny, nx))
    taper = cosine_window(ny, nx,
                          len_apod_y=int(taper_percent * n / 100.0),
                          len_apod_x=int(taper_percent * n / 100.0),
                          pad_y=int(pad_percent * n / 100.0),
                          pad_x=int(pad_percent * n / 100.0))
    if weight is not None:
        taper = taper * jnp.asarray(weight)
    w2 = float(jnp.mean(taper ** 2))
    return taper, w2


def get_taper_deg(geom, taper_width_degrees=1.0, pad_width_degrees=0.0,
                  weight=None, only_y=False):
    """Degree-width cosine taper (reference ``maps.py:1880``)."""
    ny, nx = geom.shape
    res = min(abs(geom.dy), abs(geom.dx))
    pix_apod = int(taper_width_degrees * np.pi / 180.0 / res)
    pix_pad = int(pad_width_degrees * np.pi / 180.0 / res)
    taper = cosine_window(ny, nx, len_apod_y=pix_apod,
                          len_apod_x=0 if only_y else pix_apod,
                          pad_y=pix_pad, pad_x=0 if only_y else pix_pad)
    if weight is not None:
        taper = taper * jnp.asarray(weight)
    w2 = float(jnp.mean(taper ** 2))
    return taper, w2


def sigma_from_fwhm(fwhm):
    return fwhm / (2.0 * np.sqrt(2.0 * np.log(2.0)))


def fwhm_from_sigma(sigma):
    return sigma * 2.0 * np.sqrt(2.0 * np.log(2.0))
