"""Time conversions for site-local observation bookkeeping.

Facade for reference ``orphics.time`` (``time.py:8,49``): ctime <-> human
time with site-local timezones. The ephemeris plot annotations of the
reference depend on pixell.ephem and are out of scope; the conversion core
is here.
"""
from __future__ import annotations

import datetime as _dt

import numpy as np

__all__ = ["htime", "ctime", "hours_utc_offset"]

# site longitudes (deg) for solar-time offsets (ACT/ALMA site default)
SITE_LONGITUDES = {"act": -67.7876, "so": -67.7876, "chile": -67.7876,
                   "spt": 0.0}


def hours_utc_offset(site="act"):
    """Approximate solar-time offset in hours from the site longitude."""
    return SITE_LONGITUDES.get(site, 0.0) / 15.0


def htime(ctimes, site="act"):
    """Unix ctime(s) -> site-local civil datetime(s) (reference
    ``time.py:8``)."""
    off = _dt.timedelta(hours=hours_utc_offset(site))
    scalar = np.isscalar(ctimes)
    cts = np.atleast_1d(np.asarray(ctimes, dtype=float))
    out = [(_dt.datetime.fromtimestamp(c, _dt.timezone.utc) + off)
           for c in cts]
    return out[0] if scalar else out


def ctime(year, month, day, hour=0, minute=0, second=0, site="act"):
    """Site-local civil time -> unix ctime (reference ``time.py:49``)."""
    off = _dt.timedelta(hours=hours_utc_offset(site))
    t = _dt.datetime(year, month, day, hour, minute, second,
                     tzinfo=_dt.timezone.utc) - off
    return t.timestamp()


def get_columns(obs, keys):
    """Extract keys from row dicts into numpy-array columns (reference
    ``time.py:102``)."""
    rows = [tuple(ob[k] for k in keys) for ob in obs]
    columns = list(zip(*rows)) if rows else [[] for _ in keys]
    return {key: np.array(col) for key, col in zip(keys, columns)}


# Sidereal orbital periods in seconds (reference ``time.py:127``)
BODY_PERIOD = {
    "Moon": 27.321661 * 86400.0,
    "Sun": 365.256 * 86400.0,
    "Mercury": 87.969 * 86400.0,
    "Venus": 224.701 * 86400.0,
    "Mars": 686.980 * 86400.0,
    "Jupiter": 4332.589 * 86400.0,
    "Saturn": 10759.22 * 86400.0,
    "Uranus": 30685.4 * 86400.0,
    "Neptune": 60189.0 * 86400.0,
}

BODY_STYLE = {
    "Sun": dict(radius_pix=40, width_pix=4, color="orange"),
    "Moon": dict(radius_pix=20, width_pix=3, color="black"),
    "Mercury": dict(radius_pix=10, width_pix=2, color="gray"),
    "Venus": dict(radius_pix=10, width_pix=2, color="blue"),
    "Mars": dict(radius_pix=10, width_pix=2, color="red"),
    "Jupiter": dict(radius_pix=10, width_pix=2, color="brown"),
    "Saturn": dict(radius_pix=10, width_pix=2, color="purple"),
    "Uranus": dict(radius_pix=10, width_pix=2, color="cyan"),
    "Neptune": dict(radius_pix=10, width_pix=2, color="green"),
}


def body_circle_annotations(ctime1, ctime2, bodies=None,
                            points_per_orbit=20, min_points=3,
                            max_points=200, default_radius=12,
                            default_width=2, default_color="white",
                            text_size=18):
    """Plot-annotation circles marking solar-system body tracks between
    two ctimes (reference ``time.py:154``), using the native analytic
    ephemeris in :mod:`orphics_tpu.ephem` instead of pixell.ephem.

    Returns an enplot-style annotate list of ["circle", dec, ra, ...]
    rows (degrees)."""
    from . import ephem
    if bodies is None:
        bodies = list(BODY_PERIOD.keys())
    dt = float(ctime2 - ctime1)
    annotations = []
    for body in bodies:
        period = BODY_PERIOD.get(body)
        if period is None:
            continue
        if dt <= 0:
            ctimes = np.array([float(ctime1)])
        else:
            n = int(np.ceil(dt / period * points_per_orbit))
            n = max(min_points, min(max_points, n))
            ctimes = np.linspace(ctime1, ctime2, n)
        radec, _ = ephem.eval_body(body, ctimes)
        ra_deg = np.degrees(radec[:, 0])
        dec_deg = np.degrees(radec[:, 1])
        style = BODY_STYLE.get(body, {})
        radius_pix = style.get("radius_pix", default_radius)
        width_pix = style.get("width_pix", default_width)
        color = style.get("color", default_color)
        for ra, dec in zip(ra_deg, dec_deg):
            annotations.append(["circle", float(dec), float(ra), 0, 0,
                                radius_pix, width_pix, color])
        annotations.append(["text", float(dec_deg[-1]), float(ra_deg[-1]),
                            0, 0, body, text_size, color])
    return annotations


__all__ += ["get_columns", "body_circle_annotations", "BODY_PERIOD",
            "BODY_STYLE"]
