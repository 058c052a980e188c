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
