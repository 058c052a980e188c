"""Reference-in-the-loop parity for ``orphics.time``.

The live reference imports ``timezonefinder`` and ``pixell.
{coordinates,ephem}``; both run here on the shims in
``tests/_ref_shims`` (the timezonefinder shim carries the TRUE IANA
zones at the test coordinates; the toy ephemeris is injected into BOTH
sides so the annotation-structure assertions cover the construction
logic, not the solver — the native solver itself is validated against
JPL values in ``tests/test_surveys.py``).
"""
import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "_ref_shims")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "orphics")),
    reason="upstream reference not mounted")

for p in (SHIM, REF_ROOT):
    if p not in sys.path:
        sys.path.insert(0, p)

rtime = pytest.importorskip("orphics.time")

from orphics_tpu import time_utils as ttime  # noqa: E402

# observatory coordinates x timestamps that straddle DST transitions
SITES = [
    (-22.9585, -67.7876),    # Cerro Toco: Chile DST on in Oct, off in Jun
    (19.8207, -155.4681),    # Mauna Kea: no DST
    (38.4331, -79.8398),     # Green Bank: US DST on in Jul, off in Jan
    (50.5248, 6.8836),       # Effelsberg: EU DST
    (-31.2749, 149.0672),    # Siding Spring: southern DST
]
CTIMES = [1728140400.0,      # 2024-10-05 (Chile DST on)
          1718000000.0,      # 2024-06-10 (Chile DST off, US/EU on)
          1704800000.0,      # 2024-01-09 (US/EU DST off)
          1735693200.0]      # 2025-01-01


def test_htime_matches_reference_across_sites_and_dst():
    for lat, lng in SITES:
        for ct in CTIMES:
            r = rtime.htime(ct, lat=lat, lng=lng)
            t = ttime.htime(ct, lat=lat, lng=lng)
            assert t == r, (lat, lng, ct)


def test_htime_default_site_matches_reference():
    for ct in CTIMES:
        assert ttime.htime(ct) == rtime.htime(ct)


def test_ctime_matches_reference_and_roundtrips():
    for lat, lng in SITES:
        for s in ("2024-10-05 08:00:00", "2024-06-10 23:30:00",
                  "2024-01-09 00:15:00"):
            r = rtime.ctime(s, lat=lat, lng=lng)
            t = ttime.ctime(s, lat=lat, lng=lng)
            assert t == r, (lat, lng, s)
            assert ttime.htime(t, lat=lat, lng=lng) == s
    assert ttime.ctime("2024-03-01 12:00:00") == rtime.ctime(
        "2024-03-01 12:00:00")


def test_get_columns_matches_reference():
    obs = [{"az": i * 1.5, "el": 40 + i, "t": 1.7e9 + 60 * i}
           for i in range(7)]
    r = rtime.get_columns(obs, ["az", "t"])
    t = ttime.get_columns(obs, ["az", "t"])
    assert set(r.keys()) == set(t.keys())
    for k in r:
        np.testing.assert_array_equal(t[k], r[k])


def test_body_period_and_style_tables_match_reference():
    assert ttime.BODY_PERIOD == rtime.BODY_PERIOD
    assert ttime.BODY_STYLE == rtime.BODY_STYLE


def test_body_circle_annotations_match_reference(monkeypatch):
    """Same toy ephemeris on both sides -> identical annotate lists
    (sampling density scaling, per-body styles, row format, the
    single text row per body)."""
    from pixell import ephem as toy
    import orphics_tpu.ephem as tephem
    monkeypatch.setattr(tephem, "eval_body",
                        lambda body, cts: toy.eval(body, cts))
    t1, t2 = 1.5e9, 1.5e9 + 200 * 86400.0
    for kwargs in (dict(),
                   dict(bodies=["Moon", "Mars", "NotABody"]),
                   dict(points_per_orbit=50, max_points=40),
                   dict(bodies=["Sun"], min_points=5)):
        r = rtime.body_circle_annotations(t1, t2, **kwargs)
        t = ttime.body_circle_annotations(t1, t2, **kwargs)
        assert len(r) == len(t), kwargs
        for rr, tt in zip(r, t):
            assert rr[0] == tt[0]
            np.testing.assert_allclose(tt[1:5], rr[1:5], rtol=1e-12,
                                       atol=1e-12)
            assert rr[5:] == tt[5:], (rr, tt)
    # zero-span window: single sample at ctime1
    r = rtime.body_circle_annotations(t1, t1, bodies=["Venus"])
    t = ttime.body_circle_annotations(t1, t1, bodies=["Venus"])
    assert len(r) == len(t) == 2
