"""Lensed-Cl regression against the reference's LCDM baseline fixture.

The reference pins its cosmology pipeline with
``orphics/tests/test_cosmology.py:11-37`` (``test_cls_camb``): regenerate
lensed Cls for the stored parameters and compare with
``lcdm_baseline.pkl`` at rtol 1e-8.  This framework ingests theory as
dense per-ell tables instead of running CAMB, so the equivalent contract
is that the owned ``TheorySpectra`` container reproduces that same
ground-truth fixture losslessly: ingesting the baseline lensed Cls and
evaluating at the stored (integer) ells must return them at rtol 1e-8
(BASELINE.md "Regression fixture: LCDM lensed Cls").

``tests/data/lcdm_baseline.npz`` is the reference pickle's
``lensed_cls`` dict re-encoded as npz (data fixture, not code).
"""
import os

import numpy as np
import pytest

from orphics_tpu.models.theory import TheorySpectra

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def baseline():
    return np.load(os.path.join(DATA, "lcdm_baseline.npz"))


@pytest.fixture(scope="module")
def th(baseline):
    t = TheorySpectra(tables={}, lpad=int(baseline["lmax"]))
    ells = baseline["ell"]
    for pol in ("tt", "ee", "te", "bb"):
        t.loadCls(ells, baseline[pol], pol.upper(), lensed=True)
    return t


def test_lcdm_baseline_roundtrip_rtol_1e8(baseline, th):
    """The container must hand back the ingested ground truth at the
    reference's tolerance (rtol 1e-8, atol 1e-20) on the stored ells."""
    ells = baseline["ell"]
    for pol in ("tt", "ee", "te", "bb"):
        got = np.asarray(th.lCl(pol.upper(), ells), np.float64)
        np.testing.assert_allclose(got, baseline[pol], rtol=1e-8,
                                   atol=1e-20, err_msg=pol)


def test_lcdm_baseline_interpolation_smooth(baseline, th):
    """Half-integer ells must land between the bracketing table values
    (linear interpolation, no ringing/extrapolation artifacts)."""
    ells = baseline["ell"][:-1]
    for pol in ("tt", "ee"):
        cl = baseline[pol]
        mid = np.asarray(th.lCl(pol.upper(), ells + 0.5), np.float64)
        lo = np.minimum(cl[:-1], cl[1:]) - 1e-20
        hi = np.maximum(cl[:-1], cl[1:]) + 1e-20
        assert np.all((mid >= lo) & (mid <= hi)), pol


def test_lcdm_baseline_out_of_range_zero(baseline, th):
    """Beyond the ingested range the reference fills zero
    (interp1d fill_value=0); ell < 2 and ell > 4999 must give 0."""
    got = np.asarray(th.lCl("TT", np.array([0.0, 1.0, 5500.0, 6000.0])))
    assert np.all(got == 0.0), got
