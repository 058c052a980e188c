"""Cosmic-shear Limber likelihood (models/shear.py) and corner plot."""
import os
import numpy as np
import pytest

from orphics_tpu.models.shear import (LimberCosmicShear,
                                      gaussian_band_covariance)


@pytest.fixture(scope="module")
def lik():
    return LimberCosmicShear(zsrc=1.0, ngal_arcmin2=20.0, fsky=0.4,
                             nell=12, trim_lmax=500, lmax=450)


class TestLikelihood:
    def test_fiducial_logp_zero(self, lik):
        assert lik.logp(cl_kk=lik._cl_fid) == 0.0

    def test_sn_reasonable(self, lik):
        """An SO-like shear config detects lensing at high significance."""
        sn = lik.sn()
        assert 50 < sn < 1000

    def test_shifted_cosmology_disfavored(self, lik):
        lp = lik.logp(params={"H0": 70.0})
        assert lp < -1.0

    def test_amplitude_direction(self, lik):
        """Scaling the theory up and down moves logp symmetrically to
        second order and always negative."""
        up = lik.logp(cl_kk=lik._cl_fid * 1.05)
        dn = lik.logp(cl_kk=lik._cl_fid * 0.95)
        assert up < 0 and dn < 0
        assert abs(np.log(abs(up) / abs(dn))) < 0.3

    def test_band_covariance_scalings(self):
        cl = 1.0 / (np.arange(600) + 10.0) ** 2
        nl = np.full(600, 1e-8)
        edges = np.geomspace(20, 500, 8)
        c1 = gaussian_band_covariance(edges, cl, nl, fsky=0.4)
        c2 = gaussian_band_covariance(edges, cl, nl, fsky=0.1)
        np.testing.assert_allclose(c2 / c1, 4.0, rtol=1e-10)
        assert np.all(c1 > 0)


class TestCornerPlot:
    def test_corner_plot_file(self, tmp_path):
        from orphics_tpu.utils.plot import corner_plot
        F1 = np.array([[40.0, 100.0], [100.0, 1.6e7]])
        F2 = 2.0 * F1
        out = str(tmp_path / "corner.png")
        corner_plot([F1, F2], ["A", "B"], ["H0", "omch2"],
                    fid_dict={"H0": 67.5, "omch2": 0.122}, save_file=out)
        assert os.path.getsize(out) > 5000

    def test_corner_plot_no_1d(self, tmp_path):
        from orphics_tpu.utils.plot import corner_plot
        F = np.diag([1.0, 4.0, 9.0])
        out = str(tmp_path / "corner3.png")
        corner_plot([F], ["X"], ["a", "b", "c"], show_1d=False,
                    save_file=out)
        assert os.path.getsize(out) > 5000
