"""Native halo-model tSZ power (models/szhalo.py) vs the reference's own
shipped Battaglia simulation template."""
import numpy as np
import pytest

from orphics_tpu.models import szhalo


class TestPieces:
    def test_tinker_f_shape(self):
        sig = np.linspace(0.3, 3.0, 20)
        f = szhalo.tinker_f(sig, 0.0)
        assert np.all(f > 0)
        # exponential cutoff at low sigma (high mass)
        assert f[0] < f[-1]

    def test_tinker_bias_monotonic_high_nu(self):
        nu = np.linspace(0.5, 5.0, 30)
        b = szhalo.tinker_bias(nu)
        assert np.all(np.diff(b[10:]) > 0)
        assert b[-1] > 5  # massive halos strongly biased

    def test_mass_conversion(self):
        from orphics_tpu.models.cosmology import Cosmology
        cc = Cosmology()
        ms = np.geomspace(1e13, 1e15, 8)
        m200m, r200c = szhalo.m200c_to_m200m(ms, 0.3, cc)
        # mean-density threshold is lower than critical => larger radius
        # and mass
        assert np.all(m200m > ms)
        assert np.all(m200m < 2.5 * ms)
        assert np.all(np.diff(m200m) > 0)

    def test_yl_scalings(self):
        from orphics_tpu.models.cosmology import Cosmology
        cc = Cosmology()
        ells = np.array([500.0, 3000.0])
        y1 = szhalo.battaglia_yl(ells, np.array([2e14]), 0.3, cc)
        y2 = szhalo.battaglia_yl(ells, np.array([4e14]), 0.3, cc)
        # y ~ M^(5/3)-ish: doubling mass more than doubles y
        assert np.all(y2 > 2 * y1)
        # profiles decrease with l
        assert np.all(y1[:, 1] < y1[:, 0])


class TestVsTemplate:
    @pytest.fixture(scope="class")
    def battaglia_cosmo(self):
        """The simulation cosmology of the shipped template
        (Battaglia et al. 2012: sigma8=0.8, Om=0.25, h=0.72, Ob=0.043)."""
        from orphics_tpu.models.cosmology import Cosmology, As_from_s8
        params = dict(omch2=0.25 * 0.72 ** 2 - 0.043 * 0.72 ** 2,
                      ombh2=0.043 * 0.72 ** 2, H0=72.0, ns=0.96, tau=0.09)
        params["As"] = As_from_s8(0.8, params=params)
        return Cosmology(params)

    def test_cl_yy_matches_template(self, battaglia_cosmo):
        """Quantitative parity vs the reference's shipped Battaglia
        simulation template at the template's own cosmology, with the
        converged default quadrature (see szhalo module docstring).

        In every reference use of this template the amplitude A_tsz is
        a free fitted parameter (power_y_template / fg_fit), so the
        operative parity is *shape*: <=5% over l in [400, 8000] after a
        single amplitude. The fitted amplitude itself must sit at the
        documented ~0.90 (raw curves agree to ~10%), and the raw ratio
        stays in a hard [0.85, 1.05] envelope over the whole range."""
        from orphics_tpu.models import foregrounds as fg
        ells = np.geomspace(300, 8000, 16)
        cyy = szhalo.compute_cl_yy(ells, cc=battaglia_cosmo)
        tmpl = np.asarray(fg.power_y_template(ells.astype(int)))
        ratio = cyy / tmpl
        # hard raw envelope over the full range (l=300 included)
        assert np.all(ratio > 0.85) and np.all(ratio < 1.05), ratio
        # single fitted amplitude: documented ~0.90
        amp = np.exp(np.mean(np.log(ratio)))
        assert 0.84 < amp < 0.96, amp
        # shape after the amplitude: <=5% for l >= 400
        shape = ratio / amp
        sel = ells >= 400
        assert np.all(np.abs(shape[sel] - 1.0) < 0.05), shape
        # and the one excluded point (l=300) is still <=16%
        assert np.all(np.abs(shape - 1.0) < 0.16), shape

    def test_two_halo_dominates_low_l_only(self, battaglia_cosmo):
        ells = np.array([200.0, 5000.0])
        c1h = szhalo.compute_cl_yy(ells, nz=24, nm=40, include_2h=False,
                                   cc=battaglia_cosmo)
        ctot = szhalo.compute_cl_yy(ells, nz=24, nm=40, include_2h=True,
                                    cc=battaglia_cosmo)
        frac = (ctot - c1h) / ctot
        assert frac[0] > frac[1]
        assert frac[1] < 0.05   # 1-halo dominated at high l

    def test_tsz_power_frequency_scaling(self, battaglia_cosmo):
        from orphics_tpu.models.foregrounds import g_tsz
        ells = np.array([3000.0])
        cyy = szhalo.compute_cl_yy(ells, nz=20, nm=32, cc=battaglia_cosmo)
        p150 = szhalo.compute_tsz_power(ells, 150.0, 150.0, Cyy=cyy)
        p90 = szhalo.compute_tsz_power(ells, 90.0, 90.0, Cyy=cyy)
        want = (np.asarray(g_tsz(90.0)) / np.asarray(g_tsz(150.0))) ** 2
        np.testing.assert_allclose(p90 / p150, want, rtol=1e-10)
        assert p150[0] > 0  # uK^2, squared negative g
