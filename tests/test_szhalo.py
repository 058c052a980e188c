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


class TestCIB:
    """Shang/WebSky CIB halo model + y x CIB cross (the native
    counterpart of the reference's classy_sz wrapper,
    foregrounds.py:334). No CIB ground-truth file ships with the
    reference (it shells out to classy_sz), so validation pins the
    physically-measurable structure: SED limits, the documented
    amplitude calibration, the 2h->1h transition, thermodynamic
    frequency scaling, and the published range of the tSZ x CIB
    correlation coefficient."""

    @pytest.fixture(scope="class")
    def hm(self):
        return szhalo.CIBHaloModel(nz=32, nm=40)

    def test_sed_limits(self):
        # Rayleigh-Jeans side: slope beta + 2 in intensity per log nu
        lo = szhalo.shang_sed(np.array([30.0, 60.0]), 0.0)
        slope_rj = np.log(lo[1] / lo[0]) / np.log(2.0)
        assert abs(slope_rj - (1.6 + 2.0)) < 0.25
        # far Wien side: power law with index -alpha_hi
        hi = szhalo.shang_sed(np.array([4000.0, 8000.0]), 0.0)
        slope_w = np.log(hi[1] / hi[0]) / np.log(2.0)
        np.testing.assert_allclose(slope_w, -1.7, atol=1e-6)
        # pivot normalization
        np.testing.assert_allclose(
            szhalo.shang_sed(np.array([353.0]), 0.0), 1.0, rtol=1e-12)

    def test_subhalo_mf_positive_decreasing_tail(self):
        x = np.geomspace(1e-4, 0.9, 32)
        f = szhalo.subhalo_mf(x)
        assert np.all(f > 0)
        assert f[-1] < f[-8]  # exponential cutoff near m ~ M

    def test_amplitude_calibration_and_shape(self, hm):
        """L0 is calibrated so 143x143 matches the analytic clustered
        template at l=3000; the halo-model *shape* must then track the
        template within a factor ~2 across l in [500, 5000]."""
        from orphics_tpu.models import foregrounds as fg
        ells = np.array([500.0, 1000.0, 3000.0, 5000.0])
        got = hm.cib_cl(ells, 143.0, in_uk2=True)["total"]
        tmpl = np.asarray(fg.power_cibc(ells, 143.0))
        np.testing.assert_allclose(got[2] / tmpl[2], 1.0, rtol=1e-6)
        assert np.all(got / tmpl > 0.5) and np.all(got / tmpl < 2.0)

    def test_two_halo_dominates_low_l(self, hm):
        ells = np.array([500.0, 5000.0])
        c = hm.cib_cl(ells, 143.0)
        assert c["1h"][0] < c["2h"][0]      # clustering at large scales
        assert c["1h"][1] > c["2h"][1]      # 1h at small scales
        assert np.all(c["total"] > 0)

    def test_frequency_scaling_thermodynamic(self, hm):
        """353/143 power ratio in uK^2: the CIB rises steeply with
        frequency (order 10^2-10^3, e.g. Planck 2013 XXX)."""
        ells = np.array([1000.0, 3000.0])
        r = hm.cib_cl(ells, 353.0, in_uk2=True)["total"] \
            / hm.cib_cl(ells, 143.0, in_uk2=True)["total"]
        assert np.all(r > 50) and np.all(r < 3000), r

    def test_y_cib_correlation_coefficient(self, hm):
        """r = Cl_y,cib / sqrt(Cl_yy Cl_cib) in the published 0.1-0.8
        band (Planck 2015 tSZ x CIB measured ~0.3-0.5), increasing
        toward small scales (same halos source both)."""
        ells = np.array([500.0, 1000.0, 3000.0, 5000.0])
        yc = hm.y_cib_cl(ells, 143.0)["total"]
        yy = hm.cl_yy(ells)
        cc_ = hm.cib_cl(ells, 143.0)["total"]
        r = yc / np.sqrt(yy * cc_)
        assert np.all(r > 0.1) and np.all(r < 0.8), r
        assert r[-1] > r[0]

    def test_flux_cut_reduces_power(self, hm):
        ells = np.array([1000.0])
        full = hm.cib_cl(ells, 353.0)["total"][0]
        cut = hm.cib_cl(ells, 353.0, flux_cut_mJy=1.0)["total"][0]
        assert 0 < cut < full

    def test_compton_y_cib_powers_surface(self):
        out = szhalo.compton_y_cib_powers([143.0, 353.0],
                                          flux_limits_mJy=[7.0, 7.0],
                                          lmax=4000, nl=8, nz=24, nm=32)
        assert out["yy"].shape == (8,)
        assert out["cib_cib"].shape == (2, 2, 8)
        assert out["y_cib"].shape == (2, 8)
        assert np.all(out["yy"] > 0)
        assert np.all(out["cib_cib"] > 0)
        assert np.all(out["y_cib"] > 0)
        # symmetric frequency matrix
        np.testing.assert_allclose(out["cib_cib"][0, 1],
                                   out["cib_cib"][1, 0])

    def test_clyy_alias(self):
        ells = np.array([500.0, 3000.0])
        a = szhalo.clyy(ells, mmin=1e11, mmax=2e15, nz=24, nm=32)
        b = szhalo.compute_cl_yy(ells, M_min=1e11, M_max=2e15,
                                 nz=24, nm=32)
        np.testing.assert_allclose(a, b, rtol=1e-12)
