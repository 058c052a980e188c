"""Cosmology tests: background distances, growth, EH98 power/sigma8,
Limber C_l against the shipped CAMB ground truth, Knox forecasts."""
import numpy as np
import pytest
import jax.numpy as jnp

from orphics_tpu.models import cosmology as cosmo, theory


@pytest.fixture(scope="module")
def cc():
    return cosmo.Cosmology()


@pytest.fixture(scope="module")
def lc():
    return cosmo.LimberCosmology(numz=600)


@pytest.fixture(scope="module")
def th():
    return theory.default_theory()


def test_background_distances(cc):
    assert abs(cc.hubble_parameter(0.0) - cc.H0) < 1e-6
    chi1 = cc.comoving_radial_distance(1.0)
    assert 3200 < chi1 < 3600, chi1  # ~3400 Mpc for Planck-like LCDM
    assert 13500 < cc.chistar < 14500, cc.chistar
    # roundtrip z <-> chi
    z = cc.redshift_at_comoving_radial_distance(chi1)
    assert abs(z - 1.0) < 1e-3
    # angular diameter distance relation
    np.testing.assert_allclose(cc.angular_diameter_distance(1.0), chi1 / 2.0,
                               rtol=1e-6)


def test_growth_normalizations(cc):
    assert abs(cc.D_growth(1.0) - 1.0) < 1e-6
    # matter-domination: D ~ a
    a = np.array([0.002, 0.004, 0.008])
    d = cc.D_growth(a, norm="matter")
    np.testing.assert_allclose(d / a, 1.0, rtol=0.02)
    # growth suppression today for LCDM: D(a=1, matter norm) ~ 0.78
    d1 = cc.D_growth(1.0, norm="matter")
    assert 0.7 < d1 < 0.85, d1


def test_transfer_limits(cc):
    k = np.logspace(-4, 1, 200)
    T = cc.transfer(k)
    assert abs(T[0] - 1.0) < 1e-3          # T -> 1 at large scales
    assert np.all(np.diff(T[k > 0.5]) < 0)  # decreasing in the damping tail
    assert np.all(T > 0) and np.all(T <= 1.001)
    # no-wiggle and oscillatory agree to ~5%
    Tn = cc.transfer(k, type="eisenhu")
    sel = (k > 1e-3) & (k < 1.0)
    assert np.max(np.abs(T[sel] / Tn[sel] - 1)) < 0.12


def test_sigma8_and_As_scaling(cc):
    s8 = cc.sigma8()
    assert 0.75 < s8 < 0.92, s8  # DR4-like cosmology
    # sigma8 ~ sqrt(As)
    s8_hi = cosmo.s8_from_as(cc.As * 4.0)
    np.testing.assert_allclose(s8_hi / s8, 2.0, rtol=1e-4)
    As_t = cosmo.As_from_s8(0.8)
    np.testing.assert_allclose(cosmo.s8_from_as(As_t), 0.8, rtol=1e-4)


def test_limber_clkk_vs_camb_table(lc, th):
    """Limber + EH98 clkk against the shipped CAMB high-accuracy table.
    EH98 is a few-% transfer approximation and the table includes
    nonlinear corrections, so demand ~linear-regime agreement only."""
    ells = np.arange(30, 400, 20)
    lc.generateCls(ells)
    clkk = lc.getCl("cmb", "cmb")
    clkk_camb = np.asarray(th.gCl("kk", ells))
    ratio = clkk / clkk_camb
    # cosmo params differ slightly (DR4 vs 2017) + EH98: allow 20%
    assert np.all(np.abs(ratio - 1) < 0.25), ratio
    assert abs(np.median(ratio) - 1) < 0.15, ratio


def test_limber_clkk_matched_params_ceiling(th):
    """Pin the documented few-% EH98 ceiling: with the SAME parameters
    the shipped table was generated with (data/Aug6_highAcc_CDM_params
    .ini: H0 67.31, ombh2 0.0222, omch2 0.1197, ns 0.9655, As 2.2e-9),
    Limber + EH98 clkk must track the CAMB high-accuracy lens-potential
    table to <=6% pointwise over the linear regime (measured: smooth
    +1.7%..+4.2% envelope, median +3.7% — EH98 transfer accuracy)."""
    from orphics_tpu.models.cosmology import LimberCosmology
    p2017 = {'H0': 67.31, 'ombh2': 0.0222, 'omch2': 0.1197,
             'ns': 0.9655, 'As': 2.2e-9, 'mnu': 0.06,
             'w0': -1.0, 'wa': 0.0, 'tau': 0.06}
    lc = LimberCosmology(params=p2017)
    ells = np.arange(30, 400, 20)
    lc.generateCls(ells)
    ratio = np.asarray(lc.getCl("cmb", "cmb")) \
        / np.asarray(th.gCl("kk", ells))
    assert np.all(np.abs(ratio - 1) < 0.06), ratio
    assert abs(np.median(ratio) - 1) < 0.05, ratio


def test_limber_cross_consistency(lc):
    zs = np.linspace(0.2, 1.6, 100)
    nz = np.exp(-0.5 * (zs - 0.8) ** 2 / 0.2 ** 2)
    lc.addNz("g", zs, nz, bias=1.8, ignore_exists=True)
    lc.addDeltaNz("s1", 1.0, ignore_exists=True)
    ells = np.arange(40, 800, 40)
    lc.generateCls(ells)
    clkk = lc.getCl("cmb", "cmb")
    clgg = lc.getCl("g", "g")
    clkg = lc.getCl("cmb", "g")
    # Cauchy-Schwarz and positivity
    assert np.all(clkk > 0) and np.all(clgg > 0) and np.all(clkg > 0)
    assert np.all(clkg ** 2 <= clkk * clgg * (1 + 1e-6))
    # a source at z=1100-ish reproduces the cmb kernel
    lc.addDeltaNz("far", 1050.0, ignore_exists=True)
    lc.generateCls(np.arange(40, 200, 40))
    r = lc.getCl("far", "far") / lc.getCl("cmb", "cmb")
    np.testing.assert_allclose(r, 1.0, rtol=0.05)


def test_lensforecast_knox(th):
    lf = cosmo.LensForecast()
    ells = np.arange(2, 3000)
    clkk = np.asarray(th.gCl("kk", ells))
    nls = np.full(ells.shape, 1e-7)
    lf.loadKK(ells, clkk, ells, nls)
    edges = np.arange(40, 1000, 80)
    sn1, errs1 = lf.sn(edges, 0.1, "kk")
    sn4, errs4 = lf.sn(edges, 0.4, "kk")
    np.testing.assert_allclose(sn4 / sn1, 2.0, rtol=1e-6)
    np.testing.assert_allclose(errs1 / errs4, 2.0, rtol=1e-6)
    assert sn1 > 5  # a decent experiment detects lensing
    # KnoxCov symmetric usage
    covs, s1, s2 = lf.KnoxCov("kk", "kk", edges, 0.4)
    np.testing.assert_allclose(s1, s2, rtol=1e-9)
    assert np.all(covs > 0)


def test_get_lensed_cls_matches_camb(th):
    """Flat-sky Gaussian-resummed correlation-function lensing of the
    unlensed spectrum reproduces the CAMB lensed table to ~2%."""
    ells = np.arange(9001)
    ucl = np.asarray(th.uCl('TT', ells))
    lcl = np.asarray(th.lCl('TT', ells))
    clkk = np.asarray(th.gCl('kk', ells))
    oe, lensed = cosmo.get_lensed_cls(ells, ucl, clkk, lmax=3000)
    idx = ((oe > 500) & (oe < 2500)).nonzero()[0]
    assert np.abs(lensed[idx] / lcl[idx] - 1).max() < 0.02
    d_pred = lensed[idx] - ucl[idx]
    d_true = lcl[idx] - ucl[idx]
    assert np.corrcoef(d_pred, d_true)[0, 1] > 0.95


def test_noise_pad_infinity():
    f = cosmo.noise_pad_infinity(lambda x: np.asarray(x) * 0 + 1.0, 100, 2000)
    out = f(np.array([50, 500, 3000]))
    assert np.isinf(out[0]) and out[1] == 1.0 and np.isinf(out[2])


class TestPkgridIngestion:
    """The P(k,z) table-ingestion path: an external matter-power grid fed
    through ``pkgrid_override`` must reproduce the direct-P_lin Limber
    clkk (lossless ingestion; reference behavior is CAMB's
    get_matter_power_interpolator at ``orphics/cosmology.py:633``)."""

    def test_table_roundtrip_clkk(self, tmp_path):
        base = cosmo.LimberCosmology(lmax=800, numz=300, nz_pk=200,
                                     nk_pk=300)
        # dump the internal P_lin on a CAMB-like (k in h/Mpc, P in
        # (Mpc/h)^3) per-redshift file set
        h = base.H0 / 100.0
        zs = np.expm1(np.linspace(0.0, np.log1p(1100.0), 80))
        ks = np.logspace(-4, np.log10(40.0), 220)  # 1/Mpc
        paths = []
        for i, z in enumerate(zs):
            P = base.P_lin(ks, z)
            p = tmp_path / f"matterpower_{i}.dat"
            np.savetxt(p, np.c_[ks / h, P * h ** 3])
            paths.append(str(p))
        pk, (zs2, ks2, P2) = cosmo.load_camb_pk(paths, zs, h)
        np.testing.assert_allclose(ks2, ks, rtol=1e-12)
        # elementwise evaluation matches the source away from grid edges
        ztest = np.array([0.3, 1.0, 3.0, 10.0])
        ktest = np.array([1e-3, 1e-2, 0.1, 1.0])
        for z in ztest:
            np.testing.assert_allclose(pk(z, ktest), base.P_lin(ktest, z),
                                       rtol=2e-3)
        over = cosmo.LimberCosmology(lmax=800, numz=300, nz_pk=200,
                                     nk_pk=300, pkgrid_override=pk)
        ells = np.arange(30, 800, 20)
        base.generateCls(ells)
        over.generateCls(ells)
        r = over.getCl("cmb", "cmb") / base.getCl("cmb", "cmb")
        assert np.max(np.abs(r - 1.0)) < 5e-3, r


class TestCosmologyRegressions:
    """Review regressions for models/cosmology.py."""

    def test_get_lss_cls_missing_bias_raises(self):
        with pytest.raises(KeyError, match="bias"):
            cosmo.get_lss_cls(
                {"g": {"stype": "counts", "wtype": "gaussian",
                       "zmean": 0.5, "zsigma": 0.1}}, lmax=50)
        with pytest.raises(ValueError, match="stype"):
            cosmo.get_lss_cls(
                {"g": {"stype": "count", "wtype": "gaussian", "b": 1.5,
                       "zmean": 0.5, "zsigma": 0.1}}, lmax=50)

    def test_pk_p_grid_contract(self, lc):
        zs = np.array([0.2, 0.7, 1.4])
        ks = np.geomspace(1e-3, 1.0, 17)
        g = lc.PK_P(zs, ks, grid=True)
        assert g.shape == (3, 17)
        for i, z in enumerate(zs):
            np.testing.assert_allclose(
                g[i], lc.PK_P(np.full(17, z), ks), rtol=1e-12)
        with pytest.raises(ValueError, match="matching shapes"):
            lc.PK_P(zs, ks)

    def test_magbias_correction_convention(self):
        """The magnification term is (5s - 2) x the CAMB-validated
        lensing kernel: s = 0.4 makes it vanish EXACTLY, and the
        correction carries the lensing prefactor (one 1/Hz) — the
        reference's /Hz^2 form (flagged 'needs to be checked' there)
        suppressed it by ~Hz."""
        lc = cosmo.LimberCosmology(lmax=200, numz=200)
        zs = np.linspace(0.05, 2.0, 120)
        nz = np.exp(-0.5 * ((zs - 0.8) / 0.25) ** 2)
        lc.addNz("g0", zs, nz, bias=1.6)
        lc.addNz("gnull", zs, nz, bias=1.6, magbias=0.4)
        lc.addNz("gmag", zs, nz, bias=1.6, magbias=1.0)
        W0 = lc.kernels["g0"]["W"]
        np.testing.assert_allclose(lc.kernels["gnull"]["W"], W0,
                                   rtol=0, atol=1e-12)
        dmag = lc.kernels["gmag"]["W"] - W0
        ret = lc._lens_window(lc.kernels["gmag"], 300)
        np.testing.assert_allclose(
            dmag, 3.0 * ret * lc._lens_prefactor(), rtol=1e-10)

    def test_lensforecast_noiseless_kk(self, th):
        ells = np.arange(2, 500)
        clkk = np.asarray(th.gCl("kk", ells))
        lf = cosmo.LensForecast(th)
        lf.loadKK(ells, clkk)                  # no noise curve
        edges = np.arange(50, 400, 50.0)
        sn, _ = lf.sn(edges, 0.4, "kk")
        assert np.isfinite(sn) and sn > 0

    def test_pycamb_loader_kk_table(self, th):
        ells = np.arange(0, 600)
        fake = {
            "lensed_scalar": np.zeros((600, 4)),
            "unlensed_scalar": np.zeros((600, 4)),
            "lens_potential": np.ones((600, 3)) * 4.0 / (2 * np.pi),
        }
        for key in ("lensed_scalar", "unlensed_scalar"):
            fake[key][:, 0] = 1.0
        t = cosmo.loadTheorySpectraFromPycambResults(
            fake, None, kellmax=500, lpad=600)
        # clkk = lens_potential * 2pi/4 = (4/2pi) * (2pi/4) = 1
        out = np.asarray(t.gCl("kk", np.arange(2, 400)))
        np.testing.assert_allclose(out, 1.0, rtol=1e-12)
        assert t.dimensionless is True
