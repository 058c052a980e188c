"""Coverage tests for the remaining subsystems: facades import and the
foregrounds/catalogs/fitting/healpix machinery behaves."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orphics_tpu import rect_geometry


def test_all_facades_import():
    import orphics_tpu.maps
    import orphics_tpu.stats
    import orphics_tpu.lensing
    import orphics_tpu.cosmology
    import orphics_tpu.pixcov
    import orphics_tpu.foregrounds
    import orphics_tpu.catalogs
    import orphics_tpu.io
    import orphics_tpu.mpi
    import orphics_tpu.interfaces
    import orphics_tpu.time_utils
    import orphics_tpu.algorithms
    # key reference names resolve
    assert hasattr(orphics_tpu.stats, "bin2D")
    assert hasattr(orphics_tpu.maps, "MapGen")
    assert hasattr(orphics_tpu.maps, "FourierCalc")
    assert hasattr(orphics_tpu.lensing, "FlatLensingSims")
    assert hasattr(orphics_tpu.lensing, "NlGenerator")
    assert hasattr(orphics_tpu.cosmology, "LimberCosmology")
    assert hasattr(orphics_tpu.mpi, "fakeMpiComm")


def test_healpix_native_vs_numpy():
    from orphics_tpu.utils import healpix as hp
    rng = np.random.default_rng(0)
    theta = np.arccos(rng.uniform(-1, 1, 5000))
    phi = rng.uniform(0, 2 * np.pi, 5000)
    for nside in (8, 64):
        pn = hp._ang2pix_np(nside, theta, phi)
        assert pn.min() >= 0 and pn.max() < hp.nside2npix(nside)
        # roundtrip via pix2ang numpy
        th, ph = hp._pix2ang_np(nside, pn)
        pr = hp._ang2pix_np(nside, th, ph)
        np.testing.assert_array_equal(pr, pn)
        if hp.have_native():
            pc = hp.ang2pix(nside, theta, phi)
            np.testing.assert_array_equal(pc, pn)
    # query_strip covers the right area fraction
    pix = hp.query_strip(32, np.pi / 3, 2 * np.pi / 3)
    frac = pix.size / hp.nside2npix(32)
    np.testing.assert_allclose(frac, 0.5, atol=0.02)  # cos(60)-cos(120) = 1/2... of total 2


def test_catalogs_binned_map_and_delta():
    from orphics_tpu.models import catalogs as cat
    geom = rect_geometry(width_arcmin=64 * 2.0, px_res_arcmin=2.0)
    key = jax.random.PRNGKey(0)
    decs, ras = cat.random_catalog_flat(key, geom, 20000)
    cmap = cat.binned_map(decs, ras, geom)
    assert float(cmap.sum()) == pytest.approx(20000, abs=20)  # few fall outside
    delta, nmean = cat.get_delta(cmap)
    assert abs(float(jnp.mean(delta))) < 1e-6
    # Poisson variance of counts
    assert float(cmap.var()) == pytest.approx(float(nmean), rel=0.1)


def test_pow2cat_correlation():
    """Poisson-sampled galaxy counts correlate with kappa as designed."""
    from orphics_tpu.models import catalogs as cat
    geom = rect_geometry(width_arcmin=128 * 2.0, px_res_arcmin=2.0)
    ells = np.arange(3000)
    clgg = 1e-6 * np.exp(-(ells / 800.0) ** 2) + 1e-8
    clkk = 1e-7 * np.exp(-(ells / 800.0) ** 2) + 1e-9
    clkg = 0.8 * np.sqrt(clgg * clkk)  # r = 0.8
    p2c = cat.Pow2Cat(geom, ells, clgg, clkg, clkk, ngal_per_arcmin2=100.0)
    nsims = 12

    @jax.jit
    def one(key):
        counts, kappa = p2c.get_cat(key)
        delta = counts / counts.mean() - 1.0
        kd = jnp.fft.fft2(delta)
        kk = jnp.fft.fft2(kappa)
        norm = geom.area / geom.npix ** 2
        cross = (kd.conj() * kk).real * norm
        autd = (kd.conj() * kd).real * norm
        autk = (kk.conj() * kk).real * norm
        return cross, autd, autk

    from orphics_tpu.ops.binning import Bin2D
    binner = Bin2D(geom.modlmap_np(),
                   np.arange(200, 1200, 200.0))
    keys = jax.random.split(jax.random.PRNGKey(1), nsims)
    cr, ad, ak = jax.vmap(one)(keys)
    _, crb = binner.bin(jnp.asarray(np.asarray(cr).mean(axis=0)))
    _, akb = binner.bin(jnp.asarray(np.asarray(ak).mean(axis=0)))
    _, thkg = binner.bin(jnp.asarray(np.interp(
        geom.modlmap_np(), ells, clkg)))
    ratio = np.asarray(crb) / np.asarray(thkg)
    assert np.all(np.abs(ratio - 1) < 0.3), ratio


def test_foreground_seds_and_templates():
    from orphics_tpu.models import foregrounds as fg
    # tSZ null at ~217 GHz
    assert abs(fg.g_tsz(217.4)) < 0.02
    assert fg.g_tsz(150.0) < 0  # decrement below null
    assert fg.g_tsz(353.0) > 0
    # ItoDeltaT inverse relation
    np.testing.assert_allclose(fg.ItoDeltaT(150.0) * fg.dBnudT(150.0), 1.0)
    ells = np.arange(2, 5000)
    clyy = fg.power_y_template(ells)
    assert np.all(clyy >= 0) and np.isfinite(clyy).all()
    # tsz power peaks in Dl around ell~3000 per Battaglia template
    dl = clyy * ells * (ells + 1) / 2 / np.pi
    assert 2000 < ells[np.argmax(dl)] < 9000
    for f in (fg.power_ksz_reion, fg.power_ksz_late):
        cl = f(ells)
        assert np.all(cl >= 0) and np.isfinite(cl).all()
    # radio power decreases with flux cut, zero above 200 GHz
    p1 = fg.get_radio_power(10.0, 145.0)
    p2 = fg.get_radio_power(2.0, 145.0)
    assert p1 > p2 > 0
    assert fg.get_radio_power(10.0, 225.0, flux_limit_mJy_2=10.0,
                              freq_ghz_2=225.0) == 0.0
    # cross radio power between the two paths is consistent-ish
    pc = fg.get_radio_power(10.0, 100.0, flux_limit_mJy_2=10.0,
                            freq_ghz_2=143.0)
    assert pc > 0
    # dust SED normalized at 353
    np.testing.assert_allclose(fg.dust_mu(353.0), 1.0)


def test_official_and_analytic_ilc_noise():
    from orphics_tpu.models import foregrounds as fg
    ells_so, nells_so = fg.get_official_ilc_noise("so")
    assert np.all(nells_so > 0)
    ells, nell = fg.ilc_power(beams=[5.1, 2.2, 1.4, 1.0, 0.9],
                              noises=[36., 8., 10., 22., 54.],
                              freqs=[39., 93., 145., 225., 280.],
                              flux_limits_mJy=[10., 7., 10., 10., 10.],
                              ellmax=6000)
    sel = (ells > 500) & (ells < 4000)
    assert np.all(nell[sel] > 0)
    # analytic forecast within a factor of a few of the official SO curve
    off = np.interp(ells[sel], ells_so, nells_so)
    ratio = nell[sel] / off
    assert np.median(ratio) < 5.0 and np.median(ratio) > 0.2, np.median(ratio)


def test_fit_linear_model_recovers():
    from orphics_tpu.utils import fitting as fit
    rng = np.random.default_rng(3)
    x = np.linspace(0, 10, 50)
    true = 2.0 * x + 5.0
    sigma = 0.5
    y = true + rng.standard_normal(50) * sigma
    ycov = np.eye(50) * sigma ** 2
    X, cov, chi2red, pte = fit.fit_linear_model(
        x, y, ycov, [lambda v: v, lambda v: np.ones_like(v)])
    assert abs(X[0, 0] - 2.0) < 5 * np.sqrt(cov[0, 0])
    assert abs(X[1, 0] - 5.0) < 5 * np.sqrt(cov[1, 1])
    assert 0.5 < chi2red < 2.0
    assert 0.001 < pte < 0.999
    # solver identity: deprojected solve is orthogonal to the template
    C = np.eye(8) + 0.1
    v = rng.standard_normal(8)
    out = fit.solve(C, v)
    assert abs(np.sum(out)) < 1e-8  # common mode deprojected


def test_sim_pte_uniformity():
    from orphics_tpu.utils import fitting as fit
    rng = np.random.default_rng(4)
    cov = np.diag(rng.uniform(0.5, 2.0, 6))
    data = rng.multivariate_normal(np.zeros(6), cov)
    pte = fit.sim_pte(data, cov, 4000, key=jax.random.PRNGKey(5))
    assert 0.0 <= pte <= 1.0


def test_bisection_search():
    from orphics_tpu.ops.algorithms import vectorized_bisection_search
    x = jnp.asarray([4.0, 9.0, 16.0])
    y = vectorized_bisection_search(x, lambda y: y ** 2, (0.1, 10.0),
                                    "increasing", rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y), [2, 3, 4], rtol=1e-4)


def test_time_roundtrip():
    from orphics_tpu import time_utils as tu
    # reference API (time.py:49): local time string + site coords
    ct = tu.ctime("2024-03-01 12:00:00")
    assert tu.htime(ct) == "2024-03-01 12:00:00"
    # explicit coordinates (Mauna Kea, no DST)
    ct = tu.ctime("2024-07-04 08:30:00", lat=19.8207, lng=-155.4681)
    assert tu.htime(ct, lat=19.8207, lng=-155.4681) == "2024-07-04 08:30:00"
    # open-ocean fallback zone is fixed-offset
    assert tu.timezone_at(0.0, -37.5).startswith("Etc/GMT")


def test_io_roundtrips(tmp_path):
    from orphics_tpu.utils import io as uio
    d = {"a": np.arange(5.0), "b": np.ones((3, 3))}
    f = str(tmp_path / "t.h5")
    uio.save_dict(f, d)
    d2 = uio.load_dict(f)
    np.testing.assert_allclose(d2["a"], d["a"])
    h1 = uio.get_hash(d["a"])
    assert h1 == uio.get_hash(np.arange(5.0))
    y = str(tmp_path / "c.yaml")
    with open(y, "w") as fh:
        fh.write("x: 1\nlist: [1, 2]\n")
    cfg = uio.config_from_yaml(y)
    assert cfg["x"] == 1 and cfg["list"] == [1, 2]
