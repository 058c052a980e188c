"""Tutorial-surface call compatibility (VERDICT r3 item 2 done-
criterion): CALL — not hasattr — the ~20 entry points the reference
tutorials (``/root/reference/tutorials/*.ipynb``) use, with reference-
style arguments. The two documented idiom changes apply throughout
(MIGRATION.md #1: ``geom`` in place of ``(shape, wcs)``; #2: PRNG keys
in place of integer seeds); every other argument spelling is the
tutorials' own. Names the tutorials use that are absent from the
CURRENT reference module too (``maps.Stacker``, ``maps.cutout``,
``maps.aperture_photometry`` — stale notebook API) are out of scope.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orphics_tpu import maps, stats, io, cosmology, lensing


@pytest.fixture(scope="module")
def geom():
    # tutorials: maps.rect_geometry(width_deg=5., px_res_arcmin=1.5)
    return maps.rect_geometry(width_deg=5.0, px_res_arcmin=1.5)


@pytest.fixture(scope="module")
def th():
    # tutorials: cosmology.default_theory()
    return cosmology.default_theory()


def test_rect_geometry_tutorial_spellings():
    g1 = maps.rect_geometry(width_deg=5.0, px_res_arcmin=0.5)
    assert g1.shape == (600, 600)
    g2 = maps.rect_geometry(width_arcmin=300.0, px_res_arcmin=0.5)
    assert g2.shape == g1.shape


def test_mapgen_fouriercalc_bin2d_pipeline(geom, th):
    """The core tutorial loop: MapGen -> FourierCalc.power2d -> bin2D."""
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    ps = cltt.reshape((1, 1, cltt.size))          # tutorial reshape
    mg = maps.MapGen(geom, ps)                    # geom for (shape, wcs)
    imap = mg.get_map(jax.random.PRNGKey(0))      # key for seed
    fc = maps.FourierCalc(geom)
    p2d, kmap, _ = fc.power2d(imap)
    bin_edges = np.arange(100, 3000, 40)
    binner = stats.bin2D(geom.modlmap_np(), bin_edges)
    cents, p1d = binner.bin(p2d)
    th1d = np.interp(np.asarray(cents), ells, cltt)
    sel = np.asarray(cents) > 300
    ratio = np.asarray(p1d)[sel] / th1d[sel]
    assert abs(np.mean(ratio) - 1) < 0.1          # one realization


def test_mask_kspace_tutorial_kwargs(geom):
    tmask = maps.mask_kspace(geom, lmin=300, lmax=3000)
    pmask = maps.mask_kspace(geom, lmin=100, lmax=5000)
    assert np.asarray(tmask).sum() < np.asarray(pmask).sum()


def test_get_taper_deg_and_area_from_mask(geom):
    taper, w2 = maps.get_taper_deg(geom, taper_width_degrees=1.0)
    assert 0 < float(w2) <= 1
    area_sqdeg, frac = maps.area_from_mask(jnp.ones(geom.shape), geom)
    assert abs(area_sqdeg - 25.0) / 25.0 < 0.01   # 5 deg x 5 deg
    assert frac == 1.0


def test_stats_container_and_cov2corr():
    s = stats.Stats()                              # tutorial: stats.Stats()
    rng = np.random.default_rng(0)
    for _ in range(20):
        s.add_to_stats("c", rng.standard_normal(4))
    s.get_stats()
    corr = stats.cov2corr(s.stats["c"]["cov"])
    np.testing.assert_allclose(np.diag(corr), 1.0, rtol=1e-12)


def test_cosmology_tutorial_constructors():
    # tutorial spellings with the CAMB-solve knobs
    cc = cosmology.Cosmology(lmax=2000, pickling=True, dimensionless=False)
    assert cc.comoving_radial_distance(1100.0) > 9000  # Mpc
    cc2 = cosmology.Cosmology({"H0": 70.0}, lmax=2000)
    assert abs(cc2.h - 0.7) < 1e-12


def test_limber_cosmology_tutorial_constructor():
    lc = cosmology.LimberCosmology(lmax=2000, pickling=True,
                                   skipPower=False, low_acc=True)
    ells = np.arange(100, 1000, 100.0)
    lc.generateCls(ells)
    clkk = np.asarray(lc.getCl("cmb", "cmb"))
    assert np.all(clkk > 0) and np.all(np.isfinite(clkk))


def test_lensforecast_tutorial_flow(th):
    lf = cosmology.LensForecast()                 # tutorial: no args
    ells = np.arange(2, 3000)
    lf.loadKK(ells, np.asarray(th.gCl("kk", ells)),
              ells, np.asarray(th.gCl("kk", ells)) * 0.1)
    sn, _ = lf.sn(np.arange(100, 2000, 100.0), fsky=0.4, specType="kk")
    assert sn > 1


def test_nlgenerator_tutorial_flow(geom, th):
    bin_edges = np.arange(40, 400, 40.0)
    nlg = lensing.NlGenerator(geom, th, bin_edges)
    nlg.update_noise(beam_arcmin=1.4, noise_t_uk_arcmin=7.0)
    cents, nl = nlg.get_nl("TT")
    assert np.all(np.isfinite(nl)) and np.all(nl > 0)


def test_qest_tutorial_flow(geom, th):
    """MIGRATION: the reference's ``lensing.qest(shape, wcs, theory,
    noise2d=..., kmask=...)`` becomes ``lensing.qest(geom, theory,
    ctot2d, xmask=, kmask=)`` with ctot2d the total-power dicts."""
    from orphics_tpu.ops import fourier as F
    ctot = lensing.lensing_noise_2d(geom, th, 1.5, 7.0)
    q = lensing.qest(geom, th, ctot,
                     xmask=maps.mask_kspace(geom, lmin=100, lmax=3000),
                     kmask=maps.mask_kspace(geom, lmin=40, lmax=500))
    n0 = np.asarray(q.N_L_kk("TT"))
    assert np.all(np.isfinite(n0))


def test_flatlensingsims_tutorial_flow(geom, th):
    fls = lensing.FlatLensingSims(geom, th, beam_arcmin=1.5,
                                  noise_uk_arcmin=7.0)
    obs = fls.get_sim(jax.random.PRNGKey(1))
    assert np.asarray(obs).shape == geom.shape


def test_io_plotter_plot_img_fisherplots(tmp_path, th):
    ells = np.arange(2.0, 2000.0)
    pl = io.Plotter(scheme="Dell")                # tutorial scheme use
    pl.add(ells, np.asarray(th.lCl("TT", ells)), label="lensed")
    pl.done(str(tmp_path / "cls.png"))
    io.plot_img(np.random.default_rng(0).standard_normal((32, 32)),
                filename=str(tmp_path / "map.png"))
    fp = io.FisherPlots()
    fp.addSection("s", ["a", "b"], ["a", "b"], {"a": 1.0, "b": 2.0})
    fp.addFisher("s", "exp", np.array([[9.0, 1.0], [1.0, 16.0]]))
    fp.plotPair("s", ("a", "b"), ["exp"],
                saveFile=str(tmp_path / "fp.png"))
    for f in ("cls.png", "map.png", "fp.png"):
        assert (tmp_path / f).stat().st_size > 500


def test_load_theory_from_camb_alias(th):
    # tutorial: cosmology.loadTheorySpectraFromCAMB(...) — alias exists
    # and is callable against the shipped table root
    assert callable(cosmology.loadTheorySpectraFromCAMB)
    assert cosmology.loadTheorySpectraFromCAMB is \
        cosmology.load_theory_from_camb


def test_rdn0_mcn0_call_surface(geom, th):
    """Round-4/5 QE debias surface: rdn0(qe, est, kdata, sim_kmaps,
    bin_edges) / mcn0(qe, est, sim_kmaps, bin_edges) — signature guard
    with a tiny 2-sim ensemble (numerics are validated against the
    analytic N0 in tests/test_qe_mv.py)."""
    from orphics_tpu.models import qe as mqe
    ctot = lensing.lensing_noise_2d(geom, th, 1.5, 7.0)
    q = lensing.qest(geom, th, ctot,
                     xmask=maps.mask_kspace(geom, lmin=100, lmax=2000),
                     kmask=maps.mask_kspace(geom, lmin=40, lmax=400))
    ells = np.arange(th.lpad + 1)
    ps = np.asarray(th.lCl("TT", ells)).reshape((1, 1, -1))
    mg = maps.MapGen(geom, ps)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    fc = maps.FourierCalc(geom)
    kmaps = jnp.stack([fc.fft(mg.get_map(k)) for k in keys])
    bin_edges = np.arange(80, 400, 80.0)
    cents, r, mc = mqe.rdn0(q, "TT", kmaps[0], kmaps[1:], bin_edges)
    assert np.all(np.isfinite(np.asarray(r)))
    cents2, m = mqe.mcn0(q, "TT", kmaps[1:], bin_edges)
    np.testing.assert_allclose(np.asarray(cents2), np.asarray(cents))
    assert np.asarray(m).shape == np.asarray(r).shape


def test_n1_tt_call_surface(geom, th):
    """Round-5 N1 surface: lensing.n1_tt(qe, Ls, clkk[, ells, pad])
    returns (Ls, n1_kk) numpy arrays (numerics pinned against the 4D
    lattice sum in tests/test_qe_n1.py)."""
    ctot = lensing.lensing_noise_2d(geom, th, 1.5, 7.0)
    q = lensing.qest(geom, th, ctot,
                     xmask=maps.mask_kspace(geom, lmin=100, lmax=2000))
    ells = np.arange(th.lpad + 1)
    clkk = np.asarray(th.gCl("kk", ells))
    Ls, n1 = lensing.n1_tt(q, np.array([200.0, 400.0]), clkk, ells=ells)
    assert n1.shape == (2,) and np.all(np.isfinite(n1))
    assert np.all(n1 > 0)


def test_fastcl_call_surface():
    """FastCl(geom, ells, cl1d, bin_edges) + sim_bandpowers(key) /
    map_bandpowers(map) — the fused sim->power->bin engine's public
    spellings (interpret mode on CPU)."""
    from orphics_tpu.models.fastcl import FastCl
    g = maps.rect_geometry(width_deg=4.0, px_res_arcmin=4.0 * 60 / 256)
    assert g.shape == (256, 256)
    ells = np.arange(4000.0)
    cl1d = 100.0 / (ells + 50.0) ** 2
    edges = np.arange(200, 2000, 300.0)
    fcl = FastCl(g, ells, cl1d, bin_edges=edges)
    p1d = np.asarray(fcl.sim_bandpowers(jax.random.PRNGKey(0), batch=2))
    assert p1d.shape == (2, len(edges) - 1) and np.all(np.isfinite(p1d))
    rng = np.random.default_rng(0)
    p2 = np.asarray(fcl.map_bandpowers(
        jnp.asarray(rng.standard_normal(g.shape), jnp.float32)))
    assert p2.shape == (1, len(edges) - 1) and np.all(np.isfinite(p2))


def test_load_mv_alms_call_surface(tmp_path):
    """PlanckLensing(root).load_mv_alms(est=, lmin=, lmax=) spelling
    (numerics in tests/test_surveys.py)."""
    from orphics_tpu.utils import fitsio
    from orphics_tpu.interfaces import PlanckLensing
    ls, ms = np.array([2, 3, 3]), np.array([0, 0, 2])
    d = tmp_path / "MV"
    d.mkdir()
    fitsio.write_bintable(str(d / "dat_klm.fits"),
                          {"index": (ls * ls + ls + ms + 1).astype(np.int64),
                           "real": np.ones(3), "imag": np.zeros(3)})
    alm = PlanckLensing(root=str(tmp_path)).load_mv_alms(est="MV", lmin=2,
                                                         lmax=3)
    assert alm.dtype == np.complex128 and alm.size == 10


def test_class_cls_gates_like_reference():
    """class_cls runs only with the optional classy package (the
    reference's own gate); absent classy it must raise an informative
    ImportError, not a silent wrong answer."""
    try:
        import classy  # noqa: F401
        pytest.skip("classy installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises((ImportError, ModuleNotFoundError)):
        cosmology.class_cls(lmax=100, zmin=0.2, zmax=0.4, bias=1.6)
