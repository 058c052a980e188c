"""Reference-in-the-loop numerical parity.

These tests import the *live* upstream reference (``/root/reference``,
the modules that work without pixell: ``orphics.stats``,
``orphics.cosmology``, ``orphics.io``, ``orphics.mpi``,
``orphics.algorithms``) side-by-side with ``orphics_tpu`` and assert
numerical agreement on every shared surface — the BASELINE.json north
star ("1e-4 relative vs mounted orphics").

Where behavior *intentionally* diverges (jit-static shapes, PRNG keys
instead of global numpy seeds), the divergence is pinned by an explicit
test here and documented in MIGRATION.md.
"""
import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "orphics")),
    reason="upstream reference not mounted")

if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

rstats = pytest.importorskip("orphics.stats")
rcosmo = pytest.importorskip("orphics.cosmology")
rio = pytest.importorskip("orphics.io")
rmpi = pytest.importorskip("orphics.mpi")
ralgos = pytest.importorskip("orphics.algorithms")

from orphics_tpu import stats as tstats
from orphics_tpu import cosmology as tcosmo
from orphics_tpu import io as tio
from orphics_tpu import mpi as tmpi
from orphics_tpu import algorithms as talgos


def _modmap(ny=64, nx=64, res_arcmin=8.0):
    """A radial |l| grid built with plain numpy (shared input for both
    binners; independent of either implementation's geometry code)."""
    res = np.deg2rad(res_arcmin / 60.0)
    ly = np.fft.fftfreq(ny, d=res) * 2 * np.pi
    lx = np.fft.fftfreq(nx, d=res) * 2 * np.pi
    return np.hypot(ly[:, None], lx[None, :])


# ---------------------------------------------------------------------
# stats: binning
# ---------------------------------------------------------------------

def test_bin2d_means_match_reference():
    rng = np.random.default_rng(0)
    mod = _modmap()
    data = rng.standard_normal(mod.shape)
    edges = np.linspace(0, 0.9 * mod.max(), 17)
    rb = rstats.bin2D(mod, edges)
    tb = tstats.bin2D(mod, edges)
    rc, rv = rb.bin(data)
    tc, tv = tb.bin(data)
    np.testing.assert_allclose(np.asarray(tc), rc, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tv), rv, rtol=1e-6, atol=1e-9)


def test_bin2d_weighted_and_count_match_reference():
    rng = np.random.default_rng(1)
    mod = _modmap(48, 80)
    data = rng.standard_normal(mod.shape)
    w = rng.uniform(0.5, 2.0, mod.shape)
    edges = np.linspace(0, 0.8 * mod.max(), 11)
    rb = rstats.bin2D(mod, edges)
    tb = tstats.bin2D(mod, edges)
    _, rv = rb.bin(data, weights=w)
    _, tv = tb.bin(data, weights=w)
    np.testing.assert_allclose(np.asarray(tv), rv, rtol=1e-6, atol=1e-9)
    _, _, rcount = rb.bin(data, get_count=True)
    np.testing.assert_array_equal(tb.counts, rcount)


def test_bin2d_static_shape_divergence_documented():
    """MIGRATION.md: for edges beyond the grid's max |l| the reference
    returns a data-dependent *truncated* vector (np.bincount drops empty
    trailing bins, ``orphics/stats.py:793``); Bin2D keeps the static
    len(edges)-1 shape (jit requirement) with zeros in empty bins. The
    overlapping prefix must agree."""
    rng = np.random.default_rng(2)
    mod = _modmap()
    data = rng.standard_normal(mod.shape)
    edges = np.linspace(0, 3.0 * mod.max(), 36)  # most bins empty
    rb = rstats.bin2D(mod, edges)
    tb = tstats.bin2D(mod, edges)
    with np.errstate(invalid="ignore"):
        _, rv = rb.bin(data)
    _, tv = tb.bin(data)
    tv = np.asarray(tv)
    assert tv.shape == (len(edges) - 1,)          # static here
    assert rv.shape[0] < len(edges) - 1           # truncated upstream
    np.testing.assert_allclose(tv[:rv.shape[0]], rv, rtol=1e-6, atol=1e-9)
    # the reference's bincount[1:-1] truncation also silently drops the
    # HIGHEST OCCUPIED bin (its value lands at bincount's final slot);
    # Bin2D keeps it:
    assert tv[rv.shape[0]] != 0
    assert np.all(tv[rv.shape[0] + 1:] == 0)


def test_bin1d_matches_reference():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 100, 500))
    y = rng.standard_normal(500)
    edges = np.linspace(5, 95, 10)
    rc, rv = rstats.bin1D(edges).bin(x, y)
    tc, tv = tstats.bin1D(edges).bin(x, y)
    np.testing.assert_allclose(tc, rc, rtol=1e-12)
    np.testing.assert_allclose(tv, rv, rtol=1e-10)


def test_bin_in_annuli_matches_reference():
    rng = np.random.default_rng(4)
    mod = _modmap(32, 32, res_arcmin=2.0)
    data = rng.standard_normal(mod.shape)
    edges = np.linspace(0, 0.7 * mod.max(), 8)
    rc, rv = rstats.bin_in_annuli(data, mod, edges)
    tc, tv = tstats.bin_in_annuli(data, mod, edges)
    np.testing.assert_allclose(np.asarray(tv), rv, rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------
# stats: fits and PTEs
# ---------------------------------------------------------------------

def _fit_problem(seed=5, n=40):
    rng = np.random.default_rng(seed)
    x = np.linspace(1.0, 10.0, n)
    funcs = [lambda t: np.ones_like(t), lambda t: t, lambda t: t ** 2]
    y = 2.0 + 0.5 * x - 0.1 * x ** 2 + rng.standard_normal(n) * 0.3
    A = rng.standard_normal((n, n)) * 0.05
    ycov = A @ A.T + np.eye(n) * 0.3 ** 2
    return x, y, ycov, funcs


def test_fit_linear_model_matches_reference():
    x, y, ycov, funcs = _fit_problem()
    rX, rcov, rchi, rpte = rstats.fit_linear_model(x, y, ycov, funcs)
    tX, tcov, tchi, tpte = tstats.fit_linear_model(x, y, ycov, funcs)
    np.testing.assert_allclose(np.asarray(tX), rX, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(tcov), rcov, rtol=1e-8)
    rchi = float(np.ravel(rchi)[0])
    assert abs(tchi - rchi) < 1e-8 * abs(rchi)
    assert abs(tpte - float(np.ravel(rpte)[0])) < 1e-8


def test_fit_linear_model_deproject_matches_reference():
    # deproject=True projects out the constant mode; keep the model
    # span free of it so the GLS stays well-conditioned (with a
    # constant basis function the deprojected direction is degenerate
    # and the two solvers differ by an arbitrary null-space shift).
    rng = np.random.default_rng(6)
    n = 40
    x = np.linspace(1.0, 10.0, n)
    funcs = [lambda t: t, lambda t: t ** 2, lambda t: np.sin(t)]
    y = 0.5 * x - 0.1 * x ** 2 + 0.7 * np.sin(x) + rng.standard_normal(n) * 0.3
    A = rng.standard_normal((n, n)) * 0.05
    ycov = A @ A.T + np.eye(n) * 0.3 ** 2
    rX, rcov, rchi, rpte = rstats.fit_linear_model(x, y, ycov, funcs,
                                                   deproject=True)
    tX, tcov, tchi, tpte = tstats.fit_linear_model(x, y, ycov, funcs,
                                                   deproject=True)
    np.testing.assert_allclose(np.asarray(tX), rX, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tcov), rcov, rtol=1e-6)
    assert abs(tpte - float(np.ravel(rpte)[0])) < 1e-6


def test_fit_gauss_matches_reference():
    x = np.linspace(-5, 5, 200)
    y = 3.0 * np.exp(-(x - 0.7) ** 2 / (2 * 1.3 ** 2))
    rmu, rsig, rnorm, ryn = rstats.fit_gauss(x, y, mu_guess=0.0, sigma_guess=1.0)
    tmu, tsig, tnorm, tyn = tstats.fit_gauss(x, y, mu_guess=0.0, sigma_guess=1.0)
    np.testing.assert_allclose([tmu, tsig, tnorm], [rmu, rsig, rnorm], rtol=1e-6)
    np.testing.assert_allclose(tyn, ryn, rtol=1e-10)


def test_get_pte_and_nsigma_match_reference():
    sims = np.linspace(0, 10, 101)
    for val in (2.5, 7.7, 11.0):
        assert tstats.get_pte(val, sims) == rstats.get_pte(val, sims)
    for pte in (0.9, 0.32, 0.05, 0.003):
        np.testing.assert_allclose(tstats.nsigma_from_pte(pte),
                                   rstats.nsigma_from_pte(pte), rtol=1e-12)


def test_sim_pte_statistically_matches_reference():
    rng = np.random.default_rng(7)
    A = rng.standard_normal((6, 6))
    cov = A @ A.T + np.eye(6)
    data = rng.standard_normal(6) * 1.5
    np.random.seed(11)
    rpte = rstats.sim_pte(data, cov, 40000)
    tpte = tstats.sim_pte(data, cov, 40000)
    assert abs(tpte - rpte) < 0.02  # independent RNGs; MC error ~0.005


def test_fit_cltt_power_model_matches_reference():
    ells = np.arange(200.0, 3000.0, 100.0)
    cltt = lambda l: 1e4 * (np.asarray(l, dtype=float) / 200.0) ** -2.5
    w0, ell0, alpha = 10.0, 3000.0, -4.7
    sw0 = w0 * np.pi / 180.0 / 60.0
    rng = np.random.default_rng(8)
    cls = (cltt(ells) + 1.3 * sw0 ** 2
           + 0.8 * sw0 ** 2 * (ell0 / ells) ** (-alpha))
    cls = cls * (1 + 0.01 * rng.standard_normal(len(ells)))
    sigma2 = (0.05 * cls) ** 2
    rf = rstats.fit_cltt_power(ells, cls, cltt, w0, sigma2, ell0=ell0, alpha=alpha)
    tf = tstats.fit_cltt_power(ells, cls, cltt, w0, sigma2, ell0=ell0, alpha=alpha)
    test_l = np.arange(300.0, 2500.0, 250.0)
    np.testing.assert_allclose(tf(test_l), rf(test_l), rtol=1e-4)


def test_get_sigma2_auto_and_cross_match_reference():
    ells = np.arange(100.0, 2000.0, 50.0)
    cls = 1e3 * (ells / 100.0) ** -2
    kw = dict(w0=6.0, delta_ells=50.0, fsky=0.4, ell0=1000.0, alpha=-4.0)
    np.testing.assert_allclose(
        tstats.get_sigma2(ells, cls, **kw),
        rstats.get_sigma2(ells, cls, **kw), rtol=1e-12)
    clxx = 2e3 * (ells / 100.0) ** -1.8
    clyy = 0.5e3 * (ells / 100.0) ** -2.2
    kw2 = dict(kw, w0p=20.0, ell0p=700.0, alphap=-3.0, clxx=clxx, clyy=clyy)
    np.testing.assert_allclose(
        tstats.get_sigma2(ells, cls, **kw2),
        rstats.get_sigma2(ells, cls, **kw2), rtol=1e-12)


# ---------------------------------------------------------------------
# stats: solvers / OQE / covariance utilities
# ---------------------------------------------------------------------

def _spd(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def test_solver_and_solve_match_reference():
    C = _spd(12, 9)
    x = np.random.default_rng(10).standard_normal(12)
    np.testing.assert_allclose(np.asarray(tstats.solve(C, x)),
                               rstats.solve(C, x), rtol=1e-8, atol=1e-12)
    u = np.random.default_rng(11).standard_normal((12, 2))
    np.testing.assert_allclose(np.asarray(tstats.solve(C, x, u=u)),
                               rstats.solve(C, x, u=u), rtol=1e-8, atol=1e-12)


def test_oqe_matches_reference_formula():
    """The reference OQE class crashes in its own __init__ on Python 3
    (``self.params = dcov_dict.keys()`` then ``self.params.index(...)``,
    ``orphics/stats.py:381,404``) — pin that, then check our OQE against
    the reference's *formula* built from its working ``solve``."""
    n = 10
    C = _spd(n, 12)
    rng = np.random.default_rng(13)
    dcov = {"a": _spd(n, 14) * 0.01, "b": _spd(n, 15) * 0.02}
    fids = {"a": 1.0, "b": 2.0}
    with pytest.raises(AttributeError):
        rstats.OQE(C, dcov, fids, deproject=True)
    toqe = tstats.OQE(C, dcov, fids, deproject=True)
    # reference formula: p_i = deprojected-solve(C, dC_i);
    # F_ij = 0.5 tr(p_i p_j); bias_i = tr(p_i)  (stats.py:392-407)
    ps = {p: rstats.solve(C, dcov[p]) for p in ("a", "b")}
    F = np.zeros((2, 2))
    for i, p1 in enumerate(("a", "b")):
        for j, p2 in enumerate(("a", "b")):
            F[i, j] = 0.5 * np.trace(ps[p1] @ ps[p2])
    np.testing.assert_allclose(toqe.Fisher, F, rtol=1e-8)
    Finv = np.linalg.inv(F)
    np.testing.assert_allclose(toqe.marg_errors, np.sqrt(np.diag(Finv)),
                               rtol=1e-8)
    data = rng.standard_normal(n)
    cinvdat = rstats.solve(C, data)
    vec = np.array([data.T @ ps[p] @ cinvdat - np.trace(ps[p])
                    for p in ("a", "b")])
    expected = 0.5 * Finv @ vec
    est = toqe.estimate(data)
    for i, p in enumerate(("a", "b")):
        np.testing.assert_allclose(est[p], fids[p] + expected[i], rtol=1e-7)


def test_cinv_updater_matches_reference():
    covs = [_spd(8, s) for s in (16, 17)]
    cinvs = [np.linalg.inv(c) for c in covs]
    logdets = [np.linalg.slogdet(c)[1] for c in covs]
    prof = np.random.default_rng(18).standard_normal(8)
    rcu = rstats.CinvUpdater(cinvs, logdets, prof)
    tcu = tstats.CinvUpdater(cinvs, logdets, prof)
    for idx in (0, 1):
        for amp in (0.0, 0.5, 2.0):
            rc, rl = rcu.get_cinv(idx, amp)
            tc, tl = tcu.get_cinv(idx, amp)
            np.testing.assert_allclose(np.asarray(tc), rc, rtol=1e-8)
            np.testing.assert_allclose(tl, rl, rtol=1e-10)


def test_sm_update_matches_reference():
    Ainv = np.linalg.inv(_spd(7, 19))
    u = np.random.default_rng(20).standard_normal(7)
    ra, rd = rstats.sm_update(Ainv, u)
    ta, td = tstats.sm_update(Ainv, u)
    np.testing.assert_allclose(np.asarray(ta), ra, rtol=1e-8)
    np.testing.assert_allclose(td, rd, rtol=1e-10)
    v = np.random.default_rng(21).standard_normal(7)
    ra, rd = rstats.sm_update(Ainv, u, v=v)
    ta, td = tstats.sm_update(Ainv, u, v=v)
    np.testing.assert_allclose(np.asarray(ta), ra, rtol=1e-8)


def test_eig_pow_matches_reference():
    C = _spd(9, 22)
    for expo in (-1, -0.5, 2):
        np.testing.assert_allclose(np.asarray(tstats.eig_pow(C, expo)),
                                   rstats.eig_pow(C.copy(), expo),
                                   rtol=1e-8, atol=1e-10)


def test_cov2corr_matches_reference():
    C = _spd(6, 23)
    np.testing.assert_allclose(np.asarray(tstats.cov2corr(C)),
                               rstats.cov2corr(C), rtol=1e-12)


def test_correlated_hybrid_matrix_matches_reference():
    # keep |corr| < cap_off: see MIGRATION.md — the reference's cap-to-
    # 0.99 branch is a no-op (writes through a fancy-indexing copy,
    # orphics/stats.py:560-564); ours actually caps. Below the cap the
    # two agree exactly.
    d = np.diag(np.random.default_rng(24).uniform(0.5, 2.0, 6))
    theory = _spd(6, 25)
    corr = rstats.cov2corr(theory)
    assert np.abs(corr - np.eye(6)).max() < 0.99
    np.testing.assert_allclose(
        np.asarray(tstats.correlated_hybrid_matrix(d, theory_covmat=theory)),
        rstats.correlated_hybrid_matrix(d, theory_covmat=theory),
        rtol=1e-10)


def test_extrapolate_power_law_matches_reference():
    x = np.linspace(1, 50, 60)
    y = 3.0 * x ** 1.7 * (1 + 0.01 * np.sin(x))
    x_extra = np.array([60.0, 80.0, 100.0])
    rx, ry = rstats.extrapolate_power_law(x, y, x_extra)
    tx, ty = tstats.extrapolate_power_law(x, y, x_extra)
    np.testing.assert_allclose(tx, rx, rtol=1e-12)
    np.testing.assert_allclose(ty, ry, rtol=1e-6)


def test_npspace_and_alpha_confidence_match_reference():
    np.testing.assert_allclose(tstats.npspace(2, 100, 17, "log"),
                               rstats.npspace(2, 100, 17, "log"), rtol=1e-13)
    np.testing.assert_allclose(tstats.npspace(2, 100, 17, "lin"),
                               rstats.npspace(2, 100, 17, "lin"), rtol=1e-13)
    for c in (0.683, 0.95, 0.997):
        np.testing.assert_allclose(tstats.alpha_from_confidence(c),
                                   rstats.alpha_from_confidence(c), rtol=1e-13)


def test_inverse_transform_sampling_matches_reference():
    """The inverse-CDF maps agree to O(grid spacing): the reference
    builds the CDF by left-Riemann cumsum, ours by trapezoid."""
    x = np.linspace(-4, 4, 4001)
    pdf = np.exp(-0.5 * x ** 2)
    rits = rstats.InverseTransformSampling(x, pdf)
    tits = tstats.InverseTransformSampling(x, pdf)
    u = np.linspace(0.02, 0.98, 25)
    r_inv = rits.icdf(u)
    t_inv = np.interp(u, np.asarray(tits._cdf), np.asarray(tits._x))
    np.testing.assert_allclose(t_inv, r_inv, atol=5 * (x[1] - x[0]))


# ---------------------------------------------------------------------
# stats: Stats container and get_stats
# ---------------------------------------------------------------------

def test_get_stats_matches_reference():
    rng = np.random.default_rng(26)
    vecs = rng.standard_normal((64, 5))
    rd = rstats.get_stats(vecs)
    td = tstats.get_stats(vecs)
    for k in ("mean", "cov", "covmean", "err", "errmean", "corr"):
        np.testing.assert_allclose(np.asarray(td[k]), rd[k], rtol=1e-6,
                                   atol=1e-12, err_msg=k)


def test_stats_container_matches_reference():
    rng = np.random.default_rng(27)
    rS = rstats.Stats()   # serial fakeMpiComm
    tS = tstats.Stats()
    stack = np.zeros((4, 4))
    for i in range(32):
        v = rng.standard_normal(3)
        arr = rng.standard_normal((4, 4))
        rS.add_to_stats("v", v)
        tS.add_to_stats("v", v)
        rS.add_to_stack("s", arr)
        tS.add_to_stack("s", arr)
        stack += arr
    rS.get_stats(verbose=False)
    rS.get_stacks(verbose=False)
    tS.get_stats()
    tS.get_stacks()
    for k in ("mean", "cov", "err", "errmean", "covmean", "corr"):
        np.testing.assert_allclose(np.asarray(tS.stats["v"][k]),
                                   rS.stats["v"][k], rtol=1e-6, atol=1e-12,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(tS.stacks["s"]), rS.stacks["s"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tS.stacks["s"]), stack / 32,
                               rtol=1e-6)


# ---------------------------------------------------------------------
# cosmology: noise models
# ---------------------------------------------------------------------

def test_noise_func_matches_reference():
    ells = np.arange(2.0, 5000.0, 7.0)
    for kw in (dict(fwhm=1.4, rms_noise=10.0),
               dict(fwhm=7.0, rms_noise=30.0, lknee=3000.0, alpha=-4.7),
               dict(fwhm=2.2, rms_noise=5.0, lknee=700.0, alpha=-3.0,
                    dimensionless=True)):
        np.testing.assert_allclose(
            np.asarray(tcosmo.noise_func(ells, **kw)),
            rcosmo.noise_func(ells, **kw), rtol=2e-5)


def test_getAtmosphere_matches_reference():
    for beam in (1.4, 2.2, 5.0, 9.0):
        rvals = rcosmo.getAtmosphere(beamFWHMArcmin=beam)
        tvals = tcosmo.getAtmosphere(beamFWHMArcmin=beam)
        np.testing.assert_allclose(tvals, rvals, rtol=1e-10)
    rfns = rcosmo.getAtmosphere(returnFunctions=True)
    tfns = tcosmo.getAtmosphere(returnFunctions=True)
    for rf, tf in zip(rfns, tfns):
        for b in (0.9, 3.3, 6.1):
            np.testing.assert_allclose(tf(b), rf(b), rtol=1e-10)


def test_noise_pad_infinity_matches_reference():
    nl = lambda l: 1e-4 * np.asarray(l, dtype=float) ** 2
    rp = rcosmo.noise_pad_infinity(nl, 100, 3000)
    tp = tcosmo.noise_pad_infinity(nl, 100, 3000)
    ells = np.array([50.0, 100.0, 1500.0, 3000.0, 3001.0])
    np.testing.assert_allclose(tp(ells), rp(ells))


# ---------------------------------------------------------------------
# mpi
# ---------------------------------------------------------------------

def test_mpi_distribute_matches_reference():
    for ntasks, ncores in ((10, 4), (8, 4), (7, 7), (100, 13), (5, 8)):
        kw = dict(allow_empty=True) if ncores > ntasks else {}
        rcounts, rlists = rmpi.mpi_distribute(ntasks, ncores, **kw)
        tcounts, tlists = tmpi.mpi_distribute(ntasks, ncores, **kw)
        np.testing.assert_array_equal(tcounts, rcounts)
        assert tlists == rlists


def test_fake_mpi_comm_surface_matches_reference():
    rc, tc = rmpi.fakeMpiComm(), tmpi.fakeMpiComm()
    assert tc.Get_rank() == rc.Get_rank() == 0
    assert tc.Get_size() == rc.Get_size() == 1


# ---------------------------------------------------------------------
# algorithms
# ---------------------------------------------------------------------

def test_vectorized_bisection_search_matches_reference():
    # positive targets only: the reference's relative-tolerance sign
    # convention ((x(y)-x)/x, orphics/algorithms.py:25) inverts the
    # bisection update for x<0 and hangs; we share the convention.
    func = lambda y: y ** 3 + y        # strictly increasing
    x = np.array([0.5, 3.0, 9.0, 15.0, 40.0])
    rroots = ralgos.vectorized_bisection_search(
        x.copy(), func, [0.0, 5.0], "increasing", rtol=1e-7, verbose=False)
    troots = talgos.vectorized_bisection_search(
        x.copy(), func, [0.0, 5.0], "increasing", rtol=1e-7, verbose=False)
    np.testing.assert_allclose(np.asarray(troots), np.asarray(rroots),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(func(np.asarray(troots)), x, rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------
# io
# ---------------------------------------------------------------------

def test_get_hash_matches_reference(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"orphics parity \x00\x01\x02" * 100)
    assert tio.get_hash(str(p)) == rio.get_hash(str(p))


def test_hash_dict_matches_reference():
    d = {"b": [1, 2, 3], "a": "x", "c": {"n": 4.5, "m": None}}
    assert tio.hash_dict(d) == rio.hash_dict(d)


def test_save_cols_matches_reference(tmp_path):
    x = np.linspace(0, 1, 7)
    y = x ** 2
    rp, tp_ = tmp_path / "r.txt", tmp_path / "t.txt"
    rio.save_cols(str(rp), (x, y))
    tio.save_cols(str(tp_), (x, y))
    np.testing.assert_allclose(np.loadtxt(str(tp_)), np.loadtxt(str(rp)))


def test_config_parsing_matches_reference(tmp_path):
    """The reference's own ini stack is broken on Python 3.12
    (``SafeConfigParser`` was removed, ``io.py:259``; and
    ``bin_edges_from_config`` imports the long-gone ``orphics.tools``
    path, ``io.py:266``) — pin both, then check our parser reproduces
    the reference *semantics* (npspace over the section values)."""
    ini = tmp_path / "cfg.ini"
    ini.write_text("[bins]\nspacing = log\nleft_edge = 10\n"
                   "right_edge = 5000\nnum_bins = 25\n"
                   "[lists]\nvals = 1.5,2.5,10\nnames = a,b,c\n")
    with pytest.raises(ImportError):
        rio.config_from_file(str(ini))
    tcfg = tio.config_from_file(str(ini))
    with pytest.raises((ImportError, ModuleNotFoundError)):
        rio.bin_edges_from_config(tcfg, "bins")
    np.testing.assert_allclose(tio.bin_edges_from_config(tcfg, "bins"),
                               rstats.npspace(10, 5000, 25, scale="log"),
                               rtol=1e-13)
    assert tio.list_from_config(tcfg, "lists", "vals") == [1.5, 2.5, 10.0]
    assert (tio.list_strings_from_config(tcfg, "lists", "names")
            == ["a", "b", "c"])


def test_join_nums_and_list_from_string_match_reference():
    assert tio.join_nums([1, 2.5, 3]) == rio.join_nums([1, 2.5, 3])
    s = "1.0, 2.25,3"
    # reference splits on ',' and floats each piece
    assert tio.list_from_string(s) == rio.list_from_string(s)
