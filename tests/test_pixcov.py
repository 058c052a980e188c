"""pixcov tests: the conditional-Gaussian identities validate the whole
chain (stamp covariance -> inverse -> Woodbury -> mean/fluctuation fill).
For a periodic GRF drawn from the same covariance model, the max-like
infill is the exact conditional mean, so its residual variance must equal
diag(inv(Cinv[hole,hole])) — a closed-form end-to-end check."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orphics_tpu import Geometry, rect_geometry
from orphics_tpu.geometry import arcmin
from orphics_tpu.ops import fourier as F
from orphics_tpu.models import pixcov as pc, grf, theory


@pytest.fixture(scope="module")
def th():
    return theory.default_theory()


def test_ps2d_to_mat_is_circulant_cov():
    """Covariance of periodic GRF sims matches ps2d_to_mat."""
    n = 8
    g = Geometry(n, n, 2 * arcmin, 2 * arcmin)
    ells = np.arange(2000)
    cl = 100.0 / (ells + 30.0) ** 2
    c2d = F.interp1d_to_2d(ells, cl, g, dtype=jnp.float64)
    mat = np.asarray(pc.ps2d_to_mat(c2d, g))
    # symmetry + circulant structure
    np.testing.assert_allclose(mat, mat.T, atol=1e-12)
    # MC covariance
    mgen = grf.MapGen(g, cl[None, None], dtype=jnp.float64)
    nsims = 4000
    maps = np.asarray(jax.vmap(mgen.get_map)(
        jax.random.split(jax.random.PRNGKey(0), nsims))).reshape(nsims, -1)
    emp = maps.T @ maps / nsims
    scale = np.abs(mat).max()
    assert np.abs(emp - mat).max() / scale < 0.12, np.abs(emp - mat).max() / scale


def test_conditional_mean_variance_identity(th):
    """Residual variance of the mean infill equals inv(Cinv[hole,hole])."""
    n = 16
    g = Geometry(n, n, 2 * arcmin, 2 * arcmin)
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    scov = pc.scov_from_theory(g, th, ncomp=1)
    noise_var = (10.0 * arcmin) ** 2 / g.pixsize
    pcov = jnp.asarray(scov) + noise_var * jnp.eye(n * n)
    m1, m2 = pc.get_geometry_regions(1, n, 2 * arcmin, 6 * arcmin)
    covsqrt, meanmul = pc.make_geometry(pcov, jnp.asarray(m1), jnp.asarray(m2),
                                        deproject=False, ncomp=1)
    pred_var = np.diag(np.asarray(covsqrt @ covsqrt.T))

    mgen = grf.MapGen(g, cltt[None, None], dtype=jnp.float64)

    @jax.jit
    def sim_residual(key):
        ks, kn = jax.random.split(key)
        m = mgen.get_map(ks) + jax.random.normal(kn, g.shape) * np.sqrt(noise_var)
        flat = m.reshape(-1)
        mean = meanmul @ flat[jnp.asarray(m2)]
        return flat[jnp.asarray(m1)] - mean

    nsims = 3000
    res = np.asarray(jax.vmap(sim_residual)(
        jax.random.split(jax.random.PRNGKey(1), nsims)))
    emp_var = res.var(axis=0, ddof=1)
    ratio = emp_var / pred_var
    assert np.abs(ratio.mean() - 1) < 0.05, ratio
    assert np.all(np.abs(ratio - 1) < 0.25), ratio
    # residual mean is zero (unbiased)
    err = res.std(axis=0) / np.sqrt(nsims)
    assert np.all(np.abs(res.mean(axis=0)) < 5 * err)


def test_inpaint_full_pipeline_statistics(th):
    """Inpainted map power matches input power (GRF + noise, many holes)."""
    geom = rect_geometry(width_arcmin=128 * 2.0, px_res_arcmin=2.0)
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    mgen = grf.MapGen(geom, cltt[None, None])
    noise = 10.0
    rng = np.random.default_rng(2)
    ncoords = 12
    coords = rng.integers(30, 98, size=(ncoords, 2))
    beam_fn = lambda l: F.gauss_beam(l, 1.4)

    from orphics_tpu.ops.binning import Bin2D
    edges = np.arange(300, 3000, 300.0)
    binner = Bin2D(geom.modlmap_np(), edges)
    from orphics_tpu.models.noise import white_noise

    def one(key):
        ks, kn, kp = jax.random.split(key, 3)
        sig = F.kfilter(mgen.get_map(ks), F.gauss_beam(geom.modlmap(), 1.4), geom)
        m = sig + white_noise(kn, geom, noise)
        filled = pc.inpaint(m, coords, geom, th, beam_fn,
                            noise_uk_arcmin=noise, hole_radius_arcmin=4.0,
                            npix_context=24, key=kp)
        k1 = jnp.fft.fft2(m)
        k2 = jnp.fft.fft2(filled)
        norm = geom.area / geom.npix ** 2
        _, p_orig = binner.bin((k1.conj() * k1).real * norm)
        _, p_fill = binner.bin((k2.conj() * k2).real * norm)
        return p_orig, p_fill

    nsims = 8
    keys = jax.random.split(jax.random.PRNGKey(3), nsims)
    p_orig, p_fill = jax.vmap(one)(keys)
    p_orig, p_fill = np.asarray(p_orig), np.asarray(p_fill)
    ratio = p_fill.mean(axis=0) / p_orig.mean(axis=0)
    # inpainting must not bias the spectrum at the >1% level
    assert np.all(np.abs(ratio - 1) < 0.015), ratio


def test_extract_insert_roundtrip():
    geom = rect_geometry(width_arcmin=64 * 2.0, px_res_arcmin=2.0)
    rng = np.random.default_rng(4)
    imap = jnp.asarray(rng.standard_normal((1,) + geom.shape))
    coords = jnp.asarray([[20, 20], [40, 45]])
    stamps = pc.extract_stamps(imap, coords, 10)
    assert stamps.shape == (2, 1, 10, 10)
    np.testing.assert_allclose(np.asarray(stamps[0, 0]),
                               np.asarray(imap[0, 15:25, 15:25]))
    out = pc.insert_stamps(imap, stamps * 2.0, coords, 10)
    np.testing.assert_allclose(np.asarray(out[0, 15:25, 15:25]),
                               2 * np.asarray(imap[0, 15:25, 15:25]))
    # untouched elsewhere
    np.testing.assert_allclose(np.asarray(out[0, 0:10, 0:10]),
                               np.asarray(imap[0, 0:10, 0:10]))


def test_pol_geometry_shapes(th):
    n = 12
    g = Geometry(n, n, 2 * arcmin, 2 * arcmin)
    scov = pc.scov_from_theory(g, th, ncomp=3)
    assert scov.shape == (3 * n * n, 3 * n * n)
    m1, m2 = pc.get_geometry_regions(3, n, 2 * arcmin, 5 * arcmin)
    ivs = jnp.ones((2, n, n)) * 500.0
    covsqrts, meanmuls = pc.make_geometries_batched(scov, ivs, m1, m2, ncomp=3)
    assert covsqrts.shape == (2, len(m1), len(m1))
    assert meanmuls.shape == (2, len(m1), len(m2))
    assert np.all(np.isfinite(np.asarray(covsqrts)))
    stamps = jnp.zeros((2, 3, n, n)).at[:, :, 5, 5].set(1.0)
    filled = pc.inpaint_stamps_batched(stamps, covsqrts, meanmuls, m1, m2,
                                       keys=jax.random.split(jax.random.PRNGKey(5), 2))
    assert filled.shape == stamps.shape
    assert np.all(np.isfinite(np.asarray(filled)))


def test_inpaint_skips_edge_sources(th):
    """Review regression: lax.dynamic_slice clamps, so an edge stamp
    is mis-centered and the infill corrupts good pixels — edge sources
    must be skipped with a warning, like the reference."""
    geom = rect_geometry(width_arcmin=64 * 2.0, px_res_arcmin=2.0)
    imap = jnp.zeros(geom.shape)
    coords = np.array([[2, 2], [geom.ny // 2, geom.nx // 2]])
    with pytest.warns(UserWarning, match="edge"):
        out = pc.inpaint(imap, coords, geom, th,
                         lambda l: np.ones_like(np.asarray(l)),
                         noise_uk_arcmin=10.0, npix_context=20,
                         key=jax.random.PRNGKey(0))
    assert out.shape == imap.shape
    assert np.isfinite(np.asarray(out)).all()
