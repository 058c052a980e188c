"""Reference-in-the-loop parity for ``orphics.lensing`` (on the numpy
pixell shim, with displace_map backed by scipy's independent cubic
B-spline): kappa<->phi calculus, the Taylens algorithm, spline
displacement, the lensed pixel-pixel covariance, and small utilities —
each run side-by-side with the native orphics_tpu implementations on
identical inputs."""
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

rlensing = pytest.importorskip("orphics.lensing")
from pixell import enmap as shim_enmap  # noqa: E402
from pixell import lensing as shim_lensing  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from orphics_tpu import lensing as tlensing  # noqa: E402
from orphics_tpu.geometry import rect_geometry  # noqa: E402
from orphics_tpu.models import lensing as mlensing  # noqa: E402
from orphics_tpu.models import nfwfit as mnfw  # noqa: E402
from orphics_tpu.ops import fourier as F  # noqa: E402


@pytest.fixture(scope="module")
def geoms():
    width, res = 8.0, 4.0
    arc = np.pi / 180 / 60
    n = int(width * 60 / res)
    shape, wcs = shim_enmap.geometry(
        pos=[[-width / 2 * np.pi / 180, -width / 2 * np.pi / 180],
             [width / 2 * np.pi / 180, width / 2 * np.pi / 180]],
        res=res * arc)
    geom = rect_geometry(width_deg=width, px_res_arcmin=res)
    assert shape == (geom.ny, geom.nx) == (n, n)
    return shape, wcs, geom


def _smooth_field(geom, seed, lmax_frac=0.25, amp=1.0):
    """Band-limited Gaussian field (smooth enough for interpolation
    comparisons)."""
    rng = np.random.default_rng(seed)
    white = rng.standard_normal(geom.shape)
    ml = geom.modlmap_np()
    filt = np.exp(-(ml / (lmax_frac * ml.max())) ** 2)
    return np.real(np.fft.ifft2(np.fft.fft2(white) * filt)) * amp


def test_kappa_phi_calculus_matches_reference(geoms):
    shape, wcs, geom = geoms
    kappa = _smooth_field(geom, 0)
    ek = shim_enmap.enmap(kappa, wcs)
    rphi, rfphi = rlensing.kappa_to_phi(ek, ek.modlmap(), return_fphi=True)
    tphi = np.asarray(mlensing.kappa_to_phi(jnp.asarray(kappa), geom))
    np.testing.assert_allclose(tphi, np.asarray(rphi), rtol=1e-5,
                               atol=1e-6 * np.abs(np.asarray(rphi)).max())


def test_fkappa_to_fphi_matches_reference(geoms):
    shape, wcs, geom = geoms
    rng = np.random.default_rng(1)
    fk = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
    modlmap = np.asarray(shim_enmap.modlmap(shape, wcs))
    rf = rlensing.fkappa_to_fphi(fk.copy(), modlmap)
    tf = np.asarray(mlensing.fkappa_to_fphi(jnp.asarray(fk), geom))
    np.testing.assert_allclose(tf, np.asarray(rf), rtol=2e-5,
                               atol=1e-7 * np.abs(rf).max())


def test_taylens_matches_reference_flat_taylens(geoms):
    """Same phi, same input map: the reference flat_taylens (Louis
    algorithm on the shim) vs the native taylens fed the identical
    Fourier-gradient deflection, orders 3 and 5."""
    shape, wcs, geom = geoms
    kappa = _smooth_field(geom, 2, amp=0.02)
    imap = _smooth_field(geom, 3)
    phi = np.asarray(mlensing.kappa_to_phi(jnp.asarray(kappa), geom))
    alpha = np.asarray(mlensing.alpha_from_kappa(jnp.asarray(kappa), geom))
    ephi = shim_enmap.enmap(phi, wcs)
    eimap = shim_enmap.enmap(imap, wcs)
    scale = np.std(imap)
    for order in (3, 5):
        rl = np.asarray(rlensing.flat_taylens(ephi, eimap,
                                              taylor_order=order))
        tl = np.asarray(mlensing.taylens(jnp.asarray(imap),
                                         jnp.asarray(alpha), geom,
                                         order=order))
        np.testing.assert_allclose(tl, rl, atol=2e-4 * scale,
                                   err_msg=f"order {order}")


def test_spline_displacement_matches_scipy(geoms):
    """lens_map_spline vs scipy map_coordinates (grid-wrap cubic
    B-spline) at the same absolute pixel positions — an INDEPENDENT
    interpolation implementation."""
    shape, wcs, geom = geoms
    kappa = _smooth_field(geom, 4, amp=0.02)
    imap = _smooth_field(geom, 5)
    alpha = np.asarray(mlensing.alpha_from_kappa(jnp.asarray(kappa), geom))
    iy, ix = np.mgrid[0:shape[0], 0:shape[1]].astype(float)
    pix = np.stack([iy + alpha[0] / geom.dy, ix + alpha[1] / geom.dx])
    ref = np.asarray(shim_lensing.displace_map_abs_pix(
        shim_enmap.enmap(imap, wcs), pix, order=3))
    got = np.asarray(mlensing.lens_map_spline(jnp.asarray(imap),
                                              jnp.asarray(alpha), geom,
                                              order=3))
    scale = np.std(imap)
    np.testing.assert_allclose(got, ref, atol=2e-3 * scale)


def test_lens_cov_matches_reference(geoms):
    """Reference lens_cov (row/column displace on the shim) vs the
    native vmapped lens_cov on a small stamp, incl. the beam."""
    width, res = 1.0, 4.0                       # 15x15 stamp
    arc = np.pi / 180 / 60
    shape, wcs = shim_enmap.geometry(
        pos=[[-width / 2 * np.pi / 180, -width / 2 * np.pi / 180],
             [width / 2 * np.pi / 180, width / 2 * np.pi / 180]],
        res=res * arc)
    geom = rect_geometry(width_deg=width, px_res_arcmin=res)
    assert shape == (geom.ny, geom.nx)
    rng = np.random.default_rng(6)
    A = rng.standard_normal((geom.npix, geom.npix)) * 0.1
    ucov = A @ A.T + np.eye(geom.npix)
    kappa = _smooth_field(geom, 7, amp=0.05)
    alpha = np.asarray(mlensing.alpha_from_kappa(jnp.asarray(kappa), geom))
    kbeam = np.asarray(F.gauss_beam(jnp.asarray(geom.modlmap_np()), 10.0))
    # both sides take the sky-coordinate deflection field (real
    # pixell displace_map semantics)
    rcov = np.asarray(rlensing.lens_cov(
        shape, wcs, shim_enmap.enmap(ucov.copy(), wcs), alpha,
        lens_order=3, kbeam=shim_enmap.enmap(kbeam, wcs)))
    tcov = np.asarray(mnfw.lens_cov(jnp.asarray(ucov), jnp.asarray(alpha),
                                    geom, lens_order=3,
                                    kbeam=jnp.asarray(kbeam)))
    scale = np.abs(rcov).max()
    np.testing.assert_allclose(tcov, rcov, atol=5e-3 * scale)


def test_small_utilities_match_reference():
    # rayleigh
    th = np.linspace(0.01, 5.0, 50)
    np.testing.assert_allclose(np.asarray(mnfw.rayleigh(th, 1.3)),
                               rlensing.rayleigh(th, 1.3), rtol=1e-6)
    # fillLowEll
    ells = np.arange(50, 500, 10.0)
    cls = 1.0 / ells
    re_, rc = rlensing.fillLowEll(ells, cls, 80)
    te_, tc = tlensing.fillLowEll(ells, cls, 80)
    np.testing.assert_allclose(te_, re_)
    np.testing.assert_allclose(tc, rc)
    # sanitizePower
    nl = np.array([1.0, -1.0, 2.0, np.inf, 3.0, 0.0, 4.0])
    rs = rlensing.sanitizePower(nl.copy())
    ts = tlensing.sanitizePower(nl.copy())
    np.testing.assert_allclose(np.asarray(ts), rs, rtol=1e-10)


def test_flat_lensing_sims_get_sim_end_to_end(geoms, monkeypatch):
    """The full reference FlatLensingSims.get_sim chain (GRF CMB ->
    alpha from kappa -> order-5 spline displacement [shim: scipy] ->
    beam -> + noise, lensing.py:499-516) vs the native
    FlatLensingSims.get_sim, with IDENTICAL (unlensed, kappa, noise)
    maps injected on both sides. Caveat (PARITY.md): the shim's
    displace_map is scipy's spline interpolator, not pixell's compiled
    bicubic — boundary handling differs in the outermost pixels, so
    the comparison trims a 8-pixel border."""
    import types
    import orphics.cosmology as rcosmo
    from orphics_tpu.models.theory import default_theory as t_theory

    shape, wcs, geom = geoms
    rth = rcosmo.default_theory(lpad=9000)
    tth = t_theory(lpad=9000)

    rls = rlensing.FlatLensingSims(shape, wcs, rth, beam_arcmin=1.4,
                                   noise_uk_arcmin=0.0)
    # draw the shared inputs from the REFERENCE generators
    np.random.seed(11)
    unlensed = np.asarray(rls.get_unlensed(seed=1))
    kappa = np.asarray(rls.get_kappa(seed=2)) * 2.0  # boost the signal
    noise = np.zeros_like(unlensed)

    monkeypatch.setattr(rls, "update_kappa", rls.update_kappa)
    rls.mgen.get_map = lambda seed=None: shim_enmap.ndmap(unlensed.copy(),
                                                          wcs)
    rls.kgen.get_map = lambda seed=None: shim_enmap.ndmap(kappa.copy(), wcs)
    rls.ngen.get_map = lambda seed=None: shim_enmap.ndmap(noise.copy(), wcs)
    r_obs = np.asarray(rls.get_sim(lens_order=5))

    tls = mlensing.FlatLensingSims(geom, tth, beam_arcmin=1.4,
                                   noise_uk_arcmin=0.0, lens_order=5,
                                   dtype=jnp.float64)
    tls.get_unlensed = lambda key: jnp.asarray(unlensed)
    tls.get_kappa = lambda key: jnp.asarray(kappa)
    tls.ngen = types.SimpleNamespace(get_map=lambda key: jnp.asarray(noise))
    import jax
    t_obs = np.asarray(tls.get_sim(jax.random.PRNGKey(0)))

    r_in = np.squeeze(r_obs)[8:-8, 8:-8]
    t_in = np.squeeze(t_obs)[8:-8, 8:-8]
    scale = np.std(r_in)
    assert scale > 0
    np.testing.assert_allclose(t_in, r_in, atol=2e-3 * scale)
    # the chain did something: observed differs from beamed-unlensed
    assert np.std(np.squeeze(r_obs) - unlensed) > 0.01 * scale
