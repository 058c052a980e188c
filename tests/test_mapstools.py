"""Tests for the map-space toolkit tail: aperture photometry, matched
filter, pure-B purification, CG inpainting, misc utilities."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orphics_tpu import rect_geometry, Geometry
from orphics_tpu.geometry import arcmin
from orphics_tpu.ops import fourier as F
from orphics_tpu.ops.binning import Bin2D
from orphics_tpu.models import mapstools as mt, grf, theory, lensing


@pytest.fixture(scope="module")
def geom():
    return rect_geometry(width_arcmin=128 * 2.0, px_res_arcmin=2.0)


@pytest.fixture(scope="module")
def th():
    return theory.default_theory()


def test_flux_aperture_photometry(geom):
    """A compact source of known integrated flux is recovered on a flat
    background."""
    modr = geom.modrmap(jnp.float64)
    sig = 3 * arcmin
    src = jnp.exp(-0.5 * modr ** 2 / sig ** 2)
    true_flux = float(jnp.sum(src * geom.pixsizemap(jnp.float64)))
    thumb = src + 7.0  # constant background
    f = mt.flux(thumb[None], aperture_radius=10 * arcmin, geom=geom)
    # annulus subtraction removes the background; small aperture leakage
    assert abs(float(f[0]) / true_flux - 1) < 0.05, (float(f[0]), true_flux)


def test_matched_filter_amplitude(geom, th):
    """MF recovers the amplitude of an injected template in GRF noise,
    within the predicted variance."""
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    n2d = F.interp1d_to_2d(ells, cltt, geom, dtype=jnp.float64) + 1e-20
    kmask = F.mask_kspace(geom, lmin=80, lmax=4000, dtype=jnp.float64)
    modr = geom.modrmap(jnp.float64)
    template = jnp.exp(-0.5 * modr ** 2 / (5 * arcmin) ** 2)
    mgen = grf.MapGen(geom, cltt[None, None], dtype=jnp.float64)
    amp_true = 50.0
    mf = mt.MatchedFilter(geom, template=template, noise_power=n2d)

    @jax.jit
    def one(key):
        noise = mgen.get_map(key)
        a, v = mf.apply(imap=noise + amp_true * template, kmask=kmask)
        return a, v

    amps, variances = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), 32))
    amps = np.asarray(amps)
    pred_sigma = np.sqrt(float(variances[0]))
    assert abs(amps.mean() - amp_true) < 4 * pred_sigma / np.sqrt(32)
    assert 0.5 < amps.std() / pred_sigma < 2.0


def test_pure_b_leakage_suppression(geom, th):
    """E-only sims through an apodized window: the pure estimator must
    suppress E->B leakage power by a large factor vs the standard
    estimator (Smith 2006)."""
    from orphics_tpu.ops.windows import get_taper
    lmax = 5000
    ells = np.arange(lmax + 1)
    ps = np.zeros((3, 3, lmax + 1))
    ps[1, 1] = np.asarray(th.lCl("EE", ells))  # E only, no B
    ps[0, 0] = np.asarray(th.lCl("TT", ells))
    mgen = grf.MapGen(geom, ps, dtype=jnp.float64)
    window, _ = get_taper(geom, taper_percent=18.0)
    window = window.astype(jnp.float64)
    pur = mt.Purify(geom, window)
    edges = np.arange(300, 2500, 200.0)
    binner = Bin2D(geom.modlmap_np(), edges)
    norm = geom.area / geom.npix ** 2

    @jax.jit
    def one(key):
        iqu = mgen.get_map(key) * window[None]
        _, _, fB_std = mt.iqu_to_pure_lteb(iqu[0], iqu[1], iqu[2], geom,
                                           pur.windict, method="standard")
        _, _, fB_pure = mt.iqu_to_pure_lteb(iqu[0], iqu[1], iqu[2], geom,
                                            pur.windict, method="pure")
        _, b_std = binner.bin((fB_std.conj() * fB_std).real * norm)
        _, b_pure = binner.bin((fB_pure.conj() * fB_pure).real * norm)
        return b_std, b_pure

    nsims = 16
    b_std, b_pure = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(2), nsims))
    r = np.asarray(b_pure).mean(axis=0) / np.asarray(b_std).mean(axis=0)
    # first-principles pure estimator: leakage suppressed by >100x per bin
    assert np.all(r < 0.01), r
    assert r.mean() < 0.002, r


def test_inpaint_cg_constrained_realization(geom, th):
    """CG inpainting restores hole statistics: filled map power matches
    the unmasked map power."""
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    noise = 1e-4 * cltt.max()
    p2d = F.interp1d_to_2d(ells, cltt, geom, dtype=jnp.float64) + noise
    mgen = grf.MapGen(geom, (cltt + noise)[None, None], dtype=jnp.float64)
    modr = geom.modrmap_np()
    mask = jnp.asarray((modr > 10 * arcmin).astype(np.float64))

    @jax.jit
    def one(key):
        k1, k2 = jax.random.split(key)
        imap = mgen.get_map(k1)
        rand = mgen.get_map(k2)
        filled = mt.inpaint_cg(imap * mask, rand, mask, p2d, geom, eps=1e-6)
        norm = geom.area / geom.npix ** 2
        kf = jnp.fft.fft2(filled)
        ko = jnp.fft.fft2(imap)
        return ((kf.conj() * kf).real * norm, (ko.conj() * ko).real * norm)

    edges = np.arange(300, 2500, 300.0)
    binner = Bin2D(geom.modlmap_np(), edges)
    nsims = 8
    pf, po = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(3), nsims))
    _, bf = binner.bin(jnp.asarray(np.asarray(pf).mean(axis=0)))
    _, bo = binner.bin(jnp.asarray(np.asarray(po).mean(axis=0)))
    ratio = np.asarray(bf) / np.asarray(bo)
    assert np.all(np.abs(ratio - 1) < 0.05), ratio


def test_downsample_power_smooths(geom):
    rng = np.random.default_rng(5)
    base = F.interp1d_to_2d(np.arange(12000), 1e3 / (np.arange(12000) + 100.0),
                            geom, dtype=jnp.float64)
    noisy = jnp.asarray(np.asarray(base) * rng.uniform(0.5, 1.5, geom.shape))
    sm = mt.downsample_power(noisy, geom, ndown=8)
    # smoother: variance of log-residual reduced
    r_noisy = np.asarray(noisy / base)
    r_sm = np.asarray(sm / base)
    assert r_sm.std() < 0.5 * r_noisy.std()


def test_symmat_roundtrip():
    a = mt.SymMat(3, (4, 4))
    for y in range(3):
        for x in range(y, 3):
            a[y, x] = np.full((4, 4), 10 * y + x)
    arr = a.to_array()
    np.testing.assert_allclose(arr[1, 0], arr[0, 1])
    np.testing.assert_allclose(arr[2, 1][0, 0], 12)


def test_sanitize_beam():
    ells = np.arange(6000)
    beam = np.asarray(F.gauss_beam(ells, 5.0))
    sane = mt.sanitize_beam(ells, beam, sval=1e-3)
    assert np.all(sane > 0)
    # continues smoothly: no jumps bigger than 10x
    assert np.max(np.abs(np.diff(np.log(sane)))) < 0.1


def test_gapfill_smooth(geom, th):
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    mgen = grf.MapGen(geom, cltt[None, None], dtype=jnp.float64)
    imap = mgen.get_map(jax.random.PRNGKey(6))
    modr = geom.modrmap_np()
    badmask = jnp.asarray(modr < 8 * arcmin)
    filled = mt.gapfill_edge_conv_flat(imap, badmask, geom)
    # good region untouched; hole values within the map's range
    np.testing.assert_allclose(np.asarray(filled)[~np.asarray(badmask)],
                               np.asarray(imap)[~np.asarray(badmask)])
    hole_vals = np.asarray(filled)[np.asarray(badmask)]
    assert np.all(np.abs(hole_vals) < 5 * float(jnp.std(imap)))


def test_rescale_rotate_roundtrip(geom):
    modr = geom.modrmap(jnp.float64)
    img = jnp.exp(-0.5 * modr ** 2 / (20 * arcmin) ** 2)
    rot = mt.rotate(img, np.pi / 2, geom)
    # radially symmetric map invariant under rotation (interior)
    np.testing.assert_allclose(np.asarray(rot)[30:-30, 30:-30],
                               np.asarray(img)[30:-30, 30:-30], atol=1e-3)
    # reference convention (review regression): factor > 1 MAGNIFIES —
    # a Gaussian rescaled by 2 must appear twice as wide
    up = mt.rescale(img, 2.0, geom)
    assert float(up[64, 64]) == pytest.approx(float(img[64, 64]), abs=1e-3)
    ny, nx = img.shape
    cy = (ny - 1) / 2
    # value at offset 2d of the magnified map == value at offset d
    d = 20
    assert float(up[int(cy) + 2 * d, int(cy)]) == pytest.approx(
        float(img[int(cy) + d, int(cy)]), rel=0.05)


def test_thumbnail_and_galactic_mask():
    from orphics_tpu.utils import healpix as hp
    nside = 64
    m = np.arange(hp.nside2npix(nside), dtype=float)
    thumb, g = mt.thumbnail_healpix(m, ra_deg=30.0, dec_deg=10.0,
                                    width_arcmin=60, px_res_arcmin=2.0)
    assert thumb.shape == (30, 30)
    # center pixel value equals direct lookup
    pc = hp.ang2pix(nside, np.pi / 2 - np.radians(10.0), np.radians(30.0))
    cy, cx = 15, 15
    assert abs(thumb[cy - 1:cy + 1, cx - 1:cx + 1].mean() - m[pc[0]]) \
        < hp.nside2npix(nside) * 0.01
    geom = rect_geometry(width_deg=40, px_res_arcmin=30.0)
    gm = np.asarray(mt.galactic_mask(geom, 64, np.pi / 2 - 0.15,
                                     np.pi / 2 + 0.15))
    # the strip (|dec| < ~8.6 deg) is masked at the patch center rows
    assert gm[gm.shape[0] // 2].max() == 0
    assert gm[2].min() == 1


def test_fixed_lens_runs(geom, th):
    kappa = 0.1 * jnp.exp(-0.5 * geom.modrmap(jnp.float64) ** 2
                          / (10 * arcmin) ** 2)
    fl = lensing.FixedLens(geom, th, kappa, dtype=jnp.float64)
    unlensed, lensed = fl.generate_sim(jax.random.PRNGKey(7))
    assert np.all(np.isfinite(np.asarray(lensed)))
    # lensing a map with kappa>0 magnifies the center: maps differ
    assert float(jnp.abs(lensed - unlensed).max()) > 0


ARC = arcmin


@pytest.fixture(scope="module")
def geom64():
    return rect_geometry(width_arcmin=64 * 2.0, px_res_arcmin=2.0)


class TestMapsTail:
    """The maps.py utility tail added for reference-surface completeness."""

    def test_radial_window_shapes(self):
        r = np.linspace(0, 1, 101)
        for win in ("kaiser", "cosine", "quintic"):
            w = np.asarray(mt.radial_window(r, 0.2, 0.8, window=win))
            assert w[0] == 1.0 and abs(w[-1]) < 1e-12
            assert np.all(np.diff(w) <= 1e-6)  # monotone non-increasing
        prof = np.ones_like(r)
        ap = np.asarray(mt.apodize_profile(r, prof, 0.2, 0.6))
        assert ap[0] == 1.0 and abs(ap[-1]) < 1e-12

    def test_radial_mask_center_one_edge_zero(self, geom64):
        m = np.asarray(mt.radial_mask(geom64, 5 * ARC, 10 * ARC))
        ny, nx = geom64.shape
        assert m[ny // 2, nx // 2] == 1.0
        assert m[0, 0] == 0.0

    def test_butterworth_halfpower(self):
        b = float(mt.butterworth(1000.0, 1000.0, 2))
        assert abs(b - 0.5) < 1e-12

    def test_gauss_kern_normalized(self):
        g = np.asarray(mt.gauss_kern(2.0, 3.0))
        assert abs(g.sum() - 1.0) < 1e-6
        # symmetric and peaked at the center
        assert g.max() == g[g.shape[0] // 2, g.shape[1] // 2]

    def test_block_smooth_constant_invariant(self, geom64):
        imap = jnp.ones(geom64.shape)
        out = np.asarray(mt.block_smooth(imap, 4))
        np.testing.assert_allclose(out, 1.0, atol=1e-12)
        # block means: a checkerboard of 2x2 blocks smooths to the mean
        m = np.zeros((8, 8))
        m[::2, :] = 2.0
        out = np.asarray(mt.block_smooth(jnp.asarray(m), 2))
        np.testing.assert_allclose(out, 1.0, atol=1e-12)

    def test_field_variance_white(self):
        # white Cl = const c: sigma^2 = c * sum(2l+1)/4pi = c*(lmax+1)^2/4pi
        lmax = 100
        cls = np.full(lmax + 1, 2.0)
        v = float(mt.field_variance(cls))
        assert abs(v - 2.0 * (lmax + 1) ** 2 / (4 * np.pi)) < 1e-6

    def test_random_source_map_counts(self, geom64):
        import jax
        m = np.asarray(mt.random_source_map(
            jax.random.PRNGKey(0), geom64, 10))
        assert m.sum() == 10.0  # delta amplitudes, no beam

    def test_get_ecc_circle_vs_ellipse(self, geom64):
        r = geom64.modrmap_np()
        circ = np.exp(-(r / (10 * ARC)) ** 2)
        assert mt.get_ecc(circ) < 0.05
        yy = np.asarray(geom64.lmap(jnp.float64)[0]) * 0 + \
            np.arange(geom64.ny)[:, None] - geom64.ny / 2 + 0.5
        xx = np.arange(geom64.nx)[None, :] - geom64.nx / 2 + 0.5
        ell = np.exp(-(yy ** 2 / 300.0 + xx ** 2 / 30.0))
        assert mt.get_ecc(ell) > 0.8

    def test_filter_alms_tophat(self):
        from orphics_tpu.ops import alm as almops
        lmax = 30
        ls, ms = almops.lm_indices(lmax)
        alm = jnp.asarray(np.ones(ls.size, np.complex64))
        out = np.asarray(mt.filter_alms(alm, 5, 20))
        assert np.all(out[(ls >= 5) & (ls <= 20)] == 1.0)
        assert np.all(out[(ls < 5) | (ls > 20)] == 0.0)

    def test_area_from_mask(self, geom64):
        mask = np.ones(geom64.shape)
        area_deg2, frac = mt.area_from_mask(mask, geom64)
        assert abs(frac - 1.0) < 1e-12
        assert abs(area_deg2
                   - geom64.area * (180 / np.pi) ** 2) < 1e-6

    def test_resample_fft_roundtrip_mean(self, geom64):
        rng = np.random.default_rng(0)
        imap = jnp.asarray(rng.standard_normal(geom64.shape))
        out, og = mt.resample_fft(imap, geom64, geom64.dy * 2)
        assert og.shape == (geom64.ny // 2, geom64.nx // 2)
        # downsample preserves the mean (DC mode)
        assert abs(float(out.mean()) - float(imap.mean())) < 1e-6
        up, og2 = mt.resample_fft(imap, geom64, geom64.dy / 2)
        assert og2.shape == (geom64.ny * 2, geom64.nx * 2)
        # band-limited upsample: original samples preserved at even pix
        assert abs(float(up.mean()) - float(imap.mean())) < 1e-6

    def test_cutup_and_bounds(self):
        boxes = mt.cutup((64, 64), 2, 2, pad=0)
        assert boxes.shape == (4, 2, 2)
        assert boxes.min() >= 0 and boxes.max() <= 63
        b = mt.bounds_from_list([0.0, 10.0, 5.0, 20.0])
        np.testing.assert_allclose(np.rad2deg(b),
                                   [[0.0, 10.0], [5.0, 20.0]])

    def test_split_sky_boxes(self):
        boxes = mt.split_sky(10.0, 2, 10.0)
        assert len(boxes) > 10
        for b in boxes[:3]:
            assert b[1, 0] > b[0, 0]

    def test_spec1d_to_2d_paints_modlmap(self, geom64):
        ells = np.arange(3000)
        ps = 1.0 / (ells + 10.0)
        p2d = np.asarray(mt.spec1d_to_2d(geom64, ps,
                                                dtype=jnp.float64))
        ml = geom64.modlmap_np()
        want = np.interp(ml, ells, ps)
        sel = ml < 2500
        np.testing.assert_allclose(p2d[sel], want[sel], rtol=1e-3)

    def test_get_lnlike_identity_cov(self):
        stamp = np.array([[1.0, 2.0], [3.0, 4.0]])
        val = float(mt.get_lnlike(np.eye(4), stamp))
        assert abs(val - 30.0) < 1e-10

    def test_get_grf_realization_power(self, geom64):
        import jax
        ny, nx = geom64.shape
        p2d = np.full((ny, nx), 5.0)  # white spectrum, physical units
        maps = np.asarray(jax.vmap(
            lambda k: mt.get_grf_realization(k, geom64, p2d))(
                jax.random.split(jax.random.PRNGKey(1), 32)))
        # pixel variance of a white field = C * npix / area
        want = 5.0 * geom64.npix / geom64.area
        assert abs(maps.var() / want - 1) < 0.1

    def test_rgeo_resolution(self):
        g = mt.rgeo(10.0, 2.0)
        assert abs(mt.resolution(g) - 2.0 * ARC) < 1e-12

    def test_autofiltered_maps(self, geom64):
        rng = np.random.default_rng(3)
        imap = jnp.asarray(rng.standard_normal(geom64.shape).astype(
            np.float32))
        ivar = np.ones(geom64.shape, np.float32)
        ivar[:, :8] = 0.0
        fmap, mask = mt.autofiltered_maps(
            imap, geom64, ivar=ivar, grow_deg=0.0, apod_deg=0.1)
        fmap = np.asarray(fmap)
        assert np.all(np.isfinite(fmap))
        assert np.all(fmap[:, :4] == 0)  # masked region zeroed

    def test_flat_sim_bundle(self):
        geom, modlmap, th, mgen = mt.flat_sim(4.0, 4.0, lmax=3000)
        import jax
        m = np.asarray(mgen.get_map(jax.random.PRNGKey(0)))
        assert m.shape[-2:] == geom.shape and np.isfinite(m).all()


def test_get_grf_cmb_runs(geom):
    """Review regression: the 1D Cl was handed to get_grf_realization
    un-painted (shape (1,1,nl)), crashing every call."""
    from orphics_tpu.models import theory
    th = theory.default_theory()
    m = mt.get_grf_cmb(0, geom, th, "TT")
    assert m.shape[-2:] == geom.shape
    assert np.isfinite(np.asarray(m)).all()
    assert float(jnp.std(m)) > 1.0          # CMB-scale fluctuations


def test_resample_fft_anisotropic():
    """Review regression: res between |dx| and |dy| needs a crop on
    one axis and a pad on the other (the single branch produced
    negative pad widths)."""
    from orphics_tpu.geometry import Geometry
    g = Geometry(ny=64, nx=64, dy=2.0 * arcmin, dx=1.0 * arcmin, y0=0.0)
    img = jnp.ones(g.shape)
    out, og = mt.resample_fft(img, g, 1.5 * arcmin)
    assert out.shape == og.shape
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
