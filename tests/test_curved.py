"""Curved-sky layer tests (models/curved.py on top of ops/sht.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orphics_tpu import rect_geometry
from orphics_tpu.models import curved
from orphics_tpu.ops import sht
from orphics_tpu.ops import alm as almops

LMAX = 63
RINGS = sht.gauss_legendre_rings(LMAX)
CL = 1.0 / (np.arange(LMAX + 1) + 10.0) ** 2


class TestRandMap:
    def test_scalar_spectrum_recovery(self):
        """Monte-Carlo input recovery: anafast of synthesized GRFs matches
        the input Cl (reference validates cs.rand_map the same way)."""
        nsims = 60
        keys = jax.random.split(jax.random.PRNGKey(0), nsims)
        acc = np.zeros(LMAX + 1)
        for k in keys:
            m = curved.rand_map(k, RINGS, jnp.asarray(CL), LMAX)
            acc += np.asarray(almops.alm2cl(sht.map2alm(m, RINGS, LMAX)))
        ratio = (acc / nsims)[5:] / CL[5:]
        assert abs(ratio.mean() - 1) < 0.05
        assert ratio.std() < 0.25

    def test_correlated_te(self):
        ps = np.zeros((3, 3, LMAX + 1))
        ps[0, 0] = CL
        ps[1, 1] = 0.5 * CL
        ps[2, 2] = 0.1 * CL
        ps[0, 1] = ps[1, 0] = 0.3 * CL
        nsims = 80
        te = np.zeros(LMAX + 1)
        tt = np.zeros(LMAX + 1)
        for k in jax.random.split(jax.random.PRNGKey(1), nsims):
            alms = curved.synalm_matrix(k, jnp.asarray(ps), LMAX)
            te += np.asarray(almops.alm2cl(alms[0], alms[1]))
            tt += np.asarray(almops.alm2cl(alms[0]))
        assert abs((te / nsims)[5:].mean() / (0.3 * CL)[5:].mean() - 1) < 0.1
        assert abs((tt / nsims)[5:].mean() / CL[5:].mean() - 1) < 0.1

    def test_pol_shape(self):
        ps = np.zeros((3, 3, LMAX + 1))
        ps[0, 0] = CL
        ps[1, 1] = CL
        tqu = curved.rand_map(jax.random.PRNGKey(2), RINGS,
                              jnp.asarray(ps), LMAX)
        assert tqu.shape == (3,) + RINGS.shape
        assert bool(jnp.all(jnp.isfinite(tqu)))

    def test_ensemble_nsims(self):
        """nsims batches: leading sims dim, distinct realizations,
        same statistics machinery as the per-key loop."""
        m = curved.rand_map(jax.random.PRNGKey(3), RINGS,
                            jnp.asarray(CL), LMAX, nsims=4)
        assert m.shape == (4,) + RINGS.shape
        assert bool(jnp.all(jnp.isfinite(m)))
        assert float(jnp.abs(m[0] - m[1]).max()) > 0
        ps = np.zeros((3, 3, LMAX + 1))
        ps[0, 0] = CL
        ps[1, 1] = CL
        tqu = curved.rand_map(jax.random.PRNGKey(4), RINGS,
                              jnp.asarray(ps), LMAX, nsims=2)
        assert tqu.shape == (2, 3) + RINGS.shape
        assert bool(jnp.all(jnp.isfinite(tqu)))


class TestSmoothing:
    def test_beam_transfer(self):
        """Smoothing multiplies the spectrum by the squared beam."""
        m = curved.rand_map(jax.random.PRNGKey(3), RINGS,
                            jnp.asarray(CL), LMAX)
        fwhm = 360.0
        sm = curved.smoothing(m, RINGS, fwhm, LMAX)
        cl_in = np.asarray(almops.alm2cl(sht.map2alm(m, RINGS, LMAX)))
        cl_out = np.asarray(almops.alm2cl(sht.map2alm(sm, RINGS, LMAX)))
        sigma = np.deg2rad(fwhm / 60) / np.sqrt(8 * np.log(2))
        ell = np.arange(LMAX + 1)
        bl2 = np.exp(-ell * (ell + 1) * sigma ** 2)
        np.testing.assert_allclose(cl_out[2:] / cl_in[2:], bl2[2:],
                                   rtol=1e-6)


class TestStitch:
    def test_cosine_stitch_limits(self):
        """Below the stitch scale the output is the alm field; far above
        it is the map2 field."""
        a1 = almops.synalm(jax.random.PRNGKey(4), jnp.asarray(CL),
                           lmax=LMAX, dtype=jnp.complex128)
        m2 = curved.rand_map(jax.random.PRNGKey(5), RINGS,
                             jnp.asarray(10 * CL), LMAX)
        out = curved.cosine_stitch(a1, m2, RINGS, lstitch=30, lcosine=10,
                                   mlmax=LMAX)
        ao = sht.map2alm(out, RINGS, LMAX)
        cl_o = np.asarray(almops.alm2cl(ao))
        cl_1 = np.asarray(almops.alm2cl(
            jnp.asarray(almops.change_alm_lmax(np.asarray(a1), LMAX))))
        cl_2 = np.asarray(almops.alm2cl(sht.map2alm(m2, RINGS, LMAX)))
        np.testing.assert_allclose(cl_o[2:28], cl_1[2:28], rtol=1e-8)
        np.testing.assert_allclose(cl_o[45:], cl_2[45:], rtol=1e-8)

    def test_stitched_noise_white_level(self):
        """With a tiny band-limited alm, the stitched map's high-l power
        matches the requested white level."""
        a = almops.synalm(jax.random.PRNGKey(6),
                          jnp.full(LMAX + 1, 1e-12), lmax=LMAX)
        mask = jnp.ones(RINGS.shape)
        rms = 10.0
        accs = np.zeros(LMAX + 1)
        nsims = 40
        for k in jax.random.split(jax.random.PRNGKey(7), nsims):
            sn = curved.stitched_noise(k, RINGS, a, mask,
                                       rms_uk_arcmin=rms, lstitch=20,
                                       lcosine=8, mlmax=LMAX)
            accs += np.asarray(almops.alm2cl(sht.map2alm(sn, RINGS, LMAX)))
        want = (rms * np.pi / 180 / 60) ** 2
        got = (accs / nsims)[35:55].mean()
        assert abs(got / want - 1) < 0.1


class TestCoadd:
    def test_kspace_coadd_alms_identity(self):
        """Coadding identical maps with equal noise returns the map."""
        a = almops.synalm(jax.random.PRNGKey(8), jnp.asarray(CL), lmax=LMAX,
                          dtype=jnp.complex128)
        ells = np.arange(LMAX + 1)
        beams = jnp.ones((2, LMAX + 1))
        nls = jnp.ones((2, LMAX + 1)) * 1e-5
        out = curved.kspace_coadd_alms([a, a], beams, nls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(a),
                                   atol=1e-12)

    def test_kspace_coadd_weighting(self):
        """An infinitely noisy channel is ignored."""
        a1 = almops.synalm(jax.random.PRNGKey(9), jnp.asarray(CL),
                           lmax=LMAX, dtype=jnp.complex128)
        a2 = a1 * 100.0
        beams = jnp.ones((2, LMAX + 1))
        nls = jnp.stack([jnp.full(LMAX + 1, 1e-8),
                         jnp.full(LMAX + 1, 1e8)])
        out = curved.kspace_coadd_alms([a1, a2], beams, nls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(a1),
                                   rtol=1e-6, atol=1e-12)


class TestRotation:
    def test_identity(self):
        g = rect_geometry(width_arcmin=300, px_res_arcmin=4.0)
        dec, ra = curved._geom_posang(g)
        f = jnp.cos(3 * dec) * jnp.sin(2 * ra + 0.3)
        out = curved.rotate_map(f, g, g, rot=np.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(f),
                                   atol=1e-12)

    def test_recenter(self):
        """Rotating a smooth sky function between patch centers matches
        pointwise evaluation at the rotated coordinates (the reference's
        get_rotated_pixels contract, maps.py:1738)."""
        gs = rect_geometry(width_arcmin=600, px_res_arcmin=4.0)
        gt = rect_geometry(width_arcmin=300, px_res_arcmin=4.0,
                           y0_deg=np.rad2deg(0.3))
        dec_s, ra_s = curved._geom_posang(gs)
        f = jnp.cos(3 * dec_s) * jnp.sin(2 * ra_s + 0.3)
        out = curved.rotate_map(f, gs, gt)
        rot = curved.pointing_rotation((0.0, 0.0), (0.3, 0.0))
        dec_t, ra_t = curved._geom_posang(gt)
        v = curved._ang2vec(dec_t, ra_t)
        vs = jnp.einsum("ij,...j->...i", jnp.asarray(rot), v)
        dec_w, ra_w = curved._vec2ang(vs)
        want = jnp.cos(3 * dec_w) * jnp.sin(2 * ra_w + 0.3)
        assert float(jnp.max(jnp.abs(out - want))) < 5e-6

    def test_maprotator_roundtrip(self):
        """Rotating to another center and back reproduces the interior."""
        gs = rect_geometry(width_arcmin=600, px_res_arcmin=4.0)
        gt = rect_geometry(width_arcmin=600, px_res_arcmin=4.0,
                           y0_deg=10.0)
        dec_s, ra_s = curved._geom_posang(gs)
        f = jnp.cos(2 * dec_s * 30) + jnp.sin(ra_s * 40)
        fwd = curved.MapRotator(gs, gt)
        back = curved.MapRotator(gt, gs)
        rt = back.rotate(fwd.rotate(f))
        err = np.abs(np.asarray(rt - f))[30:-30, 30:-30]
        assert err.max() < 5e-3  # bilinear twice

    def test_gal2equ_orthogonal(self):
        R = curved.gal2equ_rotation()
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        # the NAME's direction: galactic z (NGP) -> equatorial
        # dec ~ 27.13 deg, ra ~ 192.86 deg (regression: the function
        # used to return the equ->gal matrix under this name)
        ngp = R @ np.array([0.0, 0.0, 1.0])
        dec = np.rad2deg(np.arcsin(ngp[2]))
        ra = np.rad2deg(np.arctan2(ngp[1], ngp[0])) % 360
        assert abs(dec - 27.128) < 0.01
        assert abs(ra - 192.859) < 0.01
        np.testing.assert_allclose(curved.gal2equ_rotation(inverse=True),
                                   R.T, atol=0)

    def test_rotator_equator_nonzero_source_ra(self):
        """MapRotatorEquator with a source patch at nonzero RA must
        actually sample the source (regression: the rotated absolute
        RA was converted to pixels as if the source were at RA 0,
        landing thousands of pixels outside and returning all zeros)."""
        gs = rect_geometry(width_arcmin=8 * 60.0, px_res_arcmin=4.0,
                           y0_deg=20.0)
        rot = curved.MapRotatorEquator(gs, (np.deg2rad(20.0), 0.7),
                                       4.0, 4.0)
        out = np.asarray(rot.rotate(jnp.ones(gs.shape)))
        ny, nx = out.shape
        inner = out[ny // 4: -ny // 4, nx // 4: -nx // 4]
        assert np.all(np.abs(inner - 1.0) < 1e-6), inner.mean()

    def test_hemisphere_mask_orientation(self):
        """north_galactic_mask keeps pixels whose galactic colatitude
        is < 90 deg (regression: the strip arguments were swapped, so
        each function kept the hemisphere it claimed to cut)."""
        geom = rect_geometry(width_arcmin=64 * 8.0, px_res_arcmin=8.0,
                             y0_deg=30.0)
        n = np.asarray(curved.north_galactic_mask(geom))
        dec, ra = curved._geom_posang(geom)
        v = np.asarray(curved._ang2vec(dec, ra))
        zg = np.einsum("j,...j->...", np.asarray(curved._R_GAL)[2], v)
        expect = (zg > 0).astype(float)       # galactic north: b > 0
        np.testing.assert_array_equal(n, expect)

    def test_rand_map_pol_validation(self):
        cl = jnp.ones(8)
        with pytest.raises(ValueError, match="pol"):
            curved.rand_map(jax.random.PRNGKey(0), RINGS, cl, 7,
                            pol=True)

    def test_rotate_map_order_validation(self):
        gs = rect_geometry(width_arcmin=64 * 2.0, px_res_arcmin=2.0)
        with pytest.raises(NotImplementedError):
            curved.rotate_map(jnp.ones(gs.shape), gs, gs, order=3)


class TestGalacticMask:
    def test_strip_fraction_rings(self):
        b = 0.2
        gm = curved.galactic_mask_rings(RINGS, np.pi / 2 - b, np.pi / 2 + b)
        w = np.asarray(curved.pixsize_map(RINGS))
        frac = 1 - float((np.asarray(gm) * w).sum() / w.sum())
        assert abs(frac - np.sin(b)) < 0.01

    def test_flat_patch_values(self):
        """Pixels whose galactic latitude is inside the strip are 0."""
        g = rect_geometry(width_arcmin=1200, px_res_arcmin=8.0)
        gm = np.asarray(curved.galactic_mask(g, np.pi / 2 - 0.3,
                                             np.pi / 2 + 0.3))
        dec, ra = curved._geom_posang(g)
        v = np.asarray(curved._ang2vec(dec, ra))
        b_lat = np.arcsin((curved._R_GAL @ v.reshape(-1, 3).T)[2])
        inside = np.abs(b_lat) <= 0.3
        assert np.all(gm.reshape(-1)[inside] == 0)
        assert np.all(gm.reshape(-1)[~inside] == 1)


class TestWfactor:
    def test_full_sky_unity(self):
        w = curved.wfactor(2, jnp.ones(RINGS.shape), RINGS)
        assert abs(float(w) - 1.0) < 1e-10

    def test_half_sky(self):
        mask = jnp.asarray(
            (RINGS.theta_array() < np.pi / 2).astype(float))[:, None] \
            * jnp.ones((1, RINGS.nphi))
        w = curved.wfactor(3, mask, RINGS)
        assert abs(float(w) - 0.5) < 1e-10
