"""Unit tests for the round-3 name-tail implementations: the pixcov
separation helpers, the general Fourier-space pixel covariance, rotated
pixel positions, the gnomonic healpix cutout, and the RSD kmode surface.
"""
import numpy as np
import pytest

from orphics_tpu.geometry import Geometry
from orphics_tpu.models import curved, pixcov as pc, mapstools as mt
from orphics_tpu.models import rsd
from orphics_tpu.utils import healpix as hpx


def _geom(n=8, px_arcmin=0.5, y0=0.0):
    return Geometry(n, n, -np.deg2rad(px_arcmin / 60), np.deg2rad(
        px_arcmin / 60), y0)


class TestPixcovHelpers:
    def test_fcov_to_rcorr_matches_ps2d_to_mat_full_stamp(self):
        g = _geom(8)
        p2d = np.abs(np.random.default_rng(0).normal(size=(8, 8))) + 1.0
        direct = np.asarray(pc.ps2d_to_mat(p2d, g))
        via = np.asarray(pc.fcov_to_rcorr(g, p2d[None, None], 8))[0, 0]
        np.testing.assert_allclose(via, direct, rtol=1e-12)

    def test_fcov_to_rcorr_thumbnail_is_submatrix_consistent(self):
        # a 4x4 thumbnail of an 8x8 grid must reproduce the same
        # separation values as the full matrix
        g = _geom(8)
        p2d = np.abs(np.random.default_rng(1).normal(size=(8, 8))) + 1.0
        full = np.asarray(pc.ps2d_to_mat(p2d, g))
        thumb = np.asarray(pc.fcov_to_rcorr(g, p2d[None, None], 4))[0, 0]
        # pixel (0,0) vs (0,k) separations agree for k < 4
        np.testing.assert_allclose(thumb[0, :4], full[0, :4], rtol=1e-12)

    def test_pixcov_general_fourier_cov_reduces_to_diagonal_cov(self):
        g = _geom(8)
        p2d = np.abs(np.random.default_rng(2).normal(size=(8, 8))) + 1.0
        fc = np.zeros((1, 1, 8, 8, 8, 8))
        ii, jj = np.meshgrid(range(8), range(8), indexing="ij")
        fc[0, 0, ii, jj, ii, jj] = p2d
        via = np.asarray(mt.pixcov(g, fc))[0, 0].reshape(64, 64)
        direct = np.asarray(mt.diagonal_cov(p2d, g))[0, 0]
        np.testing.assert_allclose(via, direct, rtol=2e-5,
                                   atol=2e-5 * direct.max())

    def test_ncov_from_ivar_diagonal_and_finite(self):
        iv = np.random.default_rng(3).random((4, 4)) + 0.1
        iv[0, 0] = 0.0   # singular pixel must be regularized
        out = np.asarray(pc.ncov_from_ivar(iv, ncomp=3))
        assert out.shape == (3, 3, 16, 16)
        assert np.isfinite(out).all()
        d0 = np.diag(out[0, 0])
        np.testing.assert_allclose(np.diag(out[1, 1]), 2 * d0)
        np.testing.assert_allclose(np.diag(out[2, 2]), 2 * d0)
        # off-diagonal component blocks are zero
        assert np.all(out[0, 1] == 0)
        # the ivar=0 pixel got the largest finite variance
        assert d0[0] == pytest.approx(1.0 / iv[iv > 0].max())

    def test_psizemap_matches_geometry_method(self):
        g = _geom(8, y0=0.3)
        np.testing.assert_allclose(np.asarray(mt.psizemap(g)),
                                   np.asarray(g.pixsizemap()))


class TestRotatedPixels:
    def test_identity_recovers_pixel_grid(self):
        g = _geom(16, y0=0.3)
        pix = np.asarray(curved.get_rotated_pixels(g, g))
        grid = np.arange(16, dtype=float)
        np.testing.assert_allclose(pix[0], grid[:, None] * np.ones((1, 16)),
                                   atol=1e-8)
        np.testing.assert_allclose(pix[1], grid[None, :] * np.ones((16, 1)),
                                   atol=1e-8)

    def test_rotate_map_consistent_with_rotated_pixels(self):
        gs = _geom(24, y0=0.5)
        gt = _geom(24, y0=0.0)
        rng = np.random.default_rng(4)
        imap = rng.normal(size=(24, 24))
        out = np.asarray(curved.rotate_map(imap, gs, gt))
        # interior pixels must be finite and bounded by the input range
        inner = out[4:-4, 4:-4]
        assert np.isfinite(inner).all()
        assert inner.max() <= imap.max() + 1e-8
        assert inner.min() >= imap.min() - 1e-8


class TestCutoutGnomonic:
    def test_constant_map(self):
        nside = 16
        m = np.full(hpx.nside2npix(nside), 7.5)
        cut = curved.cutout_gnomonic(m, rot=(120.0, -30.0), xsize=12,
                                     reso=3.0)
        assert cut.shape == (12, 12)
        np.testing.assert_allclose(cut, 7.5)

    def test_dipole_center_value(self):
        nside = 64
        pix = np.arange(hpx.nside2npix(nside))
        th, _ = hpx.pix2ang(nside, pix)
        m = np.cos(th)  # = sin(latitude)
        lat = 37.0
        cut = curved.cutout_gnomonic(m, rot=(10.0, lat), xsize=9, reso=1.0)
        assert cut[4, 4] == pytest.approx(np.sin(np.radians(lat)), abs=0.02)

    def test_rows_increase_northward_both_flips(self):
        # healpy's projected-map convention: rows increase northward for
        # BOTH flip conventions (flip only mirrors the x axis)
        nside = 32
        pix = np.arange(hpx.nside2npix(nside))
        th, ph = hpx.pix2ang(nside, pix)
        m = np.cos(th)
        for flip in ("astro", "geo"):
            cut = curved.cutout_gnomonic(m, rot=(0.0, 0.0), xsize=16,
                                         reso=30.0, flip=flip)
            assert cut[-1].mean() > cut[0].mean()
        # and flip mirrors east-west: a longitude dipole flips sign of
        # the x gradient between the two conventions
        mlon = np.sin(ph)
        ca = curved.cutout_gnomonic(mlon, rot=(0.0, 0.0), xsize=16,
                                    reso=30.0, flip="astro")
        cg = curved.cutout_gnomonic(mlon, rot=(0.0, 0.0), xsize=16,
                                    reso=30.0, flip="geo")
        assert (ca[:, -1].mean() - ca[:, 0].mean()) * \
               (cg[:, -1].mean() - cg[:, 0].mean()) < 0

    def test_unseen_excluded_from_monopole_fit(self):
        nside = 16
        m = np.full(hpx.nside2npix(nside), 2.0)
        m[:100] = -1.6375e30  # healpy UNSEEN sentinel
        cut = curved.cutout_gnomonic(m, rot=(180.0, -45.0), xsize=8,
                                     reso=5.0, remove_mono=True)
        np.testing.assert_allclose(cut, 0.0, atol=1e-10)

    def test_monopole_removal(self):
        nside = 16
        m = np.full(hpx.nside2npix(nside), 2.0)
        cut = curved.cutout_gnomonic(m, xsize=8, reso=5.0, remove_mono=True)
        np.testing.assert_allclose(cut, 0.0, atol=1e-12)


class TestKmodeSurface:
    def test_pgv_squared_equals_pgg_times_pvv(self):
        ks = np.geomspace(1e-3, 0.3, 32)
        mus = np.linspace(-1, 1, 9)
        Pgg, Pgv, Pvv = rsd.Pgg_Pvv_Pgv(ks, mus, 0.5, bg=1.8)
        np.testing.assert_allclose(np.asarray(Pgv) ** 2,
                                   np.asarray(Pgg) * np.asarray(Pvv),
                                   rtol=1e-10)

    def test_kmode_fisher_single_param_analytic(self):
        ks = np.geomspace(1e-2, 0.2, 16)
        mus = np.linspace(0, 1, 5)
        Pgg, Pgv, Pvv = rsd.Pgg_Pvv_Pgv(ks, mus, 0.5, bg=2.0)
        Pgg, Pgv, Pvv = map(np.asarray, (Pgg, Pgv, Pvv))
        # amplitude parameter: dP/dlnA = P for all spectra
        dP = {"lnA": Pgg}, {"lnA": Pgv}, {"lnA": Pvv}
        V = 1e9
        Ngg, Nvv = 1e3, 1e-8
        F, FG = rsd.kmode_fisher(ks, mus, V, ["lnA"], dP[0], dP[1],
                                 dP[2], Pgg, Pgv, Pvv, Ngg, Nvv)
        # g-only Fisher: sum pref * (P/(P+N))^2
        kk, dk, dmu = ks[:-1], np.diff(ks), np.diff(mus)
        pref = kk[None, :] ** 2 * dk[None, :] * dmu[:, None] * V \
            / (2 * np.pi) ** 2 / 2.0
        expect = np.sum(pref * (Pgg[:-1, :-1] /
                                (Pgg[:-1, :-1] + Ngg)) ** 2)
        assert FG[0, 0] == pytest.approx(expect, rel=1e-10)
        # joint Fisher is at least as informative as g alone
        assert F[0, 0] >= FG[0, 0]


class TestForegroundMonopoleSanity:
    def test_dl_to_cl_templates_finite_and_zero_at_monopole(self):
        # regression: nan_to_num(inf)=1.8e308 used to leak a ~1e295
        # Cl(0) into the low-ell ILC covariance
        import warnings
        from orphics_tpu.models import foregrounds as fg
        ells = np.arange(0, 4000)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            y = fg.power_y_template(ells, silence=True)
            cibc = fg.power_cibc(ells, 145.0, 145.0)
        for cl in (np.asarray(y), np.asarray(cibc)):
            assert np.isfinite(cl).all()
            assert cl[0] == 0.0
            assert cl[1:].max() < 1.0  # uK^2-scale, not 1e295

    def test_ilc_power_low_ell_finite(self):
        import warnings
        from orphics_tpu.models import foregrounds as fg
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            ells, nell = fg.ilc_power(
                beams=[5.1, 2.2], noises=[36., 8.], freqs=[39., 93.],
                flux_limits_mJy=[10., 7.], ellmax=500)
        assert np.isfinite(nell).all()
