"""Pallas-path TT quadratic estimator (QE.kappa_tt_pallas) vs the
reference full-plane reconstruction, in interpret mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orphics_tpu import rect_geometry
from orphics_tpu.models import theory, qe
from orphics_tpu.ops import fourier as F
from orphics_tpu.ops import pallas_fft as pf


@pytest.fixture(scope="module")
def setup():
    n = 256
    geom = rect_geometry(width_arcmin=n * 2.0, px_res_arcmin=2.0)
    th = theory.default_theory()
    ctot = qe.lensing_noise_2d(geom, th, 1.4, 6.0)
    lmax_grid = geom.ellmax_safe()
    q = qe.QE(geom, th, ctot,
              xmask=F.mask_kspace(geom, lmin=100,
                                  lmax=min(3000, lmax_grid - 1)),
              kmask=F.mask_kspace(geom, lmin=40,
                                  lmax=min(3000, lmax_grid * 0.8)))
    perm, _ = pf.row_perm(n)
    inv = np.argsort(perm)
    return geom, q, perm, inv


class TestKappaTTPallas:
    def test_matches_full_plane(self, setup):
        geom, q, perm, inv = setup
        n = geom.nx
        rng = np.random.default_rng(0)
        maps = rng.standard_normal((2, n, n)).astype(np.float32)
        # reference: full-plane XLA reconstruction per map
        refs = []
        for m in maps:
            Z = jnp.fft.fft2(jnp.asarray(m))
            refs.append(np.asarray(q.kappa_from_map("TT", Z)))
        refs = np.stack(refs)
        # pallas path: pp-permuted Hermitian spectra in
        Z = np.fft.fft2(maps)
        zr = jnp.asarray(Z.real[:, perm][:, :, perm].astype(np.float32))
        zi = jnp.asarray(Z.imag[:, perm][:, :, perm].astype(np.float32))
        our, oui = q.kappa_tt_pallas(zr, zi, interpret=True)
        got = (np.asarray(our) + 1j * np.asarray(oui))[:, inv][:, :, inv]
        scale = np.abs(refs).max()
        assert np.max(np.abs(got - refs)) < 2e-4 * scale

    def test_power_bins_match_half_plane(self, setup):
        """The pp-plane |kappa|^2 binned with permuted ids must equal
        the half-plane RfftBin2D result (the bench config-3 pattern)."""
        from orphics_tpu.ops.binning import RfftBin2D
        from orphics_tpu.ops.pallas_kernels import bin_matmul
        geom, q, perm, inv = setup
        n = geom.nx
        nxr = n // 2 + 1
        rng = np.random.default_rng(1)
        maps = rng.standard_normal((2, n, n)).astype(np.float32)
        edges = np.arange(40, 2000, 80.0)
        binner = RfftBin2D(geom, edges)
        norm = float(geom.area) / float(geom.npix) ** 2
        # half-plane reference
        xh = jnp.fft.rfft2(jnp.asarray(maps))
        fk = q.kappa_tt_rfft(xh)
        p2d = (fk.conj() * fk).real * norm
        _, ref = binner.bin(p2d)
        # pallas full-plane: bin with permuted full-plane ids
        Z = np.fft.fft2(maps)
        zr = jnp.asarray(Z.real[:, perm][:, :, perm].astype(np.float32))
        zi = jnp.asarray(Z.imag[:, perm][:, :, perm].astype(np.float32))
        our, oui = q.kappa_tt_pallas(zr, zi, interpret=True)
        p_pp = (our ** 2 + oui ** 2) * norm
        ml = geom.modlmap_np()[perm][:, perm]
        dig = np.digitize(ml, edges).astype(np.int32)
        dig[dig == len(edges)] = 0
        nseg = len(edges)  # nbins + 1 segments incl out-of-range 0
        sums = bin_matmul(p_pp.reshape(2, -1), jnp.asarray(dig.ravel()),
                          nseg, interpret=True)
        cnts = np.bincount(dig.ravel(), minlength=nseg)
        got = np.asarray(sums)[:, 1:] / np.maximum(cnts[1:], 1)
        # full-plane binning == half-plane binning (Hermitian weights)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-3)

    def test_noise_planes_interpret(self, setup):
        geom, q, perm, inv = setup
        n = geom.nx
        scale = jnp.asarray(np.linspace(0.5, 2.0, n * n)
                            .reshape(n, n).astype(np.float32))
        zr, zi = pf.noise_planes(scale, 7, 2, interpret=True)
        assert zr.shape == (2, n, n) and zi.shape == (2, n, n)
        # law: std ~ scale
        r = np.asarray(zr) / np.asarray(scale)[None]
        assert abs(r.std() - 1.0) < 0.02


class TestLensPipePallas:
    """The fully-fused Pallas end-to-end lensing pipeline
    (LensedQEPipeline impl='pallas') vs an XLA/numpy assembly of the
    identical math from the same injected noise planes."""

    def test_pp_core_matches_xla_assembly(self):
        from orphics_tpu.models import theory, lenspipe
        from orphics_tpu.ops import pallas_lens
        n = 256
        geom = rect_geometry(width_arcmin=n * 2.0, px_res_arcmin=2.0)
        th = theory.default_theory()
        pipe = lenspipe.LensedQEPipeline(geom, th, lens_order=3,
                                         impl="pallas", interpret=True)
        assert pipe.impl == "pallas"
        perm = pipe._perm
        inv = np.argsort(perm)
        B, P = 2, 1
        rng = np.random.default_rng(0)

        def drawn(scale_pp):
            sc = np.asarray(scale_pp)[inv][:, inv]  # natural scale
            z = (rng.standard_normal((P, n, n))
                 + 1j * rng.standard_normal((P, n, n))) * sc[None]
            return z.astype(np.complex64)

        zk = drawn(pipe.csq_kk_pp)
        zc = drawn(pipe.csq_coeff_pp)
        w = drawn(pipe.nscale_pp)
        topp = lambda z: (jnp.asarray(z.real[:, perm][:, :, perm]),
                          jnp.asarray(z.imag[:, perm][:, :, perm]))
        got = np.asarray(pipe._pp_core(topp(zk), topp(zc), topp(w), B,
                                       interpret=True))

        # ---- reference assembly (natural layout, jnp.fft) ----
        def mirror(z):
            return np.roll(z[:, ::-1, ::-1], 1, axis=(1, 2))

        def split(z):
            zm = mirror(z)
            f1 = 0.5 * (z + np.conj(zm))
            f2 = -0.5j * (z - np.conj(zm))
            return np.stack([f1[0], f2[0]])      # (B, n, n), P = 1

        Zk = split(zk)
        W = split(w)
        mc = np.fft.ifft2(zc)[0]
        coeffs = np.stack([mc.real, mc.imag])
        cy = np.asarray(pipe.cy_pp)[inv][:, inv]
        cx = np.asarray(pipe.cx_pp)[inv][:, inv]
        refs = []
        for m in range(B):
            ay = np.fft.ifft2(1j * cy * Zk[m]).real
            ax = np.fft.ifft2(1j * cx * Zk[m]).real
            alpha = jnp.asarray(np.stack([ay, ax]).astype(np.float32))
            lensed = np.asarray(pallas_lens.lens_map_pallas(
                jnp.asarray(coeffs[m].astype(np.float32))[None, None],
                alpha[None], geom, order=3, prefiltered=True,
                interpret=True))[0, 0]
            X = np.fft.fft2(lensed) + W[m]
            fk = np.asarray(pipe.qe.kappa_from_map(
                "TT", jnp.asarray(X.astype(np.complex64))))
            norm = pipe.norm
            n0 = np.asarray(pipe.n0_pp)[inv][:, inv]
            cross = (np.conj(fk) * Zk[m]).real * norm
            auto_in = np.abs(Zk[m]) ** 2 * norm
            auto_rec = np.abs(fk) ** 2 * norm - n0
            # the pipeline's own bin ids, unpermuted (exact match)
            dig = np.asarray(pipe._idc).reshape(n, n)[inv][:, inv]
            cnts = np.bincount(dig.ravel(), minlength=pipe._nseg)
            row = []
            for p2d in (cross, auto_in, auto_rec):
                sums = np.bincount(dig.ravel(), weights=p2d.ravel(),
                                   minlength=pipe._nseg)
                row.append(sums[1:] / np.maximum(cnts[1:], 1))
            refs.append(np.stack(row))
        refs = np.stack(refs)
        scale = np.abs(refs).max()
        assert np.max(np.abs(got - refs)) < 5e-4 * scale, \
            np.max(np.abs(got - refs)) / scale


class TestNoisePlanesSeeding:
    def test_word_pair_seeds(self):
        """noise_planes accepts a (2,) int32 word pair (full 64-bit key
        space — a 31-bit scalar seed birthday-collides over long MC
        campaigns); scalar seeds keep working, distinct pairs give
        distinct streams."""
        from orphics_tpu.ops import pallas_fft as pf
        scale = jnp.ones((8, 8), jnp.float32)
        r1, i1 = pf.noise_planes(scale, jnp.array([5, 9], jnp.int32), 1,
                                 interpret=True)
        r2, i2 = pf.noise_planes(scale, jnp.array([5, 10], jnp.int32),
                                 1, interpret=True)
        r3, _ = pf.noise_planes(scale, 5, 1, interpret=True)
        assert np.isfinite(np.asarray(r1)).all()
        assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 0
        assert np.abs(np.asarray(r1) - np.asarray(r3)).max() > 0
        with pytest.raises(ValueError, match="scalar or"):
            pf.noise_planes(scale, jnp.zeros(3, jnp.int32), 1,
                            interpret=True)

    def test_permuted_bin_tables_edge_convention(self):
        """digitize(right=True): a mode exactly ON an edge bins the
        same way as Bin2D/RfftBin2D (review regression: the Pallas
        tables used right=False, disagreeing with the XLA path)."""
        from orphics_tpu.ops import pallas_fft as pf
        ml = np.array([[40.0, 80.0], [120.0, 200.0]])
        perm = np.arange(2)
        idc, icnt, nseg = pf.permuted_bin_tables(ml, perm,
                                                 [40.0, 120.0])
        # 40 == edges[0] -> below range (segment 0); 120 == edges[-1]
        # -> top bin; 200 -> overflow folded to 0
        assert list(np.asarray(idc)) == [0, 1, 1, 0]
