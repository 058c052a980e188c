"""Real-chip checks of the Pallas kernels and the on-chip RNG.

These promote the validation that previously lived only in bench-side
prose (SURVEY.md round-1 report) into the suite:

  * the rbg/prng_random_bits white-noise synthesis is statistically sound
    and never produces non-finite values (the 23-bit-uniform erf_inv edge
    case: t = 1 - 2^-24 rounds to fp32 1.0 and erf_inv(1.0) = inf);
  * the Pallas permuted-layout FFT kernels agree with XLA's FFT when
    compiled to the MXU (interpret=True coverage already exists in
    tests/test_core.py; real-MXU behavior differs, e.g. the documented
    second-draw RNG corruption);
  * a full spectral-recovery Monte Carlo through the fused FastCl
    pipeline on the chip.

Run: ``ORPHICS_TPU_TESTS=1 python -m pytest tests/ -m tpu -q`` in the
default session environment (axon backend). Skipped on CPU.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def onchip():
    if jax.default_backend() in ("cpu",):
        pytest.skip("no TPU backend")
    return True


def _geom(n, px=2.0):
    from orphics_tpu import rect_geometry
    return rect_geometry(width_arcmin=n * px, px_res_arcmin=px)


class TestOnChipNoise:
    """pallas_fft.ifft2pp_noise: on-chip PRNG white noise statistics."""

    def test_finite_and_unit_variance(self, onchip):
        from orphics_tpu.ops import pallas_fft as pf
        n = 256
        npairs = 32
        # unit covsqrt in the permuted layout: synthesis output = white
        # noise / sqrt(npix) iffts of unit-variance complex white noise
        scale = jnp.ones((n, n), jnp.float32) * jnp.float32(np.sqrt(n * n))
        m1, m2 = pf.ifft2pp_noise(scale, 12345, npairs)
        m = np.concatenate([np.asarray(m1), np.asarray(m2)])
        assert np.all(np.isfinite(m)), "erf_inv edge produced non-finites"
        # each map is white with unit pixel variance
        assert abs(m.mean()) < 5e-3, m.mean()
        assert abs(m.var() - 1.0) < 2e-2, m.var()

    def test_seeds_decorrelated(self, onchip):
        from orphics_tpu.ops import pallas_fft as pf
        n = 256
        scale = jnp.ones((n, n), jnp.float32) * jnp.float32(n)
        a1, _ = pf.ifft2pp_noise(scale, 1, 2)
        b1, _ = pf.ifft2pp_noise(scale, 2, 2)
        a, b = np.asarray(a1).ravel(), np.asarray(b1).ravel()
        r = np.corrcoef(a, b)[0, 1]
        assert abs(r) < 5e-2, r


class TestOnChipFFT:
    """Pallas MXU FFT kernels vs XLA's FFT, compiled (not interpreted)."""

    def test_fft2p_matches_xla(self, onchip):
        from orphics_tpu.ops import pallas_fft as pf
        n = 256
        key = jax.random.PRNGKey(0)
        x1 = jax.random.normal(key, (2, n, n), jnp.float32)
        x2 = jax.random.normal(jax.random.PRNGKey(1), (2, n, n), jnp.float32)
        Zr, Zi = pf.fft2pp(x1, x2, interpret=False)
        perm, _ = pf.row_perm(n)

        @jax.jit
        def ref(x1, x2):
            Z = jnp.fft.fft2(x1 + 1j * x2)
            Zp = Z[:, perm][:, :, perm]
            return Zp.real, Zp.imag

        Rr, Ri = ref(x1, x2)
        scale = float(np.abs(np.asarray(Rr)).max())
        np.testing.assert_allclose(np.asarray(Zr), np.asarray(Rr),
                                   atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(Zi), np.asarray(Ri),
                                   atol=2e-4 * scale)

    def test_bin_matmul_matches_rowcum(self, onchip):
        from orphics_tpu.ops.binning import Bin2D
        n = 512
        geom = _geom(n)
        ml = geom.modlmap_np()
        edges = np.arange(100, 4000, 100.0)
        data = jax.random.normal(jax.random.PRNGKey(3), (4, n, n),
                                 jnp.float32) ** 2
        bp = Bin2D(ml, edges, strategy="pallas")
        br = Bin2D(ml, edges, strategy="rowcum")
        _, vp = bp.bin(data)
        _, vr = br.bin(data)
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vr),
                                   rtol=2e-4)


class TestSpectralRecovery:
    """The canonical on-chip Monte Carlo: 512 fused sims recover the
    input spectrum (round-1 record: mean ratio 1.0002)."""

    def test_512_sim_recovery(self, onchip):
        from orphics_tpu.models import theory
        from orphics_tpu.models.fastcl import FastCl
        n = 512
        geom = _geom(n)
        th = theory.default_theory()
        ells = np.arange(th.lpad + 1)
        cltt = np.asarray(th.lCl("TT", ells))
        edges = np.arange(200, 4000, 200.0)
        fc = FastCl(geom, ells, cltt, bin_edges=edges)
        bats = [np.asarray(fc.sim_bandpowers(seed, 128))
                for seed in (11, 22, 33, 44)]
        mean = np.concatenate(bats).mean(axis=0)
        # expectation = annulus mean of the 2D theory (NOT theory at the
        # bin center: for steep spectra those differ by several %)
        from orphics_tpu.ops.binning import Bin2D
        ml = geom.modlmap_np()
        cl2d = np.interp(ml, ells, cltt)
        _, thb = Bin2D(ml, edges, strategy="rowcum").bin(jnp.asarray(cl2d))
        ratio = mean / np.asarray(thb)
        assert np.all(np.isfinite(ratio))
        # per-bin MC scatter ~ sqrt(2/(Nsims*Nmodes)) < 1%; demand 3%
        assert np.all(np.abs(ratio - 1.0) < 0.03), ratio
        assert abs(ratio.mean() - 1.0) < 0.005, ratio.mean()


@pytest.mark.tpu
class TestOnChipFusedPasses:
    """The fused half-plane power / combine kernels, compiled on the real
    chip (interpret-mode parity lives in test_core; this pins the Mosaic
    lowering of the in-register mirror + split3 dots)."""

    def test_fused_qc_matches_two_step(self, onchip):
        from orphics_tpu.ops import pallas_fft as pf
        n = 256
        m1 = jax.random.normal(jax.random.PRNGKey(5), (2, n, n),
                               jnp.float32)
        m2 = jax.random.normal(jax.random.PRNGKey(6), (2, n, n),
                               jnp.float32)

        @jax.jit
        def err():
            Zr, Zi = pf.fft2pp(m1, m2)
            qs_ref, c_ref = pf.qc_pp_half(Zr, Zi)
            qs, c, zr, zi = pf.fft2pp_qc(m1, m2)
            scale = jnp.max(jnp.abs(qs_ref))
            return (jnp.max(jnp.abs(qs - qs_ref)) / scale
                    + jnp.max(jnp.abs(c - c_ref)) / scale
                    + jnp.max(jnp.abs(zr - Zr[:, :128])) / scale)

        assert float(err()) < 1e-4

    def test_rowcombine_matches_explicit(self, onchip):
        from orphics_tpu.ops import pallas_fft as pf
        n, nq, nco = 256, 3, 2
        npt = nco * nq
        m1 = jax.random.normal(jax.random.PRNGKey(7), (npt, n, n),
                               jnp.float32)
        m2 = jax.random.normal(jax.random.PRNGKey(8), (npt, n, n),
                               jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(9), (2 * nq, n, n),
                              jnp.float32)

        @jax.jit
        def err():
            yr, yi = pf.colfft(m1, m2)
            Zr, Zi = pf.rowfft(yr, yi)
            Zmr, Zmi = pf.mirror_pp(Zr, Zi)
            F1r, F1i = 0.5 * (Zr + Zmr), 0.5 * (Zi - Zmi)
            F2r, F2i = 0.5 * (Zi + Zmi), 0.5 * (Zmr - Zr)
            sh = (nco, nq, n, n)
            wa, wb = w[0::2], w[1::2]
            Cr_ref = (jnp.einsum("jq...,q...->j...", F1r.reshape(sh), wa)
                      + jnp.einsum("jq...,q...->j...", F2r.reshape(sh),
                                   wb))
            Ci_ref = (jnp.einsum("jq...,q...->j...", F1i.reshape(sh), wa)
                      + jnp.einsum("jq...,q...->j...", F2i.reshape(sh),
                                   wb))
            Cr, Ci = pf.rowcombine_pp(yr, yi, 0.5 * wa, -0.5 * wb,
                                      0.5 * wa, 0.5 * wb, nq)
            scale = jnp.max(jnp.abs(Cr_ref))
            return (jnp.max(jnp.abs(Cr - Cr_ref))
                    + jnp.max(jnp.abs(Ci - Ci_ref))) / scale

        assert float(err()) < 1e-4


@pytest.mark.tpu
class TestOnChipQEPallas:
    """The round-3 Pallas QE / lensing-pipeline paths on the real chip:
    interpret-mode parity is established in tests/test_qe_pallas.py,
    but Mosaic (split3 bf16 MXU dots) is a different code path — verify
    the on-chip numbers against the XLA half-plane reconstruction."""

    def test_kappa_tt_pallas_matches_rfft(self, onchip):
        import numpy as np
        from orphics_tpu import rect_geometry
        from orphics_tpu.models import theory, qe
        from orphics_tpu.ops import fourier as F
        from orphics_tpu.ops import pallas_fft as pf
        n = 512
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
        permj = jnp.asarray(perm)
        maps = jax.random.normal(jax.random.PRNGKey(3), (2, n, n),
                                 jnp.float32)
        nxr = n // 2 + 1

        @jax.jit
        def err():
            # XLA half-plane reference
            fk = q.kappa_tt_rfft(jnp.fft.rfft2(maps))
            # pallas full-plane (permuted input built on device)
            Z = jnp.fft.fft2(maps)
            zr = jnp.real(Z)[:, permj][:, :, permj]
            zi = jnp.imag(Z)[:, permj][:, :, permj]
            our, oui = q.kappa_tt_pallas(zr, zi)
            inv = jnp.argsort(permj)
            got = (our + 1j * oui)[:, inv][:, :, inv][..., :nxr]
            scale = jnp.max(jnp.abs(fk))
            return jnp.max(jnp.abs(got - fk)) / scale

        # split3 MXU dots: ~1.5e-5 per transform, a few transforms deep
        assert float(err()) < 2e-3

    def test_lenspipe_pallas_cross_equals_auto(self, onchip):
        """End-to-end statistical closure on chip: the QE cross
        spectrum with the input kappa must track the input kappa auto
        spectrum (unbiased estimator) over the well-measured bins."""
        import numpy as np
        from orphics_tpu import rect_geometry
        from orphics_tpu.models import theory, lenspipe
        geom = rect_geometry(width_arcmin=512 * 2.0, px_res_arcmin=2.0)
        th = theory.default_theory()
        pipe = lenspipe.LensedQEPipeline(geom, th, lens_order=5)
        assert pipe.impl == "pallas"
        acc = []
        for i in range(4):
            out = pipe.step(jax.random.PRNGKey(10 + i), 32)
            acc.append(np.asarray(out))
        m = np.concatenate(acc).mean(0)         # (3, nbins)
        cents = pipe.centers()
        sel = (cents > 80) & (cents < 600)
        ratio = m[0][sel] / m[1][sel]
        assert np.all(np.isfinite(m))
        # MC noise with 128 sims: ~5-10%; test at 20%
        assert np.all(np.abs(ratio - 1.0) < 0.2), ratio


class TestOnChipPallasSHT:
    """The Pallas Legendre kernel compiled to the real MXU/VPU: few-ulp
    roundtrips at realistic band limits, spin-2 parity, and dispatch."""

    def test_roundtrip_lmax1023(self, onchip):
        from orphics_tpu.ops import sht
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 1023
        rings = sht.gauss_legendre_rings(lmax)
        nalm = (lmax + 1) * (lmax + 2) // 2

        @jax.jit
        def mkalm(key):
            kr, ki = jax.random.split(key)
            a = (jax.random.normal(kr, (nalm,), jnp.float32)
                 + 1j * jax.random.normal(ki, (nalm,), jnp.float32))
            return a.at[: lmax + 1].set(
                jnp.real(a[: lmax + 1]).astype(jnp.complex64))

        a0 = mkalm(jax.random.PRNGKey(5))
        a2 = ps.map2alm_pl(ps.alm2map_pl(a0, rings, lmax), rings, lmax)
        err = float(jnp.abs(a2 - a0).max())
        assert err < 1e-4, err   # scan "full" mode achieves ~2e-6

    def test_spin2_roundtrip_lmax511(self, onchip):
        from orphics_tpu.ops import sht
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 511
        rings = sht.gauss_legendre_rings(lmax)
        nalm = (lmax + 1) * (lmax + 2) // 2

        @jax.jit
        def mkalm(key):
            kr, ki = jax.random.split(key)
            a = (jax.random.normal(kr, (nalm,), jnp.float32)
                 + 1j * jax.random.normal(ki, (nalm,), jnp.float32))
            a = a.at[: lmax + 1].set(
                jnp.real(a[: lmax + 1]).astype(jnp.complex64))
            # zero l = 0, 1 (spin-2 l0 = 2): entries 0,1 of m=0 block
            # and l=1 of m=1 block
            return a.at[0].set(0).at[1].set(0).at[lmax + 1].set(0)

        ke, kb = jax.random.split(jax.random.PRNGKey(9))
        e0, b0 = mkalm(ke), mkalm(kb)
        q, u = ps.alm2map_spin_pl(e0, b0, rings, lmax)
        e2, b2 = ps.map2alm_spin_pl(q, u, rings, lmax)
        err = max(float(jnp.abs(e2 - e0).max()),
                  float(jnp.abs(b2 - b0).max()))
        assert err < 1e-4, err

    def test_packed_batch_roundtrip(self, onchip):
        """The packed (multi-map) kernels compile to the real chip and
        match the unbatched path."""
        from orphics_tpu.ops import sht
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 255
        rings = sht.gauss_legendre_rings(lmax)
        nalm = (lmax + 1) * (lmax + 2) // 2

        @jax.jit
        def mkalms(key):
            kr, ki = jax.random.split(key)
            a = (jax.random.normal(kr, (5, nalm), jnp.float32)
                 + 1j * jax.random.normal(ki, (5, nalm), jnp.float32))
            return a.at[:, : lmax + 1].set(
                jnp.real(a[:, : lmax + 1]).astype(jnp.complex64))

        a0 = mkalms(jax.random.PRNGKey(17))    # 5 = one pack of 4 + 1
        maps = ps.alm2map_pl(a0, rings, lmax)
        a2 = ps.map2alm_pl(maps, rings, lmax)
        err = float(jnp.abs(a2 - a0).max())
        assert err < 1e-4, err
        m0 = ps.alm2map_pl(a0[0], rings, lmax)
        d = float(jnp.abs(maps[0] - m0).max())
        scale = float(jnp.abs(m0).max())
        assert d < 1e-5 * scale, (d, scale)

    def test_dispatch_routes_to_pallas(self, onchip, monkeypatch):
        """sht.map2alm on a non-CPU backend routes through the kernel;
        ORPHICS_TPU_SHT=scan opts out — both give the same answer."""
        from orphics_tpu.ops import sht
        lmax = 255
        rings = sht.gauss_legendre_rings(lmax)
        nalm = (lmax + 1) * (lmax + 2) // 2

        @jax.jit
        def mkmap(key):
            kr, ki = jax.random.split(key)
            a = (jax.random.normal(kr, (nalm,), jnp.float32)
                 + 1j * jax.random.normal(ki, (nalm,), jnp.float32))
            return a.at[: lmax + 1].set(
                jnp.real(a[: lmax + 1]).astype(jnp.complex64))

        a0 = mkmap(jax.random.PRNGKey(3))
        from orphics_tpu.ops import pallas_sht
        calls = []
        real = pallas_sht.alm2map_pl
        monkeypatch.setattr(
            pallas_sht, "alm2map_pl",
            lambda *a, **k: (calls.append(1), real(*a, **k))[1])
        monkeypatch.setenv("ORPHICS_TPU_SHT", "auto")
        m_pl = sht.alm2map(a0, rings, lmax)
        assert calls, ("dispatch did not route to the Pallas kernel — "
                       f"backend {jax.default_backend()!r} missing from "
                       "the _pallas_ok allowlist?")
        monkeypatch.setenv("ORPHICS_TPU_SHT", "scan")
        m_scan = sht.alm2map(a0, rings, lmax)
        scale = float(jnp.abs(m_scan).max())
        err = float(jnp.abs(m_pl - m_scan).max())
        assert err < 1e-5 * scale, (err, scale)


class TestOnChipCurvedMC:
    """The bench-config-8 pipeline compiled to the chip: batched synalm
    with a beam, synthesis, galactic mask, analysis, debiased Cls —
    spectrum recovery through the dispatched (Pallas) SHT path."""

    def test_masked_cl_recovery(self, onchip):
        from orphics_tpu.ops import sht
        from orphics_tpu.ops import alm as almops
        from orphics_tpu.models import curved
        lmax, batch = 127, 4
        rings = sht.gauss_legendre_rings(lmax)
        ells = np.arange(lmax + 1)
        cltt = jnp.asarray(1.0 / (ells + 10.0) ** 2, jnp.float32)
        sig = np.deg2rad(60.0 / 60.0) / np.sqrt(8 * np.log(2))
        bl = jnp.asarray(np.exp(-0.5 * ells * (ells + 1.0) * sig * sig),
                         jnp.float32)
        mask = jnp.asarray(np.asarray(curved.galactic_mask_rings(
            rings, np.deg2rad(76.0), np.deg2rad(104.0), coords="equ")),
            jnp.float32)
        w2 = float(curved.wfactor(2, mask, rings))

        @jax.jit
        def step(key):
            keys = jax.random.split(key, batch)
            alms = jax.vmap(
                lambda k: almops.synalm(k, cltt, lmax=lmax))(keys)
            m = sht.alm2map(almops.almxfl(alms, bl), rings, lmax)
            a2 = sht.map2alm(m * mask, rings, lmax)
            return jax.vmap(almops.alm2cl)(a2) / w2

        nsims, cls = 8, []
        for i in range(nsims // batch):
            cls.append(np.asarray(step(jax.random.PRNGKey(i))))
        cls = np.concatenate(cls, axis=0)
        assert np.all(np.isfinite(cls))
        sel = (ells > 20) & (ells < lmax // 2)
        ratio = cls.mean(0)[sel] \
            / (np.asarray(cltt) * np.asarray(bl) ** 2)[sel]
        # mask-induced coupling + MC scatter at 8 sims: loose envelope
        assert abs(ratio.mean() - 1.0) < 0.15, ratio.mean()
