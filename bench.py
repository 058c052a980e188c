"""Benchmarks for the BASELINE.md configs (1-5) plus configs 6-8.

Headline (config 1, printed first): GRF-synthesize -> FFT -> binned-Cl
pipelines/sec. BASELINE.json north star: >= 1000 pipelines/sec at 2048^2
fp32 on one TPU v5e chip. The pipeline per sim (reference call stack
SURVEY §3.1):
  1. draw complex white noise on the Fourier plane,
  2. multiply by the precomputed covsqrt (lensed TT theory),
  3. unitary inverse FFT -> real CMB map          [the map materializes],
  4. raw forward FFT -> |.|^2 * area/npix^2       [FourierCalc.f2power],
  5. radial bin into 1D bandpowers                 [stats.bin2D].

Also measured (BASELINE.json configs 2-5 plus config 6, one JSON line
each):
  2. masked cross-spectra with Knox errors @ 2048^2
  3. TT quadratic-estimator kappa reconstruction-only @ 512^2, SO-like
     noise (stand-in half-plane sims; see bench_qe_recon docstring)
  4. 6-band tSZ-deprojected harmonic ILC coadds @ 512^2
  5. cluster stacking: batched inpaint + profile + NFW mass fit over
     10^4 cutouts
  6. honest end-to-end lensing MC @ 512^2: lensed sim (Pallas spline
     displacement) + beam + noise + QE recon + debiased spectra
  7. curved-sky SHT roundtrips at lmax 2047 (the Pallas Legendre
     kernel on accelerator backends)
  8. curved-sky masked-spectrum Monte Carlo at lmax 1023 (synalm +
     beam -> synthesis -> galactic mask -> analysis -> debiased Cls)

Each config prints one JSON line {"metric","value","unit","vs_baseline"};
the headline line comes first. Select with BENCH_CONFIGS="1,2,..."
(default all).
"""
import json
import os
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # honor an explicit CPU request even on hosts whose sitecustomize
    # re-registers an accelerator and rewrites jax_platforms after env
    # parsing (same guard as examples/; a hung tunnel otherwise blocks
    # the whole bench in TPU client init)
    import jax
    jax.config.update("jax_platforms", "cpu")


_RESULTS = []


def _emit(obj):
    """Print one benchmark JSON line and record it for the final summary."""
    _RESULTS.append(obj)
    print(json.dumps(obj), flush=True)


def _sync_scalar(x):
    """Force execution on axon (block_until_ready is a no-op there)."""
    return float(np.asarray(x).ravel()[0])


def _maybe_trace(tag):
    """Profiler trace context for the timed reps when BENCH_TRACE is set
    (a logdir path); no-op otherwise."""
    logdir = os.environ.get("BENCH_TRACE")
    if not logdir:
        import contextlib
        return contextlib.nullcontext()
    from orphics_tpu.utils import profiling
    return profiling.trace(os.path.join(logdir, tag))


def bench_headline():
    import jax
    import jax.numpy as jnp

    from orphics_tpu import rect_geometry
    from orphics_tpu import maps
    from orphics_tpu.ops import fourier as F
    from orphics_tpu.ops.binning import Bin2D
    from orphics_tpu.models import grf, theory

    n = int(os.environ.get("BENCH_N", 2048))
    batch = int(os.environ.get("BENCH_BATCH", 192))
    px = 0.5  # arcmin
    geom = rect_geometry(width_arcmin=n * px, px_res_arcmin=px)
    assert geom.shape == (n, n)

    th = theory.default_theory()
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))

    covsqrt = grf.spec2flat(geom, cltt[None, None], exp=0.5,
                            dtype=jnp.float32)[0, 0]
    edges = np.arange(80, 8000, 80.0)
    binner = Bin2D(geom.modlmap_np(), edges)
    norm = jnp.float32(geom.area / geom.npix ** 2)

    impl = os.environ.get("BENCH_IMPL", "pallas")
    if impl == "pallas" and n % 128 == 0 and n >= 256:
        from orphics_tpu.ops import pallas_fft as pf
        perm, _ = pf.row_perm(n)
        # static doubly-permuted grids: the Pallas 2D FFT leaves rows AND
        # columns in row_perm order; all static tables absorb it for free
        covsqrt_pp = jnp.asarray(np.asarray(covsqrt)[perm][:, perm]
                                 * np.sqrt(geom.npix).astype(np.float32))
        ml = geom.modlmap_np()
        binner_p = Bin2D(ml[perm][:, perm], edges)
        assert batch % 2 == 0
        npairs = batch // 2
        from orphics_tpu.ops.pallas_kernels import bin2_matmul
        icnt = binner_p._inv_counts          # 1/count per in-range bin
        nsg = binner_p._nseg                 # nbins + 2 (under/overflow)
        half_norm = jnp.float32(0.5) * norm
        # Hermitian half plane: mirror-even fields qs = (|Z(k)|^2 +
        # |Z(-k)|^2)/2 and c = Re(Z Zm) reconstruct full-plane bins as
        # 2*bin(half) - bin(row ky=0) + bin(row ky=n/2)
        dig2d = np.asarray(binner_p._dig_dev).reshape(n, n)
        p_of_h, pnyq = pf.half_rows(n)
        idc = jnp.asarray(dig2d[p_of_h].reshape(-1))
        p_of_k = np.argsort(perm)
        mrow = jnp.asarray(p_of_k[(n - perm) % n].astype(np.int32))
        seg_eye = np.arange(nsg)[None, :]
        oh0 = jnp.asarray((dig2d[0][:, None] == seg_eye).astype(np.float32))
        ohn = jnp.asarray((dig2d[pnyq][:, None] == seg_eye)
                          .astype(np.float32))
        nh = n // 2

        def row_bins(zrow_r, zrow_i, p, oh):
            """Boundary-row (ky = 0 / n/2) bins: their mirror is a lane
            permutation within the same row. Rows come from the
            [0, 128) Z-row strip emitted by the fused kernel."""
            zr, zi = zrow_r[:, p, :], zrow_i[:, p, :]
            zmr = jnp.take(zr, mrow, axis=1)
            zmi = jnp.take(zi, mrow, axis=1)
            qs = 0.5 * (zr * zr + zi * zi + zmr * zmr + zmi * zmi)
            c = zr * zmr - zi * zmi
            hp = jax.lax.Precision.HIGHEST
            return (jnp.einsum("bk,ks->bs", qs, oh, precision=hp),
                    jnp.einsum("bk,ks->bs", c, oh, precision=hp))

        @jax.jit
        def step(seed):
            """Identical math to the XLA path: synthesize two real maps per
            pair as Re/Im of one inverse FFT (the maps materialize in HBM
            and are returned), analyze them packed as one forward FFT,
            Hermitian-split, bin. The white noise is drawn by the on-chip
            PRNG *inside* the synthesis kernel; the row DFT + mirror +
            split + power collapse into ONE fused half-plane pass; and
            because colfft(colifft(Y')) = Y' exactly, the analysis
            consumes the synthesis's pre-column intermediate Y' directly
            — the analysis column pass and the map re-read are skipped
            while the maps still materialize (forced jit output)."""
            m1, m2, yr, yi = pf.ifft2pp_noise_y(covsqrt_pp, seed, npairs)
            qs, cc, zrow_r, zrow_i = pf.rowqc_pp(yr, yi)
            Nh = nh * n
            bqc, bcc = bin2_matmul(qs.reshape(npairs, Nh),
                                   cc.reshape(npairs, Nh), idc, nsg)
            bq0, bc0 = row_bins(zrow_r, zrow_i, 0, oh0)
            bqn, bcn = row_bins(zrow_r, zrow_i, pnyq, ohn)
            bq = (2.0 * bqc - bq0 + bqn)[:, 1:-1]
            bc = (2.0 * bcc - bc0 + bcn)[:, 1:-1]
            b1 = (bq + bc) * half_norm * icnt          # binned |F1|^2
            b2 = (bq - bc) * half_norm * icnt          # binned |F2|^2
            return jnp.concatenate([b1, b2]), m1, m2

        out, mm1, mm2 = step(0)
        _ = np.asarray(out)
        nrep = int(os.environ.get("BENCH_REPS", 20))
        with _maybe_trace("config1"):
            t0 = time.perf_counter()
            for i in range(nrep):
                out, mm1, mm2 = step(i + 1)
            _ = np.asarray(out)
            dt = time.perf_counter() - t0
        rate = nrep * batch / dt
        _emit({
            "metric": f"grf_fft_bin_pipelines_per_sec_{n}x{n}_fp32",
            "value": round(rate, 2),
            "unit": "pipelines/s",
            "vs_baseline": round(rate / 1000.0, 4),
        })
        return

    def power_pair(key):
        """Two full GRF->map->FFT->power pipelines per complex FFT pair:
        Re/Im of one synthesis ifft are two independent GRFs, and two real
        maps pack into one analysis fft (classic exact real-pair packing).
        """
        kr, ki = jax.random.split(key)
        eta = (jax.random.normal(kr, geom.shape, jnp.float32)
               + 1j * jax.random.normal(ki, geom.shape, jnp.float32))
        z = F.ifft2(covsqrt * eta, geom, "ortho")
        m1, m2 = z.real, z.imag                        # the simulated maps
        Z = jnp.fft.fft2(m1 + 1j * m2)                 # analysis FFT (raw)
        Zr = jnp.roll(Z[..., ::-1, ::-1], (1, 1), (-2, -1)).conj()
        F1 = 0.5 * (Z + Zr)
        F2 = -0.5j * (Z - Zr)
        p1 = (F1.conj() * F1).real * norm
        p2 = (F2.conj() * F2).real * norm
        return jnp.stack([p1, p2])

    assert batch % 2 == 0
    npairs = batch // 2  # each key yields two complete pipelines

    @jax.jit
    def step(keys):
        p2ds = jax.vmap(power_pair)(keys).reshape(batch, n, n)
        # one batched MXU bin-reduce over all maps (per-pair binning would
        # serialize into tiny kernels)
        _, p1d = binner.bin(p2ds)
        return p1d

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, npairs)
    # warmup/compile; block via host transfer (axon block_until_ready is a
    # no-op for pure-compute graphs)
    out = step(keys)
    _ = np.asarray(out)

    nrep = int(os.environ.get("BENCH_REPS", 20))
    with _maybe_trace("config1"):
        t0 = time.perf_counter()
        for i in range(nrep):
            keys = jax.random.split(jax.random.PRNGKey(i + 1), npairs)
            out = step(keys)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
    rate = nrep * batch / dt

    _emit({
        "metric": f"grf_fft_bin_pipelines_per_sec_{n}x{n}_fp32",
        "value": round(rate, 2),
        "unit": "pipelines/s",
        "vs_baseline": round(rate / 1000.0, 4),
    })


def bench_masked_cross():
    """Config 2: apodized-window cross-spectra with Knox errors @ 2048^2
    (FourierCalc.f2power + bin2D pattern, reference maps.py:1594)."""
    import jax
    import jax.numpy as jnp
    from orphics_tpu import rect_geometry
    from orphics_tpu.models import theory, grf
    from orphics_tpu.models.fastcl import FastCl
    from orphics_tpu.ops.windows import get_taper

    n = int(os.environ.get("BENCH2_N", 2048))
    batch = int(os.environ.get("BENCH2_BATCH", 128))
    px = 0.5
    geom = rect_geometry(width_arcmin=n * px, px_res_arcmin=px)
    th = theory.default_theory()
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    edges = np.arange(80, 8000, 80.0)
    fc = FastCl(geom, ells, cltt, bin_edges=edges)
    taper, w2 = get_taper(geom, taper_percent=12.0)
    taper = jnp.asarray(taper, jnp.float32)
    w2 = jnp.float32(w2)
    # taper-weighted effective sky fraction for the Knox factor
    fsky_eff = float(geom.area / (4 * np.pi)) * float(w2)
    cents = np.asarray(fc.centers)
    dl = float(edges[1] - edges[0])
    knox_fac = jnp.asarray(
        np.sqrt(2.0 / np.maximum((2 * cents + 1) * dl * fsky_eff,
                                 1e-30)),
        jnp.float32)

    @jax.jit
    def step(seed):
        # fresh INDEPENDENT sim pairs (throughput workload: the cross
        # spectra are consistent with zero; what is measured is the
        # masked cross-spectrum pipeline rate, not a signal) -> mask
        # (fused onto the analysis FFT load) -> packed-FFT cross
        # spectra -> debias by w2 -> Knox error bars
        from orphics_tpu.ops import pallas_fft as pf
        npairs = batch // 2
        m1, m2 = pf.ifft2pp_noise(fc._covsqrt_pp, seed, npairs,
                                  interpret=fc.interpret)
        bs = fc.cross_bandpowers(m1, m2, window=taper) / w2
        errs = bs * knox_fac
        return bs, errs

    out = step(0)
    _sync_scalar(out[0])
    nrep = int(os.environ.get("BENCH2_REPS", 10))
    with _maybe_trace("config2"):
        t0 = time.perf_counter()
        for i in range(nrep):
            out = step(i + 1)
        _sync_scalar(out[0])
        dt = time.perf_counter() - t0
    rate = nrep * (batch // 2) / dt
    _emit({
        "metric": f"masked_cross_spectra_per_sec_{n}x{n}_fp32",
        "value": round(rate, 2), "unit": "cross-spectra/s",
        "vs_baseline": round(rate, 2)})


def bench_qe_recon():
    """Config 3: TT QE kappa *reconstruction-only* rate @ 512^2 with
    SO-like noise, N_L^0-debiased binned auto spectrum included (the
    Lensing-noise-curves pattern).

    What this measures — and what it does not: the timed loop draws
    stand-in observed fields directly on the rfft half-plane from the
    lensed-TT theory (zero transforms, no lensing operation, no beam
    convolution / noise realization in the field), then runs the full
    fused half-plane reconstruction (filters + QE + N0-debias + bin).
    It is a *reconstruction throughput* number. The honest end-to-end
    rate (lensed sim + beam + noise + recon) is config 6
    (:func:`bench_lensed_e2e`)."""
    import jax
    import jax.numpy as jnp
    from orphics_tpu import rect_geometry
    from orphics_tpu.models import theory, qe, grf
    from orphics_tpu.ops import fourier as F
    from orphics_tpu.ops.binning import Bin2D

    from orphics_tpu.ops.binning import RfftBin2D

    n = int(os.environ.get("BENCH3_N", 512))
    batch = int(os.environ.get("BENCH3_BATCH", 64))
    px = 2.0
    geom = rect_geometry(width_arcmin=n * px, px_res_arcmin=px)
    th = theory.default_theory()
    beam, noise = 1.4, 6.0  # SO-like LAT
    ctot = qe.lensing_noise_2d(geom, th, beam, noise)
    lmax_grid = geom.ellmax_safe()
    q = qe.QE(geom, th, ctot,
              xmask=F.mask_kspace(geom, lmin=100,
                                  lmax=min(3000, lmax_grid - 1)),
              kmask=F.mask_kspace(geom, lmin=40,
                                  lmax=min(3000, lmax_grid * 0.8)))
    nxr = geom.nx // 2 + 1
    n0_h = q.N_L_kk("TT")[:, :nxr]
    edges = np.arange(40, 2000, 80.0)
    binner = RfftBin2D(geom, edges)
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    # Fused path: synthesize the stand-in observed sims directly on the
    # Fourier plane (exactly the spectrum of a real GRF map; zero
    # transforms), then the fused TT reconstruction.
    norm = jnp.float32(geom.area / geom.npix ** 2)

    impl = os.environ.get("BENCH_IMPL", "pallas")
    if impl == "pallas" and n % 128 == 0 and n >= 256 and batch % 2 == 0:
        # Pallas MXU path (qe.kappa_tt_pallas): on-chip PRNG spectral
        # synthesis, Hermitian pair split via one mirror, 2.5 complex
        # Pallas transforms + 1 mirror per map, full-plane permuted
        # N0-debias + MXU bin reduce. Full-plane binning of a Hermitian
        # power == the half-plane RfftBin2D result (tested).
        from orphics_tpu.ops import pallas_fft as pf
        from orphics_tpu.ops.pallas_kernels import bin_matmul
        perm, _ = pf.row_perm(n)
        ml_full = geom.modlmap_np()
        c2d = np.interp(ml_full, ells, cltt, left=0, right=0)
        scale_pp = jnp.asarray(
            (np.sqrt(np.maximum(c2d, 0.0))
             * (geom.npix / float(geom.area) ** 0.5))[perm][:, perm]
            .astype(np.float32))
        n0_pp = jnp.asarray(np.asarray(
            q.N_L_kk("TT"))[perm][:, perm].astype(np.float32))
        idc, icnt, nseg = pf.permuted_bin_tables(ml_full, perm, edges)
        npairs = batch // 2

        @jax.jit
        def step(seed):
            zr, zi = pf.noise_planes(scale_pp, seed, npairs)
            zmr, zmi = pf.mirror_pp(zr, zi)
            f1r = 0.5 * (zr + zmr)
            f1i = 0.5 * (zi - zmi)
            f2r = 0.5 * (zi + zmi)
            f2i = 0.5 * (zmr - zr)
            Zr = jnp.stack([f1r, f2r], 1).reshape(batch, n, n)
            Zi = jnp.stack([f1i, f2i], 1).reshape(batch, n, n)
            our, oui = q.kappa_tt_pallas(Zr, Zi)
            p = (our * our + oui * oui) * norm - n0_pp[None]
            sums = bin_matmul(p.reshape(batch, -1), idc, nseg)
            return sums[:, 1:] * icnt

        out = step(0)
        _sync_scalar(out)
        nrep = int(os.environ.get("BENCH3_REPS", 20))
        with _maybe_trace("config3"):
            t0 = time.perf_counter()
            for i in range(nrep):
                out = step(i + 1)
            _sync_scalar(out)
            dt = time.perf_counter() - t0
        rate = nrep * batch / dt
        _emit({
            "metric": f"qe_tt_recon_only_per_sec_{n}x{n}_fp32",
            "value": round(rate, 2), "unit": "recons/s",
            "vs_baseline": round(rate, 2)})
        return

    covsqrt_h = grf.covsqrt_half(geom, ells, cltt, dtype=jnp.float32)

    @jax.jit
    def step(key):
        keys = jax.random.split(key, batch)
        eta = jax.vmap(lambda k: grf.rand_hermitian_half(k, geom))(keys)
        kobs_h = covsqrt_h * eta                    # stand-in observed sims
        fk = q.kappa_tt_rfft(kobs_h)
        p2d = (fk.conj() * fk).real * norm - n0_h[None]
        _, p1d = binner.bin(p2d)
        return p1d

    out = step(jax.random.PRNGKey(0))
    _sync_scalar(out)
    nrep = int(os.environ.get("BENCH3_REPS", 20))
    with _maybe_trace("config3"):
        t0 = time.perf_counter()
        for i in range(nrep):
            out = step(jax.random.PRNGKey(i + 1))
        _sync_scalar(out)
        dt = time.perf_counter() - t0
    rate = nrep * batch / dt
    _emit({
        "metric": f"qe_tt_recon_only_per_sec_{n}x{n}_fp32",
        "value": round(rate, 2), "unit": "recons/s",
        "vs_baseline": round(rate, 2)})


def bench_lensed_e2e():
    """Config 6: honest end-to-end lensing MC rate @ 512^2 — what the
    reference's tt_verification loop does per iteration (FlatLensingSims
    .get_sim + QE recon, reference lensing.py:458-516): unlensed CMB GRF
    -> kappa GRF -> deflection -> Pallas spline displacement -> beam +
    white noise -> deconvolve -> fused TT QE -> N0-debiased binned
    auto/cross spectra. One number = complete sim+recon pipelines/s."""
    import jax
    from orphics_tpu import rect_geometry
    from orphics_tpu.models import theory, lenspipe

    n = int(os.environ.get("BENCH6_N", 512))
    batch = int(os.environ.get("BENCH6_BATCH", 64))
    px = 2.0
    geom = rect_geometry(width_arcmin=n * px, px_res_arcmin=px)
    th = theory.default_theory()
    pipe = lenspipe.LensedQEPipeline(geom, th, lens_order=5)

    out = pipe.step(jax.random.PRNGKey(0), batch)
    _sync_scalar(out)
    nrep = int(os.environ.get("BENCH6_REPS", 10))
    with _maybe_trace("config6"):
        t0 = time.perf_counter()
        for i in range(nrep):
            out = pipe.step(jax.random.PRNGKey(i + 1), batch)
        _sync_scalar(out)
        dt = time.perf_counter() - t0
    rate = nrep * batch / dt
    _emit({
        "metric": f"lensed_sim_plus_qe_recon_per_sec_{n}x{n}_fp32",
        "value": round(rate, 2), "unit": "sim+recon/s",
        "vs_baseline": round(rate, 2)})


def bench_ilc():
    """Config 4: 6-band tSZ-deprojected constrained ILC map coadds @
    512^2 (harmonic-ILC pattern, reference ilc.py)."""
    import jax
    import jax.numpy as jnp
    from orphics_tpu import rect_geometry
    from orphics_tpu.models import theory, ilc, foregrounds as fg, grf
    from orphics_tpu.ops.fourier import gauss_beam
    from orphics_tpu.geometry import arcmin

    n = int(os.environ.get("BENCH4_N", 512))
    batch = int(os.environ.get("BENCH4_BATCH", 32))
    geom = rect_geometry(width_arcmin=n * 2.0, px_res_arcmin=2.0)
    freqs = np.array([39.0, 93.0, 145.0, 225.0, 280.0, 350.0])
    beams = np.array([5.1, 2.2, 1.4, 1.0, 0.9, 0.8])
    noises = np.array([36.0, 8.0, 10.0, 22.0, 54.0, 100.0])
    nf = len(freqs)
    th = theory.default_theory()
    ellmax = int(geom.ellmax_safe())
    ells = np.arange(2, ellmax)
    cltt = np.asarray(th.lCl("TT", ells))
    kbeams = [np.asarray(gauss_beam(ells, b)) for b in beams]
    cinv1d, _ = ilc.ilc_cinv(ells, cltt, kbeams, freqs,
                             (noises * arcmin) ** 2,
                             components=("tsz", "cibc", "ksz"),
                             fdict=fg.fg_dict(10.0 + 0 * freqs, freqs))
    ml = geom.modlmap_np()
    cinv1d = np.asarray(cinv1d)                  # (nf, nf, nells)
    cinv2d = np.zeros((nf, nf, n, n), np.float32)
    for i in range(nf):
        for j in range(nf):
            cinv2d[i, j] = np.interp(ml, ells, cinv1d[i, j],
                                     left=0, right=0)
    cinv2d = jnp.asarray(cinv2d)
    a_cmb = jnp.ones(nf, jnp.float32)
    a_tsz = jnp.asarray(np.asarray(fg.g_tsz(freqs)), jnp.float32)
    ells_full = np.arange(th.lpad + 1)
    cltt_full = np.asarray(th.lCl("TT", ells_full))

    impl = os.environ.get("BENCH_IMPL", "pallas")
    # ONE evaluation of the path predicate: the jitted step and the
    # timing harness below must never disagree about which path runs
    use_pallas = (impl == "pallas" and n % 128 == 0 and n >= 256
                  and nf % 2 == 0)
    if use_pallas:
        # The cILC is linear in the maps, so the per-band weights are a
        # STATIC real 2D filter (ilc.cilc_weights): each packed FFT pair
        # (bands 2q, 2q+1 of one coadd) contributes w1 F1 + w2 F2 with
        # F1/F2 from the Hermitian split — evaluated directly on the
        # (Z, Z(-k)) permuted planes, so the whole coadd is Pallas
        # synthesis + packed Pallas FFTs + one block-copy mirror + a
        # weighted sum, and pairs of Hermitian coadds invert in ONE
        # complex Pallas ifft each.
        from orphics_tpu.ops import pallas_fft as pf
        assert batch % 2 == 0
        perm, _ = pf.row_perm(n)
        covsqrt = grf.spec2flat(geom, cltt_full[None, None], exp=0.5,
                                dtype=jnp.float32)[0, 0]
        covsqrt_pp = jnp.asarray(np.asarray(covsqrt)[perm][:, perm]
                                 * np.sqrt(geom.npix).astype(np.float32))
        w2d = np.asarray(ilc.cilc_weights(cinv2d, a_cmb, a_tsz),
                         np.float32)                     # (nf, n, n)
        w_pp = jnp.asarray(w2d[:, perm][:, :, perm])
        wa = w_pp[0::2]                                   # (nf/2, n, n)
        wb = w_pp[1::2]
        npairs_tot = batch * nf // 2
        nq = nf // 2
        # complex weights of the split-free combine: alpha o Z +
        # beta o conj(Z(-k)) = w1 F1 + w2 F2
        alr, ali = 0.5 * wa, -0.5 * wb
        ber, bei = 0.5 * wa, 0.5 * wb

        @jax.jit
        def step(seed):
            """Per-band maps and Fourier planes never exist in HBM: the
            synthesis's pre-column intermediate Y' feeds the fused
            row-DFT + Hermitian weighted combine (rowcombine_pp, which
            accumulates over bands in-kernel), and only the ncoadds
            coadd planes are inverse-transformed (packed in pairs)."""
            yr, yi = pf.rowifft_noise_y(covsqrt_pp, seed, npairs_tot)
            cr, ci = pf.rowcombine_pp(yr, yi, alr, ali, ber, bei, nq)
            # pack Hermitian coadd pairs: ifft2(C1 + i C2) = map1 + i map2
            Pr = cr[0::2] - ci[1::2]
            Pi = ci[0::2] + cr[1::2]
            o1, o2 = pf.ifft2pp(Pr, Pi)
            return (o1.mean(axis=(-2, -1)), o2.mean(axis=(-2, -1)))
    else:
        mgen = grf.MapGen(geom, cltt_full[None, None])

        @jax.jit
        def step(key):
            keys = jax.random.split(key, batch * nf)
            maps6 = jax.vmap(mgen.get_map)(keys).reshape(batch, nf, n, n)
            kmaps = jnp.fft.fft2(maps6)
            coadd = ilc.cilc(jnp.moveaxis(kmaps, 1, 0), cinv2d, a_cmb,
                             a_tsz)
            omaps = jnp.fft.ifft2(coadd).real
            return omaps.mean(axis=(-2, -1))

    # shared timing harness (the two paths differ only in seed type
    # and output pytree shape)
    mkseed = (lambda i: i) if use_pallas else jax.random.PRNGKey
    sync = (lambda o: _sync_scalar(o[0])) if use_pallas \
        else _sync_scalar
    out = step(mkseed(0))
    sync(out)
    nrep = int(os.environ.get("BENCH4_REPS", 20))
    with _maybe_trace("config4"):
        t0 = time.perf_counter()
        for i in range(nrep):
            out = step(mkseed(i + 1))
        sync(out)
        dt = time.perf_counter() - t0
    rate = nrep * batch / dt
    _emit({
        "metric": f"ilc_6band_deproj_coadds_per_sec_{n}x{n}_fp32",
        "value": round(rate, 2), "unit": "coadds/s",
        "vs_baseline": round(rate, 2)})


def bench_stack():
    """Config 5: cluster stacking — batched max-likelihood inpainting +
    kappa profile binning + NFW mass chi^2 over 10^4 cutouts
    (reference examples/inpainting + lensing.fit_nfw_profile pattern)."""
    import jax
    import jax.numpy as jnp
    from orphics_tpu import rect_geometry
    from orphics_tpu.geometry import Geometry, arcmin
    from orphics_tpu.models import theory, pixcov, nfwfit, cosmology, grf
    from orphics_tpu.ops import fourier as F
    from orphics_tpu.ops.binning import Bin2D

    nstamp = int(os.environ.get("BENCH5_NSTAMP", 10000))
    npix = 64
    res = 0.5
    gs = Geometry(npix, npix, res * arcmin, res * arcmin)
    th = theory.default_theory()
    beam_fn = lambda l: F.gauss_beam(l, 1.4)

    # one shared hole geometry (same radius every stamp): covsqrt/meanmul
    # precomputed once, fill is a batched matmul
    m1, m2 = pixcov.get_geometry_regions(1, npix, res * arcmin,
                                         5.0 * arcmin)
    scov = pixcov.scov_from_theory(gs, th, beam_fn, ncomp=1)
    nvar = (10.0 * arcmin) ** 2 / (gs.dy * gs.dx)  # 10 uK-arcmin white
    pcov = jnp.asarray(scov) + nvar * jnp.eye(scov.shape[-1])
    covsqrt, meanmul = pixcov.make_geometry(pcov, jnp.asarray(m1),
                                            jnp.asarray(m2), ncomp=1)

    # NFW mass templates on the stamp's profile bins
    cc = cosmology.Cosmology()
    masses = np.geomspace(5e13, 8e14, 16)
    redges = np.arange(0.0, 10.0, 1.0) * arcmin
    modr = gs.modrmap_np()
    pbin = Bin2D(modr, redges)
    temps = []
    for m in masses:
        k2d = nfwfit.nfw_kappa(m, jnp.asarray(modr), cc)
        _, prof = pbin.bin(k2d)
        temps.append(np.asarray(prof))
    temps = jnp.asarray(np.asarray(temps), jnp.float32)  # (nm, nb)
    nb = temps.shape[-1]
    cinv = jnp.eye(nb, dtype=jnp.float32) * 1e4

    ells = np.arange(th.lpad + 1)
    mgen = grf.MapGen(gs, np.asarray(th.lCl("TT", ells))[None, None])
    m1j, m2j = jnp.asarray(m1), jnp.asarray(m2)

    @jax.jit
    def step(key):
        keys = jax.random.split(key, nstamp)
        stamps = jax.vmap(mgen.get_map)(keys)[:, None]     # (B,1,n,n)
        B = stamps.shape[0]
        cs = jnp.broadcast_to(covsqrt, (B,) + covsqrt.shape)
        mm = jnp.broadcast_to(meanmul, (B,) + meanmul.shape)
        filled = pixcov.inpaint_stamps_batched(stamps, cs, mm, m1j, m2j)
        _, profs = pbin.bin(filled[:, 0])                  # (B, nb)
        diff = profs[:, None, :] - temps[None, :, :]       # (B, nm, nb)
        chi2 = jnp.einsum("bmi,ij,bmj->bm", diff, cinv, diff)
        best = jnp.argmin(chi2, axis=1)
        return best

    out = step(jax.random.PRNGKey(0))
    _sync_scalar(out)
    nrep = int(os.environ.get("BENCH5_REPS", 5))
    with _maybe_trace("config5"):
        t0 = time.perf_counter()
        for i in range(nrep):
            out = step(jax.random.PRNGKey(i + 1))
        _sync_scalar(out)
        dt = time.perf_counter() - t0
    rate = nrep * nstamp / dt
    _emit({
        "metric": f"stack_inpaint_nfwfit_stamps_per_sec_{npix}x{npix}",
        "value": round(rate, 2), "unit": "stamps/s",
        "vs_baseline": round(rate, 2)})


def bench_sht():
    """Config 7: curved-sky SHT roundtrips (alm2map + map2alm) at
    lmax 2047 on Gauss-Legendre rings, fp32, through the dispatched
    path (the Pallas Legendre kernel on accelerator backends; the
    reference's libsharp/ducc workload, ``orphics/maps.py:2``)."""
    import jax
    import jax.numpy as jnp
    from orphics_tpu.ops import sht

    lmax = int(os.environ.get("BENCH7_LMAX", 2047))
    rings = sht.gauss_legendre_rings(lmax)
    nalm = (lmax + 1) * (lmax + 2) // 2

    batch = int(os.environ.get("BENCH7_BATCH", 1))

    @jax.jit
    def mkalm(key):
        kr, ki = jax.random.split(key)
        shp = (nalm,) if batch == 1 else (batch, nalm)
        a = (jax.random.normal(kr, shp, jnp.float32)
             + 1j * jax.random.normal(ki, shp, jnp.float32))
        return a.at[..., : lmax + 1].set(
            jnp.real(a[..., : lmax + 1]).astype(jnp.complex64))

    maxerr = jax.jit(lambda a, b: jnp.abs(a - b).max())
    a0 = mkalm(jax.random.PRNGKey(0))
    m = sht.alm2map(a0, rings, lmax)
    a2 = sht.map2alm(m, rings, lmax)
    err = _sync_scalar(maxerr(a2, a0))        # warm + validate
    assert err < 1e-3, f"SHT roundtrip error {err}"
    nrep = int(os.environ.get("BENCH7_REPS", 10))
    with _maybe_trace("config7"):
        t0 = time.perf_counter()
        a = a0
        for _ in range(nrep):
            a = sht.map2alm(sht.alm2map(a, rings, lmax), rings, lmax)
        _sync_scalar(maxerr(a, a0))
        dt = time.perf_counter() - t0
    rate = nrep * batch / dt
    tag = f"sht_roundtrips_per_sec_lmax{lmax}" \
        + (f"_batch{batch}" if batch > 1 else "")
    _emit({
        "metric": tag,
        "value": round(rate, 3), "unit": "roundtrips/s",
        "vs_baseline": round(rate, 3)})
    # fast-mode leg (plain-fp32 recurrence): reported SEPARATELY with
    # its measured roundtrip error — a speed/accuracy option, not the
    # headline (dd above stays the ducc-accuracy comparison point)
    a = a0
    m = sht.alm2map(a0, rings, lmax, fast=True)
    a2 = sht.map2alm(m, rings, lmax, fast=True)
    err_f = _sync_scalar(maxerr(a2, a0))
    t0 = time.perf_counter()
    for _ in range(nrep):
        a = sht.map2alm(sht.alm2map(a, rings, lmax, fast=True),
                        rings, lmax, fast=True)
    _sync_scalar(maxerr(a, a0))
    dt = time.perf_counter() - t0
    rate_f = nrep * batch / dt
    _emit({
        "metric": tag + "_fast",
        "value": round(rate_f, 3), "unit": "roundtrips/s",
        "vs_baseline": round(rate_f, 3), "maxerr": float(err_f)})


def bench_curved_mc():
    """Config 8: curved-sky masked-spectrum Monte Carlo — the full-sky
    analog of config 2 (reference: ``cs.rand_map`` + smoothing +
    galactic mask + ``hp.anafast``/``map2alm`` loops,
    ``orphics/maps.py:744,1009``). Per sim: on-the-fly synalm with a
    Gaussian beam, synthesis to Gauss-Legendre rings, galactic-strip
    masking, analysis back to alm, mask-debiased Cls — 2 SHTs per sim,
    riding the dispatched (Pallas on accelerators) Legendre kernels,
    batched through the packed multi-map kernels."""
    import jax
    import jax.numpy as jnp
    from orphics_tpu.ops import sht
    from orphics_tpu.ops import alm as almops
    from orphics_tpu.models import curved, theory

    lmax = int(os.environ.get("BENCH8_LMAX", 1023))
    batch = int(os.environ.get("BENCH8_BATCH", 8))
    rings = sht.gauss_legendre_rings(lmax)
    th = theory.default_theory()
    ells = np.arange(lmax + 1)
    cltt = jnp.asarray(np.asarray(th.lCl("TT", ells)), jnp.float32)
    fwhm = 10.0  # arcmin
    sig = np.deg2rad(fwhm / 60.0) / np.sqrt(8.0 * np.log(2.0))
    bl = jnp.asarray(np.exp(-0.5 * ells * (ells + 1.0) * sig * sig),
                     jnp.float32)
    mask = jnp.asarray(np.asarray(curved.galactic_mask_rings(
        rings, np.deg2rad(76.0), np.deg2rad(104.0), coords="equ")),
        jnp.float32)
    w2 = float(curved.wfactor(2, mask, rings))

    def mkstep(fast):
        @jax.jit
        def step(key):
            keys = jax.random.split(key, batch)
            alms = jax.vmap(lambda k: almops.synalm(k, cltt,
                                                    lmax=lmax))(keys)
            m = sht.alm2map(almops.almxfl(alms, bl), rings, lmax,
                            fast=fast)
            a2 = sht.map2alm(m * mask, rings, lmax, fast=fast)
            return jax.vmap(almops.alm2cl)(a2) / w2
        return step

    sel = (ells > 100) & (ells < lmax // 2)
    want = (np.asarray(cltt) * np.asarray(bl) ** 2)[sel]
    nrep = int(os.environ.get("BENCH8_REPS", 10))
    for fast in (False, True):
        step = mkstep(fast)
        cls = step(jax.random.PRNGKey(0))     # warm + validate
        _sync_scalar(jnp.abs(cls).max())
        ratio = np.asarray(cls).mean(0)[sel] / want
        assert abs(ratio.mean() - 1.0) < 0.2, (fast, ratio.mean())
        with _maybe_trace("config8" + ("_fast" if fast else "")):
            t0 = time.perf_counter()
            for i in range(nrep):
                cls = step(jax.random.PRNGKey(i + 1))
            _sync_scalar(jnp.abs(cls).max())
            dt = time.perf_counter() - t0
        rate = nrep * batch / dt
        _emit({
            "metric": (f"curved_masked_cl_sims_per_sec_lmax{lmax}"
                       f"_batch{batch}" + ("_fast" if fast else "")),
            "value": round(rate, 3), "unit": "sims/s",
            "vs_baseline": round(rate, 3)})


def bench_curved_mc_pol():
    """Config 8p: the spin-2 leg of config 8 — per sim an (E, B) synalm
    pair with a Gaussian beam, ``alm2map_spin`` to (Q, U) on
    Gauss-Legendre rings, galactic-strip masking, ``map2alm_spin``
    back, and mask-debiased EE+BB (the leakage-invariant total; a pure
    w2 debias does not separate E/B mixing). Exercises the folded
    packed spin kernels the scalar config never touches (reference
    role: ``cs.rand_map(..., pol)`` + ``hp.map2alm_spin`` loops)."""
    import jax
    import jax.numpy as jnp
    from orphics_tpu.ops import sht
    from orphics_tpu.ops import alm as almops
    from orphics_tpu.models import curved, theory

    lmax = int(os.environ.get("BENCH8_LMAX", 1023))
    batch = int(os.environ.get("BENCH8_BATCH", 8))
    rings = sht.gauss_legendre_rings(lmax)
    th = theory.default_theory()
    ells = np.arange(lmax + 1)
    clee = np.asarray(th.lCl("EE", ells))
    clbb = np.asarray(th.lCl("BB", ells))
    clee_j = jnp.asarray(clee, jnp.float32)
    clbb_j = jnp.asarray(clbb, jnp.float32)
    fwhm = 10.0
    sig = np.deg2rad(fwhm / 60.0) / np.sqrt(8.0 * np.log(2.0))
    bl = jnp.asarray(np.exp(-0.5 * ells * (ells + 1.0) * sig * sig),
                     jnp.float32)
    mask = jnp.asarray(np.asarray(curved.galactic_mask_rings(
        rings, np.deg2rad(76.0), np.deg2rad(104.0), coords="equ")),
        jnp.float32)
    w2 = float(curved.wfactor(2, mask, rings))

    @jax.jit
    def step(key):
        keys = jax.random.split(key, 2 * batch).reshape(batch, 2, 2)
        ealm = jax.vmap(lambda k: almops.almxfl(
            almops.synalm(k, clee_j, lmax=lmax), bl))(keys[:, 0])
        balm = jax.vmap(lambda k: almops.almxfl(
            almops.synalm(k, clbb_j, lmax=lmax), bl))(keys[:, 1])
        q, u = sht.alm2map_spin(ealm, balm, rings, lmax)
        e2, b2 = sht.map2alm_spin(q * mask, u * mask, rings, lmax)
        return (jax.vmap(almops.alm2cl)(e2)
                + jax.vmap(almops.alm2cl)(b2)) / w2

    cls = step(jax.random.PRNGKey(0))
    _sync_scalar(jnp.abs(cls).max())
    sel = (ells > 100) & (ells < lmax // 2)
    want = ((clee + clbb) * np.asarray(bl) ** 2)[sel]
    ratio = np.asarray(cls).mean(0)[sel] / want
    assert abs(ratio.mean() - 1.0) < 0.2, ratio.mean()
    nrep = int(os.environ.get("BENCH8_REPS", 10))
    with _maybe_trace("config8p"):
        t0 = time.perf_counter()
        for i in range(nrep):
            cls = step(jax.random.PRNGKey(i + 1))
        _sync_scalar(jnp.abs(cls).max())
        dt = time.perf_counter() - t0
    rate = nrep * batch / dt
    _emit({
        "metric": f"curved_masked_pol_sims_per_sec_lmax{lmax}_batch{batch}",
        "value": round(rate, 3), "unit": "sims/s",
        "vs_baseline": round(rate, 3)})


def main():
    import warnings
    configs = os.environ.get("BENCH_CONFIGS",
                             "1,2,3,4,5,6,7,8,8p").split(",")
    fns = {"1": bench_headline, "2": bench_masked_cross,
           "3": bench_qe_recon, "4": bench_ilc, "5": bench_stack,
           "6": bench_lensed_e2e, "7": bench_sht, "8": bench_curved_mc,
           "8p": bench_curved_mc_pol}
    ok = 0
    # Self-check: no config may request device float64 on an x64-off
    # runtime (jax warns and silently truncates — binner-edge hazard).
    trunc = []
    with warnings.catch_warnings(record=True) as wrec:
        warnings.simplefilter("always")
        for c in configs:
            c = c.strip()
            if not c:
                continue
            try:
                fns[c]()
                ok += 1
            except Exception as e:  # one config must not kill the others
                print(json.dumps({"metric": f"config{c}_error",
                                  "value": 0.0, "unit": "error",
                                  "vs_baseline": 0.0,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      file=sys.stderr)
        trunc = [str(w.message)[:160] for w in wrec
                 if "float64" in str(w.message)
                 and "truncat" in str(w.message).lower()]
    if ok == 0:
        # every config failed: no JSON on stdout — make that observable
        # to exit-status gates instead of reporting success with no data
        sys.exit(1)
    # Final line = the headline (config 1) so artifact collectors that keep
    # only the LAST parsed JSON record the headline, with every other
    # config's number embedded alongside it.
    head = next((r for r in _RESULTS
                 if r["metric"].startswith("grf_fft_bin_pipelines")),
                _RESULTS[0])
    summary = dict(head)
    summary["all"] = {r["metric"]: r["value"] for r in _RESULTS}
    summary["float64_truncation_warnings"] = len(trunc)
    if trunc:
        summary["truncation_warning_samples"] = trunc[:3]
    print(json.dumps(summary), flush=True)
    if trunc:
        print(f"BENCH SELF-CHECK FAILED: {len(trunc)} float64-truncation "
              "warnings (device f64 requested on an x64-off runtime)",
              file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
