"""Headline benchmark: GRF-synthesize -> FFT -> binned-Cl pipelines/sec.

BASELINE.json north star: >= 1000 pipelines/sec at 2048^2 fp32 on one
TPU v5e chip. The pipeline per sim (reference call stack SURVEY §3.1):
  1. draw complex white noise on the Fourier plane,
  2. multiply by the precomputed covsqrt (lensed TT theory),
  3. unitary inverse FFT -> real CMB map          [the map materializes],
  4. raw forward FFT -> |.|^2 * area/npix^2       [FourierCalc.f2power],
  5. radial bin into 1D bandpowers                 [stats.bin2D].

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orphics_tpu import rect_geometry
    from orphics_tpu import maps
    from orphics_tpu.ops import fourier as F
    from orphics_tpu.ops.binning import Bin2D
    from orphics_tpu.models import grf, theory

    n = int(os.environ.get("BENCH_N", 2048))
    batch = int(os.environ.get("BENCH_BATCH", 64))
    px = 0.5  # arcmin
    geom = rect_geometry(width_arcmin=n * px, px_res_arcmin=px)
    assert geom.shape == (n, n)

    th = theory.default_theory()
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))

    covsqrt = grf.spec2flat(geom, cltt[None, None], exp=0.5,
                            dtype=jnp.float32)[0, 0]
    edges = np.arange(80, 8000, 80.0)
    binner = Bin2D(np.asarray(geom.modlmap(jnp.float64)), edges)
    norm = jnp.float32(geom.area / geom.npix ** 2)

    impl = os.environ.get("BENCH_IMPL", "pallas")
    if impl == "pallas" and n % 128 == 0 and n >= 256:
        from orphics_tpu.ops import pallas_fft as pf
        perm, _ = pf.row_perm(n)
        # static doubly-permuted grids: the Pallas 2D FFT leaves rows AND
        # columns in row_perm order; all static tables absorb it for free
        covsqrt_pp = jnp.asarray(np.asarray(covsqrt)[perm][:, perm]
                                 * np.sqrt(geom.npix).astype(np.float32))
        ml = np.asarray(geom.modlmap(jnp.float64))
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

        def row_bins(Zr, Zi, p, oh):
            """Boundary-row (ky = 0 / n/2) bins: their mirror is a lane
            permutation within the same row."""
            zr, zi = Zr[:, p, :], Zi[:, p, :]
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
            pair as Re/Im of one inverse FFT, analyze them packed as one
            forward FFT, Hermitian-split, bin. Both FFT axes ride the
            Pallas MXU/radix kernels; the Fourier plane stays in the
            kernels' permuted order end to end; the white noise is drawn
            by the on-chip PRNG *inside* the synthesis kernel (covsqrt
            multiply fused too, so neither the noise nor the scaled
            plane ever exists in HBM); and the mirror + split + power
            collapse to one half-plane Pallas pass (qc_pp_half) feeding a
            half-volume MXU bin-reduce."""
            m1, m2 = pf.ifft2pp_noise(covsqrt_pp, seed, npairs)  # the maps
            Zr, Zi = pf.fft2pp(m1, m2)                 # analysis FFT
            qs, cc = pf.qc_pp_half(Zr, Zi)             # half-plane powers
            Nh = nh * n
            bqc, bcc = bin2_matmul(qs.reshape(npairs, Nh),
                                   cc.reshape(npairs, Nh), idc, nsg)
            bq0, bc0 = row_bins(Zr, Zi, 0, oh0)
            bqn, bcn = row_bins(Zr, Zi, pnyq, ohn)
            bq = (2.0 * bqc - bq0 + bqn)[:, 1:-1]
            bc = (2.0 * bcc - bc0 + bcn)[:, 1:-1]
            b1 = (bq + bc) * half_norm * icnt          # binned |F1|^2
            b2 = (bq - bc) * half_norm * icnt          # binned |F2|^2
            return jnp.concatenate([b1, b2])

        out = step(0)
        _ = np.asarray(out)
        nrep = int(os.environ.get("BENCH_REPS", 20))
        t0 = time.perf_counter()
        for i in range(nrep):
            out = step(i + 1)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
        rate = nrep * batch / dt
        print(json.dumps({
            "metric": f"grf_fft_bin_pipelines_per_sec_{n}x{n}_fp32",
            "value": round(rate, 2),
            "unit": "pipelines/s",
            "vs_baseline": round(rate / 1000.0, 4),
        }))
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
    t0 = time.perf_counter()
    for i in range(nrep):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), npairs)
        out = step(keys)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    rate = nrep * batch / dt

    print(json.dumps({
        "metric": f"grf_fft_bin_pipelines_per_sec_{n}x{n}_fp32",
        "value": round(rate, 2),
        "unit": "pipelines/s",
        "vs_baseline": round(rate / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
