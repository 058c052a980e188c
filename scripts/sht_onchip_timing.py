"""On-chip timing + accuracy of the Pallas Legendre kernel vs the scan.

Run in the default axon env: python scripts/sht_onchip_timing.py [lmaxes...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orphics_tpu.ops import sht
from orphics_tpu.ops import pallas_sht as ps

print("backend:", jax.default_backend(), flush=True)


def mkalm(lmax, seed=5):
    nalm = (lmax + 1) * (lmax + 2) // 2

    @jax.jit
    def mk(key):
        kr, ki = jax.random.split(key)
        a = (jax.random.normal(kr, (nalm,), jnp.float32)
             + 1j * jax.random.normal(ki, (nalm,), jnp.float32))
        return a.at[: lmax + 1].set(
            jnp.real(a[: lmax + 1]).astype(jnp.complex64))

    return mk(jax.random.PRNGKey(seed))


maxerr = jax.jit(lambda a, b: jnp.abs(a - b).max())
amax = jax.jit(lambda a: jnp.abs(a).max())


def sync(x):
    return float(np.asarray(x))


def time_roundtrip(fn, a0, nrep=5):
    a = fn(a0)
    sync(amax(a))                       # warm/compile
    t0 = time.perf_counter()
    for _ in range(nrep):
        a = fn(a0)
    sync(amax(a))
    return (time.perf_counter() - t0) / nrep, a


for lmax in [int(v) for v in (sys.argv[1:] or [1023, 2047, 4095])]:
    rings = sht.gauss_legendre_rings(lmax)
    a0 = mkalm(lmax)

    def rt_pl(a):
        return ps.map2alm_pl(ps.alm2map_pl(a, rings, lmax), rings, lmax)

    t_pl, a_pl = time_roundtrip(rt_pl, a0)
    err_pl = sync(maxerr(a_pl, a0))
    print(f"lmax {lmax}: pallas roundtrip {t_pl*1e3:8.1f} ms  "
          f"maxerr {err_pl:.2e}", flush=True)

    def rt_scan(a):
        return sht._map2alm_impl(
            sht._alm2map_impl(a, sht._tables_for(rings, lmax, (0,),
                                                 np.float32),
                              rings=rings, lmax=lmax),
            sht._tables_for(rings, lmax, (0,), np.float32),
            rings=rings, lmax=lmax)

    t_sc, a_sc = time_roundtrip(rt_scan, a0, nrep=2)
    err_sc = sync(maxerr(a_sc, a0))
    print(f"lmax {lmax}: scan   roundtrip {t_sc*1e3:8.1f} ms  "
          f"maxerr {err_sc:.2e}  speedup {t_sc/t_pl:.1f}x", flush=True)

# packed batched path: maps per second at batch 8 vs 1
# (1535 probes the VMEM worst case: mtile=128 with Lp=1536 at pack=2)
for lmax in (1023, 1535, 2047):
    rings = sht.gauss_legendre_rings(lmax)
    a1 = mkalm(lmax)
    aB = jnp.stack([mkalm(lmax, s) for s in range(8)])

    def rt(a):
        return ps.map2alm_pl(ps.alm2map_pl(a, rings, lmax), rings, lmax)

    t1, _ = time_roundtrip(rt, a1)
    tB, aB2 = time_roundtrip(rt, aB, nrep=3)
    errB = sync(maxerr(aB2, aB))
    print(f"lmax {lmax}: batch-8 packed {tB*1e3:8.1f} ms "
          f"({8/tB:6.1f} maps/s vs {1/t1:6.1f} unbatched)  "
          f"maxerr {errB:.2e}", flush=True)

# spin-2 at one band limit
lmax = 1023
rings = sht.gauss_legendre_rings(lmax)
e0, b0 = mkalm(lmax, 11), mkalm(lmax, 12)
z2 = lambda a: sht._mat2alm(sht._alm2mat(a, lmax).at[:2, :].set(0), lmax)
e0, b0 = jax.jit(z2)(e0), jax.jit(z2)(b0)


def rt2(eb):
    q, u = ps.alm2map_spin_pl(eb[0], eb[1], rings, lmax)
    return jnp.stack(ps.map2alm_spin_pl(q, u, rings, lmax))


eb0 = jnp.stack([e0, b0])
t2, eb2 = time_roundtrip(rt2, eb0)
err2 = sync(maxerr(eb2, eb0))
print(f"spin-2 lmax {lmax}: pallas roundtrip {t2*1e3:8.1f} ms  "
      f"maxerr {err2:.2e}", flush=True)
