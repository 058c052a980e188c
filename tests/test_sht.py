"""Spherical-harmonic transform validation.

Strategy (mirrors the reference's own validation style for curved-sky
code, which leans on healpy/pixell as ground truth): here the ground
truth is (a) scipy's spherical harmonics for spin-0, (b) a brute-force
Wigner-d sum formula at small l for the spin columns, (c) machine-
precision roundtrips and per-l spectrum recovery at full scale.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.special import gammaln

from orphics_tpu.ops import sht
from orphics_tpu.ops import alm as almops


def wigner_d_brute(l, m, n, beta):
    """Explicit Wigner small-d sum formula (f64; stable for small l)."""
    smin = max(0, n - m)
    smax = min(l + n, l - m)
    if smax < smin:
        return np.zeros_like(np.asarray(beta, float))
    c = np.cos(beta / 2.0)
    s = np.sin(beta / 2.0)
    lf = lambda v: gammaln(v + 1.0)
    pref = 0.5 * (lf(l + m) + lf(l - m) + lf(l + n) + lf(l - n))
    tot = 0.0
    for k in range(smin, smax + 1):
        lt = pref - lf(l + n - k) - lf(k) - lf(m - n + k) - lf(l - m - k)
        tot = tot + (-1.0) ** (m - n + k) * np.exp(lt) \
            * c ** (2 * l + n - m - 2 * k) * s ** (m - n + 2 * k)
    return tot


def get_lambda(lmax, theta, n):
    """Extract Lambda^{m,n}_l(theta) for all (l, m) from the scan."""
    T = len(theta)
    Lpad = -(-(lmax + 1) // sht._LBLOCK) * sht._LBLOCK
    out0 = jnp.zeros((Lpad, lmax + 1, T))

    def contract(l_base, lam_blk, out, _):
        from jax import lax
        return lax.dynamic_update_slice_in_dim(out, lam_blk[:, 0], l_base,
                                               axis=0)

    out = sht._lambda_scan(lmax, np.asarray(theta), (n,),
                           jnp.float64, contract, out0)
    return np.asarray(out)[: lmax + 1]


THETAS = np.array([0.013, 0.3, 1.0, np.pi / 2, 2.2, np.pi - 0.013])


class TestWigner:
    def test_spin0_vs_scipy(self):
        from scipy.special import sph_harm_y
        lmax = 40
        lam = get_lambda(lmax, THETAS, 0)
        for l in range(lmax + 1):
            for m in range(l + 1):
                want = np.array([sph_harm_y(l, m, t, 0.0).real
                                 for t in THETAS])
                np.testing.assert_allclose(lam[l, m], want, atol=1e-12)

    @pytest.mark.parametrize("n", [-2, 2, -1, 3])
    def test_spin_columns_vs_brute(self, n):
        lmax = 12
        lam = get_lambda(lmax, THETAS, n)
        for l in range(abs(n), lmax + 1):
            norm = np.sqrt((2 * l + 1) / (4 * np.pi))
            for m in range(l + 1):
                want = wigner_d_brute(l, m, n, THETAS) * norm
                np.testing.assert_allclose(lam[l, m], want, atol=1e-11)

    def test_lambda_zero_below_l0(self):
        lam = get_lambda(8, THETAS, -2)
        assert np.all(lam[0] == 0) and np.all(lam[1] == 0)
        # m > l also zero
        assert np.all(lam[3, 5:] == 0)


def _random_alm(key, lmax, lmin=0, dtype=jnp.complex128):
    cl = 1.0 / (np.arange(lmax + 1) + 10.0) ** 2
    a = almops.synalm(key, jnp.asarray(cl), lmax=lmax, dtype=dtype)
    if lmin > 0:
        ls, _ = almops.lm_indices(lmax)
        a = a * (jnp.asarray(ls) >= lmin)
    return a


class TestRoundtrip:
    @pytest.mark.parametrize("grid", ["gl", "cc"])
    def test_spin0_f64(self, grid):
        lmax = 63
        rings = (sht.gauss_legendre_rings(lmax) if grid == "gl"
                 else sht.clenshaw_curtis_rings(2 * lmax + 2))
        a0 = _random_alm(jax.random.PRNGKey(0), lmax)
        m = sht.alm2map(a0, rings, lmax)
        a1 = sht.map2alm(m, rings, lmax)
        err = np.max(np.abs(np.asarray(a1 - a0)))
        assert err < 1e-12 * np.max(np.abs(np.asarray(a0)))

    def test_spin2_f64(self):
        lmax = 63
        rings = sht.gauss_legendre_rings(lmax)
        ae = _random_alm(jax.random.PRNGKey(1), lmax, lmin=2)
        ab = _random_alm(jax.random.PRNGKey(2), lmax, lmin=2)
        q, u = sht.alm2map_spin(ae, ab, rings, lmax)
        ae1, ab1 = sht.map2alm_spin(q, u, rings, lmax)
        scale = np.max(np.abs(np.asarray(ae)))
        assert np.max(np.abs(np.asarray(ae1 - ae))) < 1e-12 * scale
        assert np.max(np.abs(np.asarray(ab1 - ab))) < 1e-12 * scale

    def test_f32_high_lmax(self):
        """fp32 path with extended-exponent rescaling (seeds underflow
        fp32 at m ~ 100s near the poles; a broken rescale shows O(1)
        errors here)."""
        lmax = 255
        rings = sht.gauss_legendre_rings(lmax)
        a0 = _random_alm(jax.random.PRNGKey(3), lmax, dtype=jnp.complex64)
        m = sht.alm2map(a0, rings, lmax)
        assert m.dtype == jnp.float32
        a1 = sht.map2alm(m, rings, lmax)
        cl0 = np.asarray(almops.alm2cl(a0))
        cl1 = np.asarray(almops.alm2cl(a1))
        np.testing.assert_allclose(cl1[2:], cl0[2:], rtol=2e-4)

    def test_f32_compensated_modes(self):
        """The fp32 recurrence compensation ladder (sht._COMPENSATE):
        "full" (Dekker TwoProd dd, the default) must land the fp32
        roundtrip at the few-ulp level — two orders of magnitude below
        plain fp32 — and "lite" in between. Guards both the dd algebra
        and the device-argument table plumbing (_scan_tables_host)."""
        lmax = 255
        rings = sht.gauss_legendre_rings(lmax)
        a0 = _random_alm(jax.random.PRNGKey(5), lmax, dtype=jnp.complex64)
        errs = {}
        old = sht._COMPENSATE
        try:
            for mode in ("off", "lite", "full"):
                sht._COMPENSATE = mode
                jax.clear_caches()
                m = sht.alm2map(a0, rings, lmax)
                a1 = sht.map2alm(m, rings, lmax)
                errs[mode] = float(np.max(np.abs(np.asarray(a1 - a0))))
        finally:
            sht._COMPENSATE = old
            jax.clear_caches()
        scale = float(np.max(np.abs(np.asarray(a0))))
        assert errs["full"] < 2e-6 * scale, errs
        assert errs["full"] < 0.05 * errs["off"], errs
        assert errs["lite"] <= errs["off"] * 1.05, errs

    def test_outer_jit_no_tracer_leak(self):
        """Transforms called under an OUTER jit must not poison the
        device-table caches with tracers (regression: _scan_tables_dev /
        pallas _prep_dev cached `jnp.asarray` results, which are tracers
        inside a trace -> UnexpectedTracerError on the next call). Run
        traced first, then eager, then traced again with a different
        closure — all three must agree."""
        lmax = 31
        rings = sht.gauss_legendre_rings(lmax)
        a0 = _random_alm(jax.random.PRNGKey(11), lmax)

        @jax.jit
        def traced(a):
            return sht.map2alm(sht.alm2map(a, rings, lmax), rings, lmax)

        r1 = traced(a0)
        r2 = sht.map2alm(sht.alm2map(a0, rings, lmax), rings, lmax)
        r3 = jax.jit(lambda a: sht.alm2map(a, rings, lmax))(a0)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(a0),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(a0),
                                   atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(r3), np.asarray(sht.alm2map(a0, rings, lmax)),
            atol=1e-12)

    def test_batched(self):
        lmax = 31
        rings = sht.gauss_legendre_rings(lmax)
        alms = jnp.stack([_random_alm(jax.random.PRNGKey(i), lmax)
                          for i in range(3)])
        maps = sht.alm2map(alms, rings, lmax)
        assert maps.shape == (3,) + rings.shape
        back = sht.map2alm(maps, rings, lmax)
        np.testing.assert_allclose(np.asarray(back), np.asarray(alms),
                                   atol=1e-12)

    def test_pol_stack(self):
        lmax = 31
        rings = sht.gauss_legendre_rings(lmax)
        teb = jnp.stack([_random_alm(jax.random.PRNGKey(i), lmax, lmin=2)
                         for i in range(3)])
        tqu = sht.alm2map_pol(teb, rings, lmax)
        assert tqu.shape == (3,) + rings.shape
        teb1 = sht.map2alm_pol(tqu, rings, lmax)
        np.testing.assert_allclose(np.asarray(teb1), np.asarray(teb),
                                   atol=1e-12)


class TestConventions:
    def test_monopole_dipole(self):
        """A constant map is sqrt(4pi) a_00; Y_10 synthesis matches the
        explicit formula sqrt(3/4pi) cos(theta)."""
        lmax = 8
        rings = sht.gauss_legendre_rings(lmax)
        const = jnp.ones(rings.shape)
        a = np.asarray(sht.map2alm(const, rings, lmax))
        assert abs(a[0] - np.sqrt(4 * np.pi)) < 1e-12
        assert np.max(np.abs(a[1:])) < 1e-12

        a10 = jnp.zeros(almops.nalm(lmax), jnp.complex128).at[1].set(1.0)
        m = np.asarray(sht.alm2map(a10, rings, lmax))
        theta = rings.theta_array()
        want = np.sqrt(3 / (4 * np.pi)) * np.cos(theta)
        np.testing.assert_allclose(m[:, 0], want, atol=1e-12)

    def test_y11_condon_shortley(self):
        """Y_11 = -sqrt(3/8pi) sin(theta) e^{i phi} (CS phase, healpy)."""
        lmax = 4
        rings = sht.gauss_legendre_rings(lmax)
        idx_11 = lmax + 1  # packed index of (l=1, m=1)
        a = jnp.zeros(almops.nalm(lmax), jnp.complex128).at[idx_11].set(1.0)
        m = np.asarray(sht.alm2map(a, rings, lmax))
        theta = rings.theta_array()
        phi = rings.phi0 + 2 * np.pi * np.arange(rings.nphi) / rings.nphi
        # real field synthesis: a_11 Y_11 + a_1,-1 Y_1,-1 with
        # a_1,-1 = -conj(a_11) => 2 Re[Y_11]
        want = 2 * (-np.sqrt(3 / (8 * np.pi))) * np.outer(
            np.sin(theta), np.cos(phi))
        np.testing.assert_allclose(m, want, atol=1e-12)

    def test_spin2_brute_synthesis(self):
        """alm2map_spin against a brute-force sum over explicit
        spin-weighted harmonics sY_lm = (-1)^s N_l d^l_{m,-s} e^{im phi},
        with (Q+iU) = -sum (E+iB) 2Y (healpy/ZS convention)."""
        lmax = 6
        rings = sht.gauss_legendre_rings(lmax, nphi=16)
        ae = _random_alm(jax.random.PRNGKey(5), lmax, lmin=2)
        ab = _random_alm(jax.random.PRNGKey(6), lmax, lmin=2)
        q, u = sht.alm2map_spin(ae, ab, rings, lmax)

        theta = rings.theta_array()
        phi = rings.phi0 + 2 * np.pi * np.arange(rings.nphi) / rings.nphi
        ls, ms = almops.lm_indices(lmax)
        aE = np.asarray(ae)
        aB = np.asarray(ab)
        P = np.zeros((len(theta), len(phi)), complex)  # Q + iU
        for l in range(2, lmax + 1):
            norm = np.sqrt((2 * l + 1) / (4 * np.pi))
            for m in range(-l, l + 1):
                if m >= 0:
                    i = almops.nalm(lmax) * 0 + m * (2 * lmax + 1 - m) // 2 + l
                    E, B = aE[i], aB[i]
                else:
                    i = (-m) * (2 * lmax + 1 + m) // 2 + l
                    E = (-1) ** m * np.conj(aE[i])
                    B = (-1) ** m * np.conj(aB[i])
                sY = norm * wigner_d_brute(l, m, -2, theta)[:, None] \
                    * np.exp(1j * m * phi)[None, :]
                P += -(E + 1j * B) * sY
        np.testing.assert_allclose(np.asarray(q), P.real, atol=1e-10)
        np.testing.assert_allclose(np.asarray(u), P.imag, atol=1e-10)


class TestQuadrature:
    def test_cc_weights_exact(self):
        rings = sht.clenshaw_curtis_rings(33)
        theta = rings.theta_array()
        w = rings.weights_array()
        for k in range(0, 30):
            want = (1 + np.cos(np.pi * k)) / (1 - k ** 2) if k != 1 else 0.0
            got = np.sum(w * np.cos(k * theta))
            assert abs(got - want) < 1e-12, k

    def test_gl_weights_exact(self):
        rings = sht.gauss_legendre_rings(16)
        x = np.cos(rings.theta_array())
        w = rings.weights_array()
        for p in range(0, 33):
            want = (1 - (-1) ** (p + 1)) / (p + 1)
            assert abs(np.sum(w * x ** p) - want) < 1e-12, p

    def test_nphi_alias_guard(self):
        rings = sht.gauss_legendre_rings(16, nphi=8)
        with pytest.raises(ValueError):
            sht.map2alm(jnp.ones(rings.shape), rings, 16)


class TestPallasSHT:
    """The Pallas Legendre-transform kernel (ops/pallas_sht.py) vs the
    scan path in "full" mode, interpret mode on CPU."""

    def test_parity_and_roundtrip(self):
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 63
        rings = sht.gauss_legendre_rings(lmax)
        a0 = _random_alm(jax.random.PRNGKey(11), lmax,
                         dtype=jnp.complex64)
        old = sht._COMPENSATE
        try:
            sht._COMPENSATE = "full"
            jax.clear_caches()
            m_ref = np.asarray(sht.alm2map(a0, rings, lmax))
            m_pl = np.asarray(ps.alm2map_pl(a0, rings, lmax,
                                            interpret=True))
            assert np.abs(m_pl - m_ref).max() < 1e-6 * np.abs(m_ref).max()
            a_ref = np.asarray(sht.map2alm(jnp.asarray(m_ref), rings,
                                           lmax))
            a_pl = np.asarray(ps.map2alm_pl(jnp.asarray(m_ref), rings,
                                            lmax, interpret=True))
            assert np.abs(a_pl - a_ref).max() < 1e-6 * np.abs(a_ref).max()
        finally:
            sht._COMPENSATE = old
            jax.clear_caches()
        # kernel-only roundtrip at the dd-full accuracy level
        a2 = np.asarray(ps.map2alm_pl(
            ps.alm2map_pl(a0, rings, lmax, interpret=True), rings, lmax,
            interpret=True))
        assert np.abs(a2 - np.asarray(a0)).max() < 3e-6

    def test_multi_tile_revisit(self, monkeypatch):
        """Exercise the multi-tile grid — cross-ring-tile (jt > 0)
        output accumulation and multiple m tiles — in interpret mode.
        The default tiles give a (1, 1) grid at every CPU-testable
        lmax, which would leave the revisit init/accumulate logic
        covered only by the opt-in on-chip tests."""
        from orphics_tpu.ops import pallas_sht as ps
        monkeypatch.setattr(ps, "_tiles", lambda lmax: (8, 8))
        lmax = 31
        rings = sht.gauss_legendre_rings(lmax)
        a0 = _random_alm(jax.random.PRNGKey(17), lmax,
                         dtype=jnp.complex64)
        m = ps.alm2map_pl(a0, rings, lmax, interpret=True)
        a2 = ps.map2alm_pl(m, rings, lmax, interpret=True)
        assert np.abs(np.asarray(a2 - a0)).max() < 3e-6
        # spin-2 through the same tiny-tile grid
        def spin_alm(s):
            a = _random_alm(jax.random.PRNGKey(s), lmax,
                            dtype=jnp.complex64)
            mat = sht._alm2mat(a, lmax).at[:2, :].set(0)
            return sht._mat2alm(mat, lmax)
        e0, b0 = spin_alm(41), spin_alm(42)
        q, u = ps.alm2map_spin_pl(e0, b0, rings, lmax, interpret=True)
        e2, b2 = ps.map2alm_spin_pl(q, u, rings, lmax, interpret=True)
        assert float(jnp.abs(e2 - e0).max()) < 3e-6
        assert float(jnp.abs(b2 - b0).max()) < 3e-6

    def test_f64_inputs_rejected(self):
        """Direct kernel calls must refuse 64-bit inputs instead of
        silently downcasting (the dispatcher keeps them on the scan
        path, which delivers ~1e-12)."""
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 31
        rings = sht.gauss_legendre_rings(lmax)
        nalm = (lmax + 1) * (lmax + 2) // 2
        with pytest.raises(TypeError, match="float32"):
            ps.map2alm_pl(jnp.zeros(rings.shape, jnp.float64), rings,
                          lmax, interpret=True)
        with pytest.raises(TypeError, match="float32"):
            ps.alm2map_pl(jnp.zeros((nalm,), jnp.complex128), rings,
                          lmax, interpret=True)

    def test_probe_degrades_gracefully(self, monkeypatch):
        """If the kernel canary fails (e.g. the accelerator's compile
        helper rejects Mosaic), dispatch must permanently fall back to
        the scan path with a warning — never crash user pipelines."""
        from orphics_tpu.ops import pallas_sht as ps
        monkeypatch.setitem(sht._PALLAS_PROBE, "done", False)
        monkeypatch.setitem(sht._PALLAS_PROBE, "ok", True)

        def boom(*a, **k):
            raise RuntimeError("mosaic compile helper crashed")

        monkeypatch.setattr(ps, "alm2map_pl", boom)
        with pytest.warns(UserWarning, match="scan path"):
            assert sht._pallas_probe_ok() is False
        assert sht._pallas_probe_ok() is False   # cached, no re-probe
        # and a canary that produced garbage instead of raising
        monkeypatch.setitem(sht._PALLAS_PROBE, "done", False)
        monkeypatch.setattr(ps, "alm2map_pl",
                            lambda a, r, l, **k: jnp.full(r.shape, jnp.nan))
        monkeypatch.setattr(
            ps, "map2alm_pl",
            lambda m, r, l, **k: jnp.full(((l + 1) * (l + 2) // 2,),
                                          jnp.nan, jnp.complex64))
        with pytest.warns(UserWarning, match="canary"):
            assert sht._pallas_probe_ok() is False

    def test_non_multiple_lmax(self):
        """lmax + 1 not divisible by the unroll/tile sizes: padding
        (zero tables, l0 = -1 columns) must be exact."""
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 45
        rings = sht.gauss_legendre_rings(lmax)
        a0 = _random_alm(jax.random.PRNGKey(13), lmax,
                         dtype=jnp.complex64)
        a2 = np.asarray(ps.map2alm_pl(
            ps.alm2map_pl(a0, rings, lmax, interpret=True), rings, lmax,
            interpret=True))
        assert np.abs(a2 - np.asarray(a0)).max() < 3e-6

    def test_batched_wrapper(self):
        """Leading batch dims loop the compiled kernel per map."""
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 31
        rings = sht.gauss_legendre_rings(lmax)
        alms = jnp.stack([
            _random_alm(jax.random.PRNGKey(s), lmax, dtype=jnp.complex64)
            for s in (1, 2, 3)])
        maps = ps.alm2map_pl(alms, rings, lmax, interpret=True)
        assert maps.shape == (3, rings.ntheta, rings.nphi)
        for i in range(3):
            ref = ps.alm2map_pl(alms[i], rings, lmax, interpret=True)
            assert np.abs(np.asarray(maps[i]) - np.asarray(ref)).max() == 0
        a2 = ps.map2alm_pl(maps, rings, lmax, interpret=True)
        assert a2.shape == alms.shape
        assert np.abs(np.asarray(a2) - np.asarray(alms)).max() < 3e-6

    def test_empty_batch(self):
        """Zero-length batches return empty results (scan-path parity)
        instead of crashing in the chunk loop."""
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 31
        rings = sht.gauss_legendre_rings(lmax)
        nalm = (lmax + 1) * (lmax + 2) // 2
        m = ps.alm2map_pl(jnp.zeros((0, nalm), jnp.complex64), rings,
                          lmax, interpret=True)
        assert m.shape == (0, rings.ntheta, rings.nphi)
        a = ps.map2alm_pl(jnp.zeros((0,) + rings.shape, jnp.float32),
                          rings, lmax, interpret=True)
        assert a.shape == (0, nalm)
        q, u = ps.alm2map_spin_pl(jnp.zeros((0, nalm), jnp.complex64),
                                  jnp.zeros((0, nalm), jnp.complex64),
                                  rings, lmax, interpret=True)
        assert q.shape == u.shape == (0, rings.ntheta, rings.nphi)

    def test_spin2_batched_packed(self):
        """Batched spin-2 goes through the packed (multi-map) kernels;
        parity with the per-map path."""
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 31
        rings = sht.gauss_legendre_rings(lmax)
        def spin_alm(s):
            a = _random_alm(jax.random.PRNGKey(s), lmax,
                            dtype=jnp.complex64)
            mat = sht._alm2mat(a, lmax).at[:2, :].set(0)
            return sht._mat2alm(mat, lmax)
        es = jnp.stack([spin_alm(s) for s in (5, 6, 7)])
        bs = jnp.stack([spin_alm(s) for s in (8, 9, 10)])
        q, u = ps.alm2map_spin_pl(es, bs, rings, lmax, interpret=True)
        assert q.shape == (3, rings.ntheta, rings.nphi)
        for i in range(3):
            qr, ur = ps.alm2map_spin_pl(es[i], bs[i], rings, lmax,
                                        interpret=True)
            sc = float(jnp.abs(qr).max())
            assert float(jnp.abs(q[i] - qr).max()) < 1e-6 * sc
            assert float(jnp.abs(u[i] - ur).max()) < 1e-6 * sc
        e2, b2 = ps.map2alm_spin_pl(q, u, rings, lmax, interpret=True)
        assert e2.shape == es.shape
        assert float(jnp.abs(e2 - es).max()) < 3e-6
        assert float(jnp.abs(b2 - bs).max()) < 3e-6

    def test_spin2_parity_and_roundtrip(self):
        """Spin-2 as two n = -+2 kernel launches vs the scan path."""
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 63
        rings = sht.gauss_legendre_rings(lmax)
        ke, kb = jax.random.split(jax.random.PRNGKey(21))
        def spin_alm(k):
            a = _random_alm(k, lmax, dtype=jnp.complex64)
            mat = sht._alm2mat(a, lmax).at[:2, :].set(0)  # l0 = 2
            return sht._mat2alm(mat, lmax)
        e0, b0 = spin_alm(ke), spin_alm(kb)
        old = sht._COMPENSATE
        try:
            sht._COMPENSATE = "full"
            jax.clear_caches()
            q_ref, u_ref = sht.alm2map_spin(e0, b0, rings, lmax)
            q_ref = np.asarray(q_ref); u_ref = np.asarray(u_ref)
            q_pl, u_pl = ps.alm2map_spin_pl(e0, b0, rings, lmax,
                                            interpret=True)
            scale = max(np.abs(q_ref).max(), np.abs(u_ref).max())
            assert np.abs(np.asarray(q_pl) - q_ref).max() < 1e-6 * scale
            assert np.abs(np.asarray(u_pl) - u_ref).max() < 1e-6 * scale
            e_ref, b_ref = sht.map2alm_spin(
                jnp.asarray(q_ref, jnp.float32),
                jnp.asarray(u_ref, jnp.float32), rings, lmax)
            e_pl, b_pl = ps.map2alm_spin_pl(q_ref.astype(np.float32),
                                            u_ref.astype(np.float32),
                                            rings, lmax, interpret=True)
            assert np.abs(np.asarray(e_pl) - np.asarray(e_ref)).max() < 2e-6
            assert np.abs(np.asarray(b_pl) - np.asarray(b_ref)).max() < 2e-6
        finally:
            sht._COMPENSATE = old
            jax.clear_caches()
        # kernel-only roundtrip
        e2, b2 = ps.map2alm_spin_pl(q_pl, u_pl, rings, lmax,
                                    interpret=True)
        assert np.abs(np.asarray(e2) - np.asarray(e0)).max() < 3e-6
        assert np.abs(np.asarray(b2) - np.asarray(b0)).max() < 3e-6


class TestValidation:
    """Review regressions: silent-wrong-output paths now raise."""

    def test_odd_spin_rejected(self):
        lmax = 15
        rings = sht.gauss_legendre_rings(lmax)
        a = _random_alm(jax.random.PRNGKey(0), lmax, lmin=1)
        with pytest.raises(NotImplementedError, match="even spin"):
            sht.alm2map_spin(a, a, rings, lmax, spin=1)
        m = jnp.zeros(rings.shape)
        with pytest.raises(NotImplementedError, match="even spin"):
            sht.map2alm_spin(m, m, rings, lmax, spin=3)

    def test_synthesis_nyquist_guard(self):
        """nphi == 2*mmax (even) used to silently halve the top-m mode
        on the irfft Nyquist bin; now mirrors the analysis error."""
        lmax = 4
        rings = sht.gauss_legendre_rings(lmax, nphi=8)  # 8 == 2*lmax
        a = _random_alm(jax.random.PRNGKey(1), lmax)
        with pytest.raises(ValueError, match="alias"):
            sht.alm2map(a, rings, lmax)

    def test_map_nphi_mismatch_rejected(self):
        lmax = 15
        rings = sht.gauss_legendre_rings(lmax)
        bad = jnp.zeros((rings.ntheta, rings.nphi + 4))
        with pytest.raises(ValueError, match="nphi"):
            sht.map2alm(bad, rings, lmax)

    def test_getlmax_zero_rejected(self):
        with pytest.raises(ValueError, match="alm length"):
            almops.getlmax(0)

    def test_alm2cl_stacked(self):
        """alm2cl on a (B, nalm) stack (the healpy array contract)
        equals per-row alm2cl."""
        lmax = 15
        alms = jnp.stack([_random_alm(jax.random.PRNGKey(i), lmax)
                          for i in range(3)])
        cls = np.asarray(almops.alm2cl(alms))
        assert cls.shape == (3, lmax + 1)
        for i in range(3):
            np.testing.assert_allclose(
                cls[i], np.asarray(almops.alm2cl(alms[i])), rtol=1e-12)


class TestFoldedKernel:
    """North-south folded Pallas kernels (round 4): parity vs the scan
    path at both ring-count parities, dead-tile table sanity, and the
    asymmetric-grid fallback."""

    def test_fold_engages_on_symmetric_grids(self):
        from orphics_tpu.ops import pallas_sht as ps
        assert ps._rings_symmetric(sht.gauss_legendre_rings(33))
        assert ps._rings_symmetric(sht.clenshaw_curtis_rings(33))

    def test_asymmetric_rings_fall_back_unfolded(self):
        from orphics_tpu.ops import pallas_sht as ps
        rings = sht.gauss_legendre_rings(16)
        th = np.asarray(rings.theta_array())
        th[0] *= 0.9                       # break the symmetry
        bad = sht.RingGeom(theta=tuple(th.tolist()),
                           weights=rings.weights,
                           nphi=rings.nphi)
        assert not ps._rings_symmetric(bad)

    @pytest.mark.parametrize("lmax", [33, 64])   # even + odd ntheta
    def test_fold_matches_scan_both_parities(self, lmax):
        from orphics_tpu.ops import pallas_sht as ps
        rings = sht.gauss_legendre_rings(lmax)
        assert rings.ntheta % 2 == (1 if lmax % 2 == 0 else 0)
        rng = np.random.default_rng(0)
        m = jnp.asarray(rng.standard_normal(rings.shape).astype(np.float32))
        a_pl = ps.map2alm_pl(m, rings, lmax, interpret=True)
        a_sc = sht.map2alm(m, rings, lmax)
        assert float(jnp.abs(a_pl - a_sc).max()
                     / jnp.abs(a_sc).max()) < 2e-6
        m_pl = ps.alm2map_pl(a_sc, rings, lmax, interpret=True)
        m_sc = sht.alm2map(a_sc, rings, lmax)
        assert float(jnp.abs(m_pl - m_sc).max()
                     / jnp.abs(m_sc).max()) < 2e-6

    def test_packed_fold_matches_scan(self):
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 48
        rings = sht.gauss_legendre_rings(lmax)
        rng = np.random.default_rng(1)
        mb = jnp.asarray(rng.standard_normal(
            (3,) + rings.shape).astype(np.float32))
        ab = ps.map2alm_pl(mb, rings, lmax, interpret=True)
        ab_s = sht.map2alm(mb, rings, lmax)
        assert float(jnp.abs(ab - ab_s).max()
                     / jnp.abs(ab_s).max()) < 2e-6
        mb_pl = ps.alm2map_pl(ab_s, rings, lmax, interpret=True)
        mb_s = sht.alm2map(ab_s, rings, lmax)
        assert float(jnp.abs(mb_pl - mb_s).max()
                     / jnp.abs(mb_s).max()) < 2e-6

    def test_dead_tile_table(self):
        """At large lmax some polar-ring-tile x high-m-tile programs are
        marked dead; every live tile runs the full chunk count; and the
        margin keeps everything below the turning point. Round 5: the
        bounds table also carries the per-tile captured-seed loop START
        (min l_s over the tile) — it must never precede the old m-base
        start, and must beat it on polar tiles (the ring skip)."""
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 2047
        rings = sht.gauss_legendre_rings(lmax)
        bounds = ps._prep_host(lmax, rings, 128, 256, fold=True)["bounds"]
        n_im = bounds.shape[0] // 3
        lstart, tab, shi = (bounds[:n_im], bounds[n_im:2 * n_im],
                            bounds[2 * n_im:])
        nch = -(-(lmax + 1) // ps._UNROLL)
        assert set(np.unique(tab)) <= {0, nch}
        assert (tab == 0).any()            # some dead tiles at 2047
        # equatorial ring tile (last jt) is never dead
        assert np.all(tab[:, -1] == nch)
        # dead only where the whole tile sits below the turning point
        th = np.asarray(rings.theta_array())[: (rings.ntheta + 1) // 2]
        for im in range(tab.shape[0]):
            for jt in range(tab.shape[1]):
                if tab[im, jt] == 0:
                    rows = th[jt * 256: (jt + 1) * 256]
                    assert im * 128 > lmax * np.max(np.sin(rows))
        # captured-seed starts: never before the old m-base start, and
        # strictly later on the polar ring tile at moderate-to-high m
        live = tab > 0
        old_start = (np.arange(n_im) * 128 // ps._UNROLL)[:, None]
        assert np.all(lstart[live] >= np.broadcast_to(
            old_start, lstart.shape)[live])
        assert np.all(lstart <= tab)
        assert np.all(shi <= tab) and np.all(shi[live] >= lstart[live])
        polar = lstart[n_im // 2, 0]       # m ~ lmax/2, most-polar rings
        assert polar > old_start[n_im // 2, 0], \
            "per-(ring,m) l_s start did not engage on the polar tile"
        # the skip must claim a real fraction of the total work at 2047
        tot_old = np.sum(np.maximum(tab - np.broadcast_to(
            old_start, lstart.shape), 0)[live])
        tot_new = np.sum((tab - lstart)[live])
        # measured 0.858 at (mtile, ttile) = (128, 256): the tile min
        # over 256 rings x 128 m's limits the skip (per-lane ideal is
        # 0.68); guard that at least ~2/3 of that gain stays
        assert tot_new < 0.9 * tot_old, (tot_new, tot_old)


class TestFoldedSpin:
    """Round-4 spin fold: the Wigner-d reflection d(pi-th) =
    (-1)^(l+m) d_{n->-n}(th) assembled at the wrapper level from
    half-ring packed launches — parity with the scan path at both
    ring-count parities, single and batched."""

    @pytest.mark.parametrize("lmax", [33, 32])
    def test_spin_fold_matches_scan(self, lmax):
        from orphics_tpu.ops import pallas_sht as ps
        rings = sht.gauss_legendre_rings(lmax)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal(rings.shape).astype(np.float32))
        u = jnp.asarray(rng.standard_normal(rings.shape).astype(np.float32))
        e_pl, b_pl = ps.map2alm_spin_pl(q, u, rings, lmax, interpret=True)
        e_sc, b_sc = sht.map2alm_spin(q, u, rings, lmax)
        scale = float(jnp.abs(e_sc).max())
        assert float(jnp.abs(e_pl - e_sc).max()) < 2e-6 * scale
        assert float(jnp.abs(b_pl - b_sc).max()) < 2e-6 * scale
        q_pl, u_pl = ps.alm2map_spin_pl(e_sc, b_sc, rings, lmax,
                                        interpret=True)
        q_sc, u_sc = sht.alm2map_spin(e_sc, b_sc, rings, lmax)
        s2 = float(jnp.abs(q_sc).max())
        assert float(jnp.abs(q_pl - q_sc).max()) < 2e-6 * s2
        assert float(jnp.abs(u_pl - u_sc).max()) < 2e-6 * s2

    def test_spin_fold_batched(self):
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 32
        rings = sht.gauss_legendre_rings(lmax)
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal(
            (3,) + rings.shape).astype(np.float32))
        u = jnp.asarray(rng.standard_normal(
            (3,) + rings.shape).astype(np.float32))
        e_pl, b_pl = ps.map2alm_spin_pl(q, u, rings, lmax, interpret=True)
        e_sc, b_sc = sht.map2alm_spin(q, u, rings, lmax)
        scale = float(jnp.abs(e_sc).max())
        assert float(jnp.abs(e_pl - e_sc).max()) < 2e-6 * scale
        q_pl, u_pl = ps.alm2map_spin_pl(e_sc, b_sc, rings, lmax,
                                        interpret=True)
        q_sc, u_sc = sht.alm2map_spin(e_sc, b_sc, rings, lmax)
        s2 = float(jnp.abs(q_sc).max())
        assert float(jnp.abs(q_pl - q_sc).max()) < 2e-6 * s2
        assert float(jnp.abs(u_pl - u_sc).max()) < 2e-6 * s2


class TestFastMode:
    """The fast=True plain-fp32 recurrence (round 5): same seeds /
    bounds / folds as the dd kernels with the compensation channels
    dropped. Contract: close to the dd path (the fp32 random walk of
    a ~lmax-step recurrence, measured ~6e-5 rel at lmax 127), exact
    zero-batch/zero-map structure, and every code path (single,
    packed, fold, spin-fold) accepts the flag."""

    def test_fast_close_to_dd_all_paths(self):
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 63
        rings = sht.gauss_legendre_rings(lmax)
        a0 = _random_alm(jax.random.PRNGKey(21), lmax,
                         dtype=jnp.complex64)
        m_dd = ps.alm2map_pl(a0, rings, lmax, interpret=True)
        m_f = ps.alm2map_pl(a0, rings, lmax, interpret=True, fast=True)
        scale = float(jnp.abs(m_dd).max())
        assert float(jnp.abs(m_f - m_dd).max()) < 2e-4 * scale
        a_dd = ps.map2alm_pl(m_dd, rings, lmax, interpret=True)
        a_f = ps.map2alm_pl(m_dd, rings, lmax, interpret=True,
                            fast=True)
        s2 = float(jnp.abs(a_dd).max())
        assert float(jnp.abs(a_f - a_dd).max()) < 2e-4 * s2
        # packed path agrees with its own single-map path
        ab = jnp.stack([a0, 0.5 * a0, 2.0 * a0])
        mb = ps.alm2map_pl(ab, rings, lmax, interpret=True, fast=True)
        assert float(jnp.abs(mb[0] - m_f).max()) == 0.0

    def test_fast_spin_fold(self):
        from orphics_tpu.ops import pallas_sht as ps
        lmax = 32
        rings = sht.gauss_legendre_rings(lmax)
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.standard_normal(
            (2,) + rings.shape).astype(np.float32))
        u = jnp.asarray(rng.standard_normal(
            (2,) + rings.shape).astype(np.float32))
        e_dd, b_dd = ps.map2alm_spin_pl(q, u, rings, lmax,
                                        interpret=True)
        e_f, b_f = ps.map2alm_spin_pl(q, u, rings, lmax,
                                      interpret=True, fast=True)
        scale = float(jnp.abs(e_dd).max())
        assert float(jnp.abs(e_f - e_dd).max()) < 2e-4 * scale
        assert float(jnp.abs(b_f - b_dd).max()) < 2e-4 * scale
        q2, u2 = ps.alm2map_spin_pl(e_dd, b_dd, rings, lmax,
                                    interpret=True, fast=True)
        q_dd, u_dd = ps.alm2map_spin_pl(e_dd, b_dd, rings, lmax,
                                        interpret=True)
        s2 = float(jnp.abs(q_dd).max())
        assert float(jnp.abs(q2 - q_dd).max()) < 2e-4 * s2

    def test_dispatcher_accepts_fast(self):
        """sht.map2alm/alm2map take fast= (a no-op on the scan path)."""
        lmax = 16
        rings = sht.gauss_legendre_rings(lmax)
        a0 = _random_alm(jax.random.PRNGKey(3), lmax,
                         dtype=jnp.complex64)
        m = sht.alm2map(a0, rings, lmax, fast=True)
        a2 = sht.map2alm(m, rings, lmax, fast=True)
        assert float(jnp.abs(a2 - a0).max()) < 1e-4
        q, u = sht.alm2map_spin(a0, 0.5 * a0, rings, lmax, fast=True)
        sht.map2alm_spin(q, u, rings, lmax, fast=True)
