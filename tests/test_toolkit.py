"""Tests for the masked-spectra toolkit: distance transforms, windows,
noise models, split spectra, ILC, alm utilities."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orphics_tpu import rect_geometry
from orphics_tpu.ops import fourier as F
from orphics_tpu.ops.binning import Bin2D
from orphics_tpu.ops.distance import (distance_transform, cosine_apodize,
                                      grow_mask)
from orphics_tpu.ops.windows import cosine_window, get_taper
from orphics_tpu.ops import alm as almod
from orphics_tpu.models import noise as nz, splits as sp, ilc, grf, theory


@pytest.fixture(scope="module")
def geom():
    return rect_geometry(width_arcmin=128 * 2.0, px_res_arcmin=2.0)


@pytest.fixture(scope="module")
def th():
    return theory.default_theory()


def test_distance_transform_exact():
    """Jump flooding matches brute-force EDT on random seeds."""
    rng = np.random.default_rng(0)
    seeds = np.zeros((64, 64), bool)
    pts = rng.integers(0, 64, size=(12, 2))
    seeds[pts[:, 0], pts[:, 1]] = True
    got = np.asarray(distance_transform(jnp.asarray(seeds)))
    yy, xx = np.mgrid[0:64, 0:64]
    brute = np.min([(yy - p[0]) ** 2 + (xx - p[1]) ** 2 for p in pts], axis=0)
    brute = np.sqrt(brute)
    np.testing.assert_allclose(got, brute, atol=1e-3)


def test_cosine_apodize_properties(geom):
    mask = np.ones(geom.shape, np.float32)
    mask[:10, :] = 0
    apod = np.asarray(cosine_apodize(jnp.asarray(mask), geom, width_deg=0.5))
    assert apod.min() >= 0 and apod.max() <= 1
    assert np.all(apod[:10] == 0)          # masked stays masked
    assert np.all(apod[-1] > 0.99)         # far region untouched
    # monotone ramp away from the edge
    col = apod[:, 64]
    assert np.all(np.diff(col[10:25]) >= -1e-6)
    g = np.asarray(grow_mask(jnp.asarray(mask), geom, 10 * 2.909e-4))
    assert g[12, 5] == 0 and g[60, 5] == 1


def test_cosine_window_matches_reference_alg():
    """Independent numpy re-derivation of reference maps.py:1891."""
    got = np.asarray(cosine_window(32, 40, 6, 5, 2, 1))
    assert got[0, :].max() == 0 and got[:, 0].max() == 0
    assert abs(got[16, 20] - 1.0) < 1e-6
    # symmetric under flips modulo padding structure
    assert got.min() >= 0 and got.max() <= 1


def test_white_noise_level(geom):
    key = jax.random.PRNGKey(0)
    m = nz.white_noise(key, geom, noise_muK_arcmin=10.0)
    # rms in uK-arcmin: std * sqrt(pixarea)/arcmin
    rms = float(jnp.std(m)) * np.sqrt(geom.pixsize) / (np.pi / 180 / 60)
    assert abs(rms - 10.0) / 10.0 < 0.02, rms


def test_rednoise_and_noise_func():
    ells = np.arange(2, 4000)
    nl = np.asarray(nz.rednoise(ells, 10.0, lknee=3000.0, alpha=-4.0))
    white = (10.0 * np.pi / 180 / 60) ** 2
    assert abs(nl[-1] / white - (1 + (3000 / 3999.) ** 4)) < 0.02
    # noise_func = rednoise / beam^2
    nf = np.asarray(nz.noise_func(ells, 1.4, 10.0, lknee=3000.0, alpha=-4.0))
    b2 = np.asarray(F.gauss_beam(ells, 1.4)) ** 2
    np.testing.assert_allclose(nf, nl / b2, rtol=1e-5)


def test_get_atmosphere_table_points():
    lkt, at, lkp, ap = nz.get_atmosphere(1.4)
    assert at == -4.7
    assert 1000 < lkt < 5000
    assert 50 < lkp < 500


def test_noise_from_splits_recovers_noise(geom, th):
    """4 splits of signal+noise: noise estimate ~ N/nsplits; crosses ~ S."""
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    mgen = grf.MapGen(geom, cltt[None, None])
    noise_level = 20.0
    edges = np.arange(300, 4000, 300.0)
    binner = Bin2D(geom.modlmap_np(), edges)

    @jax.jit
    def sim(key):
        ks, kn = jax.random.split(key)
        signal = mgen.get_map(ks)
        nmaps = jax.vmap(lambda k: nz.white_noise(k, geom, noise_level))(
            jax.random.split(kn, 4))
        return signal[None] + nmaps

    @jax.jit
    def measure(key):
        splits = sim(key)
        noise2d, _ = sp.noise_from_splits(splits[:, None], geom, do_cross=False)
        return binner.bin(noise2d[0, 0])[1]

    nsims = 16
    out = np.asarray(jax.vmap(measure)(jax.random.split(jax.random.PRNGKey(3), nsims)))
    nl_expect = (noise_level * np.pi / 180 / 60) ** 2 / 4  # coadd noise = N/nsplits
    ratio = out.mean(axis=0) / nl_expect
    assert np.all(np.abs(ratio - 1) < 0.1), ratio


def test_split_calc_consistency(geom, th):
    ells = np.arange(th.lpad + 1)
    cltt = np.asarray(th.lCl("TT", ells))
    mgen = grf.MapGen(geom, cltt[None, None])
    key = jax.random.PRNGKey(1)
    ks, kn = jax.random.split(key)
    signal = mgen.get_map(ks)
    nmaps = jax.vmap(lambda k: nz.white_noise(k, geom, 30.0))(jax.random.split(kn, 4))
    splits = signal[None] + nmaps
    ksplits = F.fft2(splits, geom, "raw")
    kcoadd = ksplits.mean(axis=0)
    t1, c1, n1 = sp.split_calc(ksplits, ksplits, kcoadd, kcoadd, geom, alt=True)
    t2, c2, n2 = sp.split_calc(ksplits, ksplits, kcoadd, kcoadd, geom, alt=False)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-5)
    # both estimators should agree on average within noise scatter
    edges = np.arange(500, 3500, 500.0)
    binner = Bin2D(geom.modlmap_np(), edges)
    _, b1 = binner.bin(c1)
    _, b2 = binner.bin(c2)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=0.2, atol=1e-8)


def test_silc_cilc_closed_form():
    """ILC weights against hand-computed 2-band case."""
    C = np.array([[4.0, 1.0], [1.0, 2.0]])
    cinv = np.linalg.inv(C)
    kmaps = jnp.asarray(np.array([3.0, 5.0]))[:, None, None] * jnp.ones((2, 4, 4))
    cinv_j = jnp.asarray(cinv)[:, :, None, None] * jnp.ones((2, 2, 4, 4))
    out = np.asarray(ilc.silc(kmaps, cinv_j))
    a = np.ones(2)
    w = cinv @ a / (a @ cinv @ a)
    expect = w @ np.array([3.0, 5.0])
    np.testing.assert_allclose(out, expect, rtol=1e-5)
    # noise of the standard ILC
    nvar = np.asarray(ilc.silc_noise(cinv_j))
    np.testing.assert_allclose(nvar, 1.0 / (a @ cinv @ a), rtol=1e-5)
    # constrained ILC deprojects component b exactly
    b = np.array([1.0, 3.0])
    # map = pure b-component: cilc should return ~0
    kmaps_b = jnp.asarray(b)[:, None, None] * jnp.ones((2, 4, 4))
    out_c = np.asarray(ilc.cilc(kmaps_b, cinv_j, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out_c, 0.0, atol=1e-5)
    # and returns the a-component amplitude unbiased
    kmaps_a = jnp.asarray(a)[:, None, None] * jnp.ones((2, 4, 4)) * 7.0
    out_a = np.asarray(ilc.cilc(kmaps_a, cinv_j, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out_a, 7.0, rtol=1e-5)


def test_harmonic_coadd_weights_unit_response():
    lmax = 50
    nfreq = 3
    cl_model = {}
    rng = np.random.default_rng(2)
    base = 1.0 / (np.arange(lmax + 1) + 10.0)
    for i in range(nfreq):
        for j in range(i, nfreq):
            cl_model[(i, j)] = base * (1.0 + 0.1 * (i == j) * (i + 1))
    beams = [np.ones(lmax + 1) for _ in range(nfreq)]
    w = ilc.calculate_harmonic_coadd_weights(lmax, cl_model, None, beams)
    # weights sum to 1/(resp*beam) = 1 at every ell >= 2
    np.testing.assert_allclose(w[2:].sum(axis=1), 1.0, rtol=1e-8)


def test_alm_roundtrip_and_cl():
    lmax = 30
    key = jax.random.PRNGKey(4)
    cl = 1.0 / (np.arange(lmax + 1) + 5.0) ** 2
    # alm2cl of synalm recovers cl in the mean
    keys = jax.random.split(key, 600)
    cls = np.asarray(jax.vmap(
        lambda k: almod.alm2cl(almod.synalm(k, jnp.asarray(cl), lmax)))(keys))
    mean = cls.mean(axis=0)
    ratio = mean[2:] / cl[2:]
    assert np.abs(ratio - 1).mean() < 0.05, ratio
    # almxfl multiplies per ell
    alm = almod.synalm(key, jnp.asarray(cl), lmax)
    fl = np.arange(lmax + 1, dtype=np.float64)
    out = almod.almxfl(alm, jnp.asarray(fl))
    cl_out = np.asarray(almod.alm2cl(out))
    cl_in = np.asarray(almod.alm2cl(alm))
    np.testing.assert_allclose(cl_out[2:], cl_in[2:] * fl[2:] ** 2, rtol=1e-5)
    # change_alm_lmax truncation preserves low-l content
    small = almod.change_alm_lmax(np.asarray(alm), 10)
    cl_small = np.asarray(almod.alm2cl(jnp.asarray(small)))
    np.testing.assert_allclose(cl_small[2:10], cl_in[2:10], rtol=1e-5)


def test_crossband_errors_knox_scaling():
    L = 2000
    ells = np.arange(L)
    cltt = 1e-5 / (ells + 10.0) ** 2
    beam = np.asarray(F.gauss_beam(ells, 1.4))
    edges = np.arange(100, 1900, 200)
    cents, sig1 = sp.crossband_errors(cltt, edges, 10.0, 10.0, beam, beam,
                                      f_sky_eff=0.1)
    cents, sig2 = sp.crossband_errors(cltt, edges, 10.0, 10.0, beam, beam,
                                      f_sky_eff=0.4)
    np.testing.assert_allclose(sig1 / sig2, 2.0, rtol=1e-6)  # 1/sqrt(fsky)
    assert np.all(np.isfinite(sig1)) and np.all(sig1 > 0)


def test_profiling_trace_annotate_show(tmp_path, capsys):
    """jax.profiler trace wrapper captures events; named scopes compile
    under jit; show prints a wall time (SURVEY §5.1 tracing layer)."""
    import jax
    from orphics_tpu.utils import profiling as prof

    @jax.jit
    def step(x):
        with prof.annotate("double"):
            y = x * 2.0
        return y.sum()

    logdir = str(tmp_path / "trace")
    with prof.trace(logdir):
        out = step(jnp.arange(8, dtype=jnp.float32))
        prof.sync(out)
    assert float(out) == 56.0
    # trace files were written (plugins/profile/<run>/...)
    import os
    found = []
    for root, _dirs, files in os.walk(logdir):
        found += files
    assert found, "profiler trace produced no files"

    with prof.show("twostep"):
        out = prof.sync(step(jnp.ones(4, jnp.float32)))
    printed = capsys.readouterr().out
    assert "twostep:" in printed
