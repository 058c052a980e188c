"""Reference-in-the-loop parity for the pixell-dependent modules.

``orphics.maps`` / ``orphics.lensing`` / ``orphics.pixcov`` import pixell
at module scope, so they run here on the numpy shim in
``tests/_ref_shims`` (see its docstring for the conventions it
implements). These tests drive the *reference* map pipelines —
``FourierCalc.power2d``, ``MapGen`` covsqrt, ``binned_power``,
``mask_kspace``, ``stamp_pixcov_from_theory`` — side-by-side with the
native orphics_tpu implementations on identical inputs and assert
numerical agreement (north star: 1e-4 relative).
"""
import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "_ref_shims")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "orphics")),
    reason="upstream reference not mounted")

for p in (SHIM, REF_ROOT):
    if p not in sys.path:
        sys.path.insert(0, p)

rmaps = pytest.importorskip("orphics.maps")
rpixcov = pytest.importorskip("orphics.pixcov")
rstats = pytest.importorskip("orphics.stats")
from pixell import enmap as shim_enmap  # noqa: E402  (the shim)

import jax.numpy as jnp  # noqa: E402

from orphics_tpu import maps as tmaps  # noqa: E402
from orphics_tpu import pixcov as tpixcov  # noqa: E402
from orphics_tpu.geometry import rect_geometry as tgeom_rect  # noqa: E402


WIDTH_DEG = 10.0
RES_ARCMIN = 2.0


@pytest.fixture(scope="module")
def geoms():
    shape, wcs = rmaps.rect_geometry(width_deg=WIDTH_DEG,
                                     px_res_arcmin=RES_ARCMIN)
    geom = tgeom_rect(width_deg=WIDTH_DEG, px_res_arcmin=RES_ARCMIN)
    assert shape == (geom.ny, geom.nx)
    return shape, wcs, geom


def _ps_table(lmax=9000):
    ells = np.arange(lmax, dtype=float)
    cl = 1e1 * (ells + 10.0) ** -2.0
    cl[0] = 0
    return cl


# ---------------------------------------------------------------------
# geometry grids
# ---------------------------------------------------------------------

def test_geometry_grids_match(geoms):
    shape, wcs, geom = geoms
    np.testing.assert_allclose(geom.modlmap_np(),
                               np.asarray(shim_enmap.modlmap(shape, wcs)),
                               rtol=1e-10)
    np.testing.assert_allclose(geom.modrmap_np(),
                               np.asarray(shim_enmap.modrmap(shape, wcs)),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(geom.area,
                               shim_enmap.area(shape, wcs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(geom.pixsizemap(jnp.float64)),
                               np.asarray(shim_enmap.pixsizemap(shape, wcs)),
                               rtol=1e-10)


# ---------------------------------------------------------------------
# FourierCalc.power2d
# ---------------------------------------------------------------------

def test_power2d_scalar_matches_reference(geoms):
    shape, wcs, geom = geoms
    rng = np.random.default_rng(0)
    m = rng.standard_normal(shape)
    rfc = rmaps.FourierCalc((1,) + shape, wcs)
    rp2d, _, _ = rfc.power2d(shim_enmap.enmap(m[None], wcs))
    tfc = tmaps.FourierCalc(geom)
    tp2d, _, _ = tfc.power2d(jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(tp2d), np.asarray(rp2d),
                               rtol=1e-6, atol=1e-12)


def test_power2d_cross_matches_reference(geoms):
    shape, wcs, geom = geoms
    rng = np.random.default_rng(1)
    m1 = rng.standard_normal(shape)
    m2 = m1 * 0.5 + rng.standard_normal(shape)
    rfc = rmaps.FourierCalc((1,) + shape, wcs)
    rp2d, _, _ = rfc.power2d(shim_enmap.enmap(m1[None], wcs),
                             shim_enmap.enmap(m2[None], wcs))
    tfc = tmaps.FourierCalc(geom)
    tp2d, _, _ = tfc.power2d(jnp.asarray(m1), jnp.asarray(m2))
    np.testing.assert_allclose(np.asarray(tp2d), np.asarray(rp2d),
                               rtol=1e-6, atol=1e-12)


def test_power2d_pol_teb_matches_reference(geoms):
    """(3,ny,nx) IQU input: exercises the QU->EB rotation convention end
    to end (reference iqu2teb with queb_rotmat vs ops.fourier.iqu2teb)."""
    shape, wcs, geom = geoms
    rng = np.random.default_rng(2)
    iqu = rng.standard_normal((3,) + shape)
    rfc = rmaps.FourierCalc((3,) + shape, wcs)
    rp, _, _ = rfc.power2d(shim_enmap.enmap(iqu, wcs))
    tfc = tmaps.FourierCalc(geom)
    tp, _, _ = tfc.power2d(jnp.asarray(iqu))
    np.testing.assert_allclose(np.asarray(tp), np.asarray(rp),
                               rtol=1e-5, atol=1e-10)


# ---------------------------------------------------------------------
# MapGen covsqrt + sims
# ---------------------------------------------------------------------

def test_mapgen_covsqrt_matches_reference(geoms):
    shape, wcs, geom = geoms
    cl = _ps_table()
    ps = cl[None, None]
    rmg = rmaps.MapGen((1,) + shape, wcs, cov=ps)
    tmg = tmaps.MapGen(geom, ps, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(tmg.covsqrt),
                               np.asarray(rmg.covsqrt),
                               rtol=1e-6, atol=1e-12)


def test_mapgen_sim_power_matches_reference(geoms):
    """Statistical fixture: binned mean power of reference sims (numpy
    RNG on the shim) vs native sims (JAX keys) agree within MC error."""
    import jax
    shape, wcs, geom = geoms
    cl = _ps_table()
    ps = cl[None, None]
    nsims = 16
    edges = np.arange(400, 4000, 300.0)

    rmg = rmaps.MapGen((1,) + shape, wcs, cov=ps)
    rfc = rmaps.FourierCalc((1,) + shape, wcs)
    modlmap = np.asarray(shim_enmap.modlmap(shape, wcs))
    rbin = rstats.bin2D(modlmap, edges)
    np.random.seed(3)
    racc = 0
    for _ in range(nsims):
        p2d, _, _ = rfc.power2d(rmg.get_map())
        racc = racc + np.asarray(p2d)
    _, rp1d = rbin.bin(racc / nsims)

    tmg = tmaps.MapGen(geom, ps)
    tfc = tmaps.FourierCalc(geom)
    tbin = tmaps.Bin2D(geom.modlmap_np(), edges)
    keys = jax.random.split(jax.random.PRNGKey(3), nsims)
    tacc = 0
    for k in keys:
        p2d, _, _ = tfc.power2d(tmg.get_map(k))
        tacc = tacc + np.asarray(p2d)
    _, tp1d = tbin.bin(jnp.asarray(tacc / nsims))

    # both are ~chi^2 estimates of the same C_l; per-bin MC error is
    # ~sqrt(2/(nsims*nmodes)) ~ 2-4%
    np.testing.assert_allclose(np.asarray(tp1d), rp1d, rtol=0.12)
    theory = np.interp((edges[1:] + edges[:-1]) / 2, np.arange(len(cl)), cl)
    np.testing.assert_allclose(np.asarray(tp1d), theory, rtol=0.12)


# ---------------------------------------------------------------------
# binned_power / wfactor / mask_kspace
# ---------------------------------------------------------------------

def test_binned_power_with_mask_matches_reference(geoms):
    shape, wcs, geom = geoms
    rng = np.random.default_rng(4)
    m = rng.standard_normal(shape)
    yy = np.linspace(0, np.pi, shape[0])[:, None]
    xx = np.linspace(0, np.pi, shape[1])[None, :]
    mask = (np.sin(yy) * np.sin(xx)) ** 2
    edges = np.arange(300, 4500, 300.0)
    rcents, rp1d = rmaps.binned_power(shim_enmap.enmap(m, wcs),
                                      bin_edges=edges,
                                      mask=shim_enmap.enmap(mask, wcs))
    tcents, tp1d = tmaps.binned_power(jnp.asarray(m), bin_edges=edges,
                                      mask=jnp.asarray(mask), geom=geom)
    np.testing.assert_allclose(np.asarray(tcents), rcents, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tp1d), rp1d, rtol=1e-5,
                               atol=1e-12)


def test_wfactor_matches_reference(geoms):
    shape, wcs, geom = geoms
    rng = np.random.default_rng(5)
    mask = rng.uniform(0, 1, shape)
    emask = shim_enmap.enmap(mask, wcs)
    for n in (1, 2, 4):
        rw = rmaps.wfactor(n, emask, sht=False)
        tw = float(tmaps.wfactor(
            n, jnp.asarray(mask),
            pixsizemap=jnp.asarray(np.asarray(
                shim_enmap.pixsizemap(shape, wcs)))))
        np.testing.assert_allclose(tw, rw, rtol=1e-6)


def test_mask_kspace_matches_reference(geoms):
    shape, wcs, geom = geoms
    rk = rmaps.mask_kspace(shape, wcs, lxcut=40, lycut=80,
                           lmin=200, lmax=3000)
    tk = tmaps.mask_kspace(geom, lxcut=40, lycut=80, lmin=200, lmax=3000)
    np.testing.assert_array_equal(np.asarray(tk).astype(bool),
                                  np.asarray(rk).astype(bool))


# ---------------------------------------------------------------------
# pixcov: stamp covariance from 2D theory power
# ---------------------------------------------------------------------

def _stamp_inputs(n=8, ncomp=3, res_arcmin=2.0):
    arc = np.pi / 180 / 60
    shape, wcs = shim_enmap.geometry(
        pos=[[-n / 2 * res_arcmin * arc, -n / 2 * res_arcmin * arc],
             [n / 2 * res_arcmin * arc, n / 2 * res_arcmin * arc]],
        res=res_arcmin * arc)
    geom = tgeom_rect(width_arcmin=n * res_arcmin, px_res_arcmin=res_arcmin)
    assert shape == (geom.ny, geom.nx)
    modlmap = np.asarray(shim_enmap.modlmap(shape, wcs))
    lmax = modlmap.max() * 1.1
    cmb2d = np.zeros((ncomp, ncomp) + shape)
    cl_tt = 1e2 / (modlmap + 50.0) ** 1.5
    cmb2d[0, 0] = cl_tt
    if ncomp == 3:
        cmb2d[1, 1] = 0.3 * cl_tt
        cmb2d[2, 2] = 0.05 * cl_tt
        cmb2d[0, 1] = cmb2d[1, 0] = 0.2 * cl_tt
    return shape, wcs, geom, cmb2d


def test_stamp_pixcov_scalar_matches_reference():
    shape, wcs, geom, cmb2d = _stamp_inputs(ncomp=1)
    rcov = rpixcov.stamp_pixcov_from_theory(
        shim_enmap.enmap(cmb2d.copy(), wcs), n2d_IQU=0.0, beam2d=1.0)
    tcov = tpixcov.stamp_pixcov_from_theory(geom, jnp.asarray(cmb2d))
    np.testing.assert_allclose(np.asarray(tcov), np.asarray(rcov),
                               rtol=1e-6, atol=1e-10)


def test_stamp_pixcov_pol_matches_reference():
    """ncomp=3 exercises rotate_pol_power (TEB->TQU) + the block
    covariance assembly (reference pixcov.py:67-100)."""
    shape, wcs, geom, cmb2d = _stamp_inputs(ncomp=3)
    rcov = rpixcov.stamp_pixcov_from_theory(
        shim_enmap.enmap(cmb2d.copy(), wcs), n2d_IQU=0.0, beam2d=1.0)
    tcov = tpixcov.stamp_pixcov_from_theory(geom, jnp.asarray(cmb2d))
    # atol covers the ~0 TB/EB blocks (cov scale is ~1e4, so 1e-4
    # absolute is 1e-8 relative to scale)
    np.testing.assert_allclose(np.asarray(tcov), np.asarray(rcov),
                               rtol=1e-5, atol=1e-4)


def test_mapgen_pol_covsqrt_matches_reference(geoms):
    """(3,3,L) TEB cov: exercises the matrix-sqrt (eigen) path of
    spec2flat on both sides."""
    shape, wcs, geom = geoms
    cl = _ps_table()
    ps = np.zeros((3, 3, cl.size))
    ps[0, 0] = cl
    ps[1, 1] = 0.3 * cl
    ps[2, 2] = 0.05 * cl
    ps[0, 1] = ps[1, 0] = 0.25 * cl
    rmg = rmaps.MapGen((3,) + shape, wcs, cov=ps.copy())
    tmg = tmaps.MapGen(geom, ps, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(tmg.covsqrt),
                               np.asarray(rmg.covsqrt),
                               rtol=1e-5, atol=1e-8)


def test_f1power_matches_reference(geoms):
    """Half-FFTed power: map1 real, kmap2 already transformed."""
    shape, wcs, geom = geoms
    rng = np.random.default_rng(10)
    m1 = rng.standard_normal(shape)
    m2 = rng.standard_normal(shape)
    rfc = rmaps.FourierCalc((1,) + shape, wcs)
    _, _, rk2 = rfc.power2d(shim_enmap.enmap(m2[None], wcs))
    rp, rk1 = rfc.f1power(shim_enmap.enmap(m1[None], wcs), rk2)
    tfc = tmaps.FourierCalc(geom)
    _, _, tk2 = tfc.power2d(jnp.asarray(m2))
    tp, tk1 = tfc.f1power(jnp.asarray(m1), tk2)
    np.testing.assert_allclose(np.asarray(tp),
                               np.squeeze(np.asarray(rp)),
                               rtol=1e-6, atol=1e-10)


# ---------------------------------------------------------------------
# ILC: standard and constrained combinations + their noise
# ---------------------------------------------------------------------

def _ilc_inputs(seed=20, nfreq=4, n=24):
    rng = np.random.default_rng(seed)
    kmaps = (rng.standard_normal((nfreq, n, n))
             + 1j * rng.standard_normal((nfreq, n, n)))
    A = rng.standard_normal((nfreq, nfreq)) * 0.3
    cov0 = A @ A.T + np.eye(nfreq)
    scale = 1.0 + rng.uniform(0.1, 1.0, (n, n))
    cov = cov0[:, :, None, None] * scale[None, None]
    cinv = np.moveaxis(np.linalg.inv(np.moveaxis(cov, (0, 1), (-2, -1))),
                       (-2, -1), (0, 1))
    ra = np.ones(nfreq)
    rb = rng.uniform(0.5, 3.0, nfreq)
    return kmaps, cinv, ra, rb


def test_silc_and_noise_match_reference():
    from orphics_tpu.models import ilc as tilc
    kmaps, cinv, ra, rb = _ilc_inputs()
    rout = rmaps.silc(kmaps.copy(), cinv.copy())
    tout = np.asarray(tilc.silc(jnp.asarray(kmaps), jnp.asarray(cinv)))
    np.testing.assert_allclose(tout, rout, rtol=1e-5, atol=1e-8)
    rn = rmaps.silc_noise(cinv.copy())
    tn = np.asarray(tilc.silc_noise(jnp.asarray(cinv)))
    np.testing.assert_allclose(tn, rn, rtol=1e-5, atol=1e-10)


def test_cilc_and_noise_match_reference():
    from orphics_tpu.models import ilc as tilc
    kmaps, cinv, ra, rb = _ilc_inputs(seed=21)
    rout = rmaps.cilc(kmaps.copy(), cinv.copy(), ra, rb)
    tout = np.asarray(tilc.cilc(jnp.asarray(kmaps), jnp.asarray(cinv),
                                jnp.asarray(ra), jnp.asarray(rb)))
    np.testing.assert_allclose(tout, rout, rtol=1e-5, atol=1e-8)
    rn = rmaps.cilc_noise(cinv.copy(), ra, rb)
    tn = np.asarray(tilc.cilc_noise(jnp.asarray(cinv), jnp.asarray(ra),
                                    jnp.asarray(rb)))
    np.testing.assert_allclose(tn, rn, rtol=1e-5, atol=1e-10)


# ---------------------------------------------------------------------
# windows / beams / small utilities
# ---------------------------------------------------------------------

def test_get_taper_matches_reference(geoms):
    shape, wcs, geom = geoms
    from orphics_tpu.ops.windows import get_taper, get_taper_deg
    rt, rw2 = rmaps.get_taper(shape, wcs, taper_percent=12.0,
                              pad_percent=3.0)
    tt, tw2 = get_taper(geom, taper_percent=12.0, pad_percent=3.0)
    np.testing.assert_allclose(np.asarray(tt), np.asarray(rt),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(tw2), float(rw2), rtol=1e-6)
    rt2, rw22 = rmaps.get_taper_deg(shape, wcs, taper_width_degrees=1.0)
    tt2, tw22 = get_taper_deg(geom, taper_width_degrees=1.0)
    np.testing.assert_allclose(np.asarray(tt2), np.asarray(rt2),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(tw22), float(rw22), rtol=1e-6)


def test_gauss_beam_and_sigma_fwhm_match_reference():
    from orphics_tpu.ops import fourier as F
    from orphics_tpu.ops.windows import sigma_from_fwhm, fwhm_from_sigma
    ells = np.arange(2.0, 6000.0, 13.0)
    np.testing.assert_allclose(np.asarray(F.gauss_beam(ells, 1.4)),
                               rmaps.gauss_beam(ells, 1.4), rtol=2e-6)
    np.testing.assert_allclose(sigma_from_fwhm(1.4),
                               rmaps.sigma_from_fwhm(1.4), rtol=1e-12)
    np.testing.assert_allclose(fwhm_from_sigma(0.6),
                               rmaps.fwhm_from_sigma(0.6), rtol=1e-12)


def test_cosine_taper_and_minimum_ell_match_reference(geoms):
    shape, wcs, geom = geoms
    from orphics_tpu.models.mapstools import (cosine_taper,
                                              minimum_ell)
    ls = np.arange(0.0, 3000.0, 7.0)
    np.testing.assert_allclose(np.asarray(cosine_taper(ls, 300, 100)),
                               rmaps.cosine_taper(ls, 300, 100),
                               rtol=1e-6, atol=1e-8)
    assert int(minimum_ell(geom)) == int(rmaps.minimum_ell(shape, wcs))


def test_filter_map_matches_reference(geoms):
    shape, wcs, geom = geoms
    from orphics_tpu.ops import fourier as F
    rng = np.random.default_rng(30)
    m = rng.standard_normal(shape)
    kfilt = (np.asarray(shim_enmap.modlmap(shape, wcs)) < 2000).astype(float)
    rout = rmaps.filter_map(shim_enmap.enmap(m, wcs),
                            shim_enmap.enmap(kfilt, wcs))
    tout = np.asarray(F.kfilter(jnp.asarray(m), jnp.asarray(kfilt), geom))
    np.testing.assert_allclose(tout, np.asarray(rout), rtol=1e-6,
                               atol=1e-8)


def test_interp_matches_reference():
    from orphics_tpu import maps as _tm
    x = np.linspace(0, 100, 50)
    y = np.sin(x / 10.0)
    xq = np.linspace(-10, 110, 77)       # includes out-of-range
    rf = rmaps.interp(x, y)
    tf = _tm.interp(x, y)
    np.testing.assert_allclose(np.asarray(tf(xq)), rf(xq), rtol=1e-6,
                               atol=1e-7)


def test_plotter_schemes_match_reference(tmp_path):
    """The reference io.Plotter is pixell-free: construct both and
    compare the axes labels/scales and the scheme scale functions."""
    import orphics.io as rio_
    from orphics_tpu.utils import plot as uplot
    ells = np.arange(2.0, 500.0)
    for scheme in ("Dell", "Cell", "Pk", "CL", "LCL", "rCell"):
        rp = rio_.Plotter(scheme=scheme)
        tp = uplot.Plotter(scheme=scheme)
        assert tp._ax.get_xscale() == rp._ax.get_xscale(), scheme
        assert tp._ax.get_yscale() == rp._ax.get_yscale(), scheme
        assert tp._ax.get_xlabel() == rp._ax.get_xlabel(), scheme
        assert tp._ax.get_ylabel() == rp._ax.get_ylabel(), scheme
        rs = rp.scalefn(ells) if rp.scalefn else 1
        np.testing.assert_allclose(np.asarray(tp.scalefn(ells)) * ells ** 0,
                                   np.asarray(rs) * ells ** 0,
                                   rtol=1e-12, err_msg=scheme)
        rp._plt.close("all") if hasattr(rp, "_plt") else None
        tp._plt.close(tp._fig)
