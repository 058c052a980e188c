"""Reference-in-the-loop parity for ``orphics.catalogs`` (on the numpy
pixell + minimal astropy shims): catalog binning, the BOSS loader
pipeline, sample splitting/optimization, region selection, and dn/dz —
reference and native run on identical inputs."""
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

rcat = pytest.importorskip("orphics.catalogs")
from pixell import enmap as shim_enmap  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from orphics_tpu.geometry import rect_geometry  # noqa: E402
from orphics_tpu.models import catalogs as tcat  # noqa: E402
from orphics_tpu.utils import fitsio  # noqa: E402


@pytest.fixture(scope="module")
def geoms():
    width, res = 10.0, 2.0
    arc = np.pi / 180 / 60
    shape, wcs = shim_enmap.geometry(
        pos=[[-width / 2 * np.pi / 180, -width / 2 * np.pi / 180],
             [width / 2 * np.pi / 180, width / 2 * np.pi / 180]],
        res=res * arc)
    geom = rect_geometry(width_deg=width, px_res_arcmin=res)
    assert shape == (geom.ny, geom.nx)
    return shape, wcs, geom


def test_binned_map_matches_at_pixel_centers(geoms):
    """MIGRATION note: for positions between pixel centers the
    reference's binned_map floor-bins center-convention pixel
    coordinates (np.histogram2d over [i, i+1), catalogs.py:55) — a
    half-pixel shift — while ours assigns to the NEAREST pixel. At
    exact pixel centers both agree."""
    shape, wcs, geom = geoms
    rng = np.random.default_rng(0)
    iy = rng.integers(2, geom.ny - 2, 500)
    ix = rng.integers(2, geom.nx - 2, 500)
    # +0.25-pixel offsets: floor (reference) and round (ours) agree
    # there robustly; exact centers are fp-fragile under floor
    sky = geom.pix2sky(np.stack([iy + 0.25, ix + 0.25]))
    decs = np.asarray(sky[0])
    ras = np.asarray(sky[1])
    w = rng.uniform(0.5, 2.0, 500)
    rmap, _ = rcat.binned_map(np.degrees(ras), np.degrees(decs),
                              shape, wcs, weights=w)
    tmap = np.asarray(tcat.binned_map(decs, ras, geom, weights=w))
    np.testing.assert_allclose(tmap, np.asarray(rmap), atol=1e-6)
    assert tmap.sum() > 0


def test_load_boss_matches_reference(tmp_path):
    """Two synthetic BOSS files written by the INDEPENDENT in-test
    packer (tests/_ref_shims/astropy/io/_minifits.py), loaded by BOTH
    loaders (reference via the astropy shim's own reader; native via
    orphics_tpu.utils.fitsio): the two sides share only the file
    bytes. Identical ras/decs/weights/zs after the z-cut + weight
    algebra."""
    from astropy.io import _minifits
    rng = np.random.default_rng(1)
    files = []
    for i in range(2):
        n = 300
        cols = {
            "RA": rng.uniform(0, 360, n),
            "DEC": rng.uniform(-10, 10, n),
            "Z": rng.uniform(0.1, 0.9, n),
            "WEIGHT_SYSTOT": rng.uniform(0.8, 1.2, n),
            "WEIGHT_NOZ": rng.uniform(0.9, 1.1, n),
            "WEIGHT_CP": rng.uniform(0.9, 1.1, n),
        }
        f = str(tmp_path / f"boss{i}.fits")
        _minifits.write_bintable(f, cols)
        files.append(f)
    rras, rdecs, rw, rzs = rcat.load_boss(files, 0.2, 0.6, True)
    tras, tdecs, tw, tzs = tcat.load_boss(files, 0.2, 0.6, True)
    np.testing.assert_allclose(tras, rras, rtol=1e-12)
    np.testing.assert_allclose(tdecs, rdecs, rtol=1e-12)
    np.testing.assert_allclose(tzs, rzs, rtol=1e-12)
    np.testing.assert_allclose(tw, rw, rtol=1e-10)
    assert len(tras) < 600                       # the z-cut did cut


def test_load_fits_matches_reference(tmp_path):
    from astropy.io import _minifits
    rng = np.random.default_rng(2)
    cols = {"RA": rng.uniform(0, 360, 100), "DEC": rng.uniform(-5, 5, 100)}
    f = str(tmp_path / "cat.fits")
    _minifits.write_bintable(f, cols)   # independent packer
    rout = rcat.load_fits(f, ["RA", "DEC"])
    tout = tcat.load_fits(f, ["RA", "DEC"])
    for k in ("RA", "DEC"):
        np.testing.assert_allclose(rout[k], cols[k], rtol=1e-12)
        np.testing.assert_allclose(tout[k], rout[k], rtol=1e-12)


def test_fits_writers_and_readers_cross_validate(tmp_path):
    """Both directions across implementations: the native writer's file
    parses identically under the independent reader, and the
    independent packer's file parses identically under the native
    reader — so neither side's round-trip is self-certified."""
    from astropy.io import _minifits
    rng = np.random.default_rng(7)
    cols = {"RA": rng.uniform(0, 360, 64),
            "DEC": rng.uniform(-5, 5, 64).astype(np.float32),
            "IDX": np.arange(64, dtype=np.int64),
            "FLAG": rng.integers(0, 5, 64).astype(np.int32)}
    f_native = str(tmp_path / "native.fits")
    f_indep = str(tmp_path / "indep.fits")
    fitsio.write_bintable(f_native, cols)
    _minifits.write_bintable(f_indep, cols)
    a = _minifits.read_bintable(f_native)
    b = fitsio.read_bintable(f_indep)
    for k, v in cols.items():
        np.testing.assert_array_equal(np.asarray(a[k]).ravel(), v, err_msg=k)
        np.testing.assert_array_equal(np.asarray(b[k]).ravel(), v, err_msg=k)


def test_split_samples_and_optimize_matches_reference():
    rng = np.random.default_rng(3)
    samples = rng.uniform(1.0, 100.0, 400)
    splits = [1.0, 20.0, 50.0, 100.0]
    rsn, rmean, rN = rcat.split_samples(samples, splits)
    tsn, tmean, tN = tcat.split_samples(samples, splits)
    np.testing.assert_allclose(tsn, rsn, rtol=1e-10)
    np.testing.assert_allclose(tmean, rmean, rtol=1e-12)
    np.testing.assert_array_equal(tN, rN)
    ropt = rcat.optimize_splits(samples, splits)
    topt = tcat.optimize_splits(samples, splits)
    # both fmin runs converge to the same equal-S/N edges
    np.testing.assert_allclose(topt, ropt, rtol=1e-3)


def test_select_region_matches_reference():
    rng = np.random.default_rng(4)
    ras = rng.uniform(0, 360, 500)               # degrees, unwrapped
    decs = rng.uniform(-30, 30, 500)
    other = [rng.standard_normal(500)]
    rr, rd, rc = rcat.select_region(ras, decs, other, -40.0, 30.0,
                                    -10.0, 10.0)
    tr, td, tc = tcat.select_region(ras, decs, other, -40.0, 30.0,
                                    -10.0, 10.0)
    np.testing.assert_allclose(np.sort(tr), np.sort(rr), rtol=1e-12)
    np.testing.assert_allclose(np.sort(td), np.sort(rd), rtol=1e-12)
    np.testing.assert_allclose(np.sort(tc[0]), np.sort(rc[0]), rtol=1e-12)


def test_dndz_matches_reference():
    z = np.linspace(0.01, 3.0, 200)
    np.testing.assert_allclose(np.asarray(tcat.dndz(z, z0=0.4)),
                               rcat.dndz(z, z0=0.4), rtol=1e-6)


def test_get_random_catalog_statistics_match():
    """Key-seeded vs numpy-seeded RNGs: compare distributions, not
    streams — uniform-on-sphere means sin(dec) uniform in [-1, 1]."""
    np.random.seed(5)
    rpos = rcat.get_random_catalog(50000)
    rsin = np.sin(rpos[0])                       # (2, n): [dec, ra] rad
    tras, tdecs = tcat.get_random_catalog(jax.random.PRNGKey(5), 50000)
    tsin = np.sin(np.radians(np.asarray(tdecs)))
    assert abs(rsin.mean()) < 0.02 and abs(tsin.mean()) < 0.02
    np.testing.assert_allclose(tsin.var(), rsin.var(), rtol=0.03)
    np.testing.assert_allclose(np.var(np.asarray(tras)),
                               np.var(np.degrees(rpos[1])), rtol=0.03)
