"""Galaxy catalogs -> maps: pixelization, overdensities, mock catalogs.

Re-design of reference ``orphics/catalogs.py``: histogram map-making on
flat-sky geometries (scatter-add on device) and HEALPix (native C++
``ang2pix`` + bincount), overdensity maps, correlated Poisson mocks
(``Pow2Cat``, flat-sky), random catalogs, sample splitting and duplicate
merging. FITS loaders are gated on optional deps as in the reference.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import Geometry, arcmin, degree
from ..utils import healpix as hp

__all__ = ["binned_map", "CatMapper", "get_delta", "get_delta_healpix",
           "random_catalog_flat", "get_random_catalog", "Pow2Cat",
           "split_samples", "optimize_splits", "select_based_on_mask",
           "merge_duplicates", "df_from_fits", "load_fits",
           "healpix_binned_map"]


def binned_map(decs_rad, ras_rad, geom: Geometry, weights=None):
    """Histogram sources into a flat-sky map (reference
    ``catalogs.py:16``): device scatter-add over pixel indices."""
    pix = geom.sky2pix(jnp.stack([jnp.asarray(decs_rad), jnp.asarray(ras_rad)]))
    iy = jnp.round(pix[0]).astype(jnp.int32)
    ix = jnp.round(pix[1]).astype(jnp.int32)
    good = ((iy >= 0) & (iy < geom.ny) & (ix >= 0) & (ix < geom.nx))
    w = jnp.ones(iy.shape) if weights is None else jnp.asarray(weights)
    w = jnp.where(good, w, 0.0)
    idx = jnp.clip(iy, 0, geom.ny - 1) * geom.nx + jnp.clip(ix, 0, geom.nx - 1)
    cmap = jnp.zeros(geom.npix).at[idx].add(w)
    return cmap.reshape(geom.shape)


def healpix_binned_map(decs_rad, ras_rad, nside: int, weights=None):
    """Histogram sources into a HEALPix RING map via the native ang2pix."""
    theta = np.pi / 2.0 - np.asarray(decs_rad)
    phi = np.mod(np.asarray(ras_rad), 2 * np.pi)
    pix = hp.ang2pix(nside, theta, phi)
    npix = hp.nside2npix(nside)
    return np.bincount(pix, weights=weights, minlength=npix).astype(np.float64)


class CatMapper:
    """Catalog -> (counts, overdensity) maps (reference
    ``catalogs.py:482``): flat geometry or HEALPix nside."""

    def __init__(self, ras_deg, decs_deg, geom: Geometry = None,
                 nside: int = None, weights=None):
        self.geom = geom
        self.nside = nside
        self.ras = np.asarray(ras_deg) * degree
        self.decs = np.asarray(decs_deg) * degree
        self.weights = weights
        if geom is not None:
            self.counts = binned_map(self.decs, self.ras, geom, weights)
        else:
            self.counts = healpix_binned_map(self.decs, self.ras, nside,
                                             weights)

    def get_map(self):
        return self.counts

    def get_delta(self, mask=None):
        """Overdensity delta = n/<n> - 1 over the (optionally masked)
        footprint (reference ``catalogs.py:578``)."""
        c = jnp.asarray(self.counts)
        if mask is None:
            mask = jnp.ones_like(c)
        mask = jnp.asarray(mask)
        nmean = jnp.sum(c * mask) / jnp.sum(mask)
        return jnp.where(mask > 0, c / nmean - 1.0, 0.0), nmean


def get_delta(counts, mask=None):
    """Functional overdensity (reference ``catalogs.py:618``)."""
    c = jnp.asarray(counts)
    mask = jnp.ones_like(c) if mask is None else jnp.asarray(mask)
    nmean = jnp.sum(c * mask) / jnp.sum(mask)
    return jnp.where(mask > 0, c / nmean - 1.0, 0.0), nmean


get_delta_healpix = get_delta


def random_catalog_flat(key, geom: Geometry, nsources: int):
    """Uniform random (dec, ra) positions on a flat patch (reference
    ``catalogs.py:468``)."""
    ky, kx = jax.random.split(key)
    h, w = geom.extent
    decs = (jax.random.uniform(ky, (nsources,)) - 0.5) * h + geom.y0
    ras = (jax.random.uniform(kx, (nsources,)) - 0.5) * w
    return decs, ras


def get_random_catalog(key, nsources: int):
    """Uniform random positions on the sphere, degrees (reference
    ``catalogs.py:323``)."""
    kz, kp = jax.random.split(key)
    z = jax.random.uniform(kz, (nsources,), minval=-1.0, maxval=1.0)
    decs = jnp.degrees(jnp.arcsin(z))
    ras = jnp.degrees(jax.random.uniform(kp, (nsources,),
                                         minval=0.0, maxval=2 * np.pi))
    return ras, decs


class Pow2Cat:
    """Correlated (galaxy, kappa) mock: draw correlated GRFs from
    (clgg, clkg, clkk), Poisson-sample galaxies from the overdensity
    (flat-sky re-design of reference ``catalogs.py:352``)."""

    def __init__(self, geom: Geometry, ells, clgg, clkg, clkk,
                 ngal_per_arcmin2: float, dtype=jnp.float64):
        from .grf import MapGen
        self.geom = geom
        ps = np.zeros((2, 2, len(np.asarray(ells))))
        ps[0, 0] = np.asarray(clgg)
        ps[1, 1] = np.asarray(clkk)
        ps[0, 1] = ps[1, 0] = np.asarray(clkg)
        self.mgen = MapGen(geom, ps, dtype=dtype)
        self.nbar = ngal_per_arcmin2 * geom.pixsize / (arcmin ** 2)

    def get_maps(self, key):
        """(delta_g, kappa) correlated realizations."""
        maps = self.mgen.get_map(key)
        return maps[0], maps[1]

    def get_cat(self, key, max_count: int = 20):
        """(counts map, kappa map): counts ~ Poisson(nbar (1+delta_g))
        (reference ``catalogs.py:396``)."""
        kg, kp = jax.random.split(key)
        delta, kappa = self.get_maps(kg)
        lam = jnp.maximum(self.nbar * (1.0 + delta), 0.0)
        counts = jax.random.poisson(kp, lam)
        return counts, kappa


def split_samples(values, split_points):
    """Partition sample indices by thresholds (reference
    ``catalogs.py:769``)."""
    values = np.asarray(values)
    edges = [-np.inf] + list(split_points) + [np.inf]
    out = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        out.append(np.where((values >= lo) & (values < hi))[0])
    return out


def optimize_splits(values, nsplits: int):
    """Split points giving equal-count subsamples (reference
    ``catalogs.py:810``)."""
    qs = np.linspace(0, 100, nsplits + 1)[1:-1]
    return np.percentile(np.asarray(values), qs)


def select_based_on_mask(ras_deg, decs_deg, mask, geom: Geometry = None,
                         nside: int = None, threshold: float = 0.5):
    """Keep sources whose pixel passes the mask (reference
    ``catalogs.py:837``)."""
    ras = np.asarray(ras_deg) * degree
    decs = np.asarray(decs_deg) * degree
    mask = np.asarray(mask)
    if geom is not None:
        pix = np.asarray(geom.sky2pix(np.stack([decs, ras])))
        iy = np.round(pix[0]).astype(int)
        ix = np.round(pix[1]).astype(int)
        good = ((iy >= 0) & (iy < geom.ny) & (ix >= 0) & (ix < geom.nx))
        vals = np.zeros(len(ras))
        vals[good] = mask[iy[good], ix[good]]
    else:
        pix = hp.ang2pix(nside, np.pi / 2 - decs, np.mod(ras, 2 * np.pi))
        vals = mask[pix]
    return vals > threshold


def merge_duplicates(ras_deg, decs_deg, radius_arcmin: float = 1.0):
    """Merge sources within an angular radius to their mean position
    (KD-tree, reference ``catalogs.py:984``)."""
    from scipy.spatial import cKDTree
    ras = np.asarray(ras_deg, dtype=np.float64)
    decs = np.asarray(decs_deg, dtype=np.float64)
    # unit vectors for chordal metric
    th = np.radians(90 - decs)
    ph = np.radians(ras)
    xyz = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                    np.cos(th)], axis=1)
    chord = 2 * np.sin(0.5 * radius_arcmin * arcmin)
    tree = cKDTree(xyz)
    pairs = tree.query_pairs(chord)
    parent = np.arange(len(ras))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in pairs:
        pi, pj = find(i), find(j)
        if pi != pj:
            parent[pj] = pi
    roots = np.array([find(i) for i in range(len(ras))])
    out_ra, out_dec = [], []
    for r in np.unique(roots):
        sel = roots == r
        out_ra.append(ras[sel].mean())
        out_dec.append(decs[sel].mean())
    return np.asarray(out_ra), np.asarray(out_dec)


def df_from_fits(fname, columns=None):
    """FITS table -> pandas DataFrame (reference ``catalogs.py:975``);
    requires astropy or fitsio (gated like the reference's optional deps)."""
    try:
        from astropy.io import fits as afits
        with afits.open(fname) as hdul:
            data = hdul[1].data
            cols = columns or data.names
            import pandas as pd
            return pd.DataFrame({c: np.asarray(data[c]) for c in cols})
    except ImportError:
        pass
    try:
        import fitsio
        import pandas as pd
        data = fitsio.read(fname, columns=columns)
        return pd.DataFrame({c: data[c] for c in data.dtype.names})
    except ImportError as e:
        raise ImportError("reading FITS requires astropy or fitsio") from e


load_fits = df_from_fits
