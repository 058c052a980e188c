"""Theory power spectra as static, jit-constant device tables.

Replaces the reference's dependency on ``pyfisher.TheorySpectra`` plus the
CAMB-file loaders at ``orphics/cosmology.py:863-946``
(``loadTheorySpectraFromCAMB``) and ``cosmology.py:850`` (``default_theory``).
The Boltzmann solve stays on the host (precomputed CAMB tables shipped in
``orphics_tpu/data``); on device everything is a dense per-ell table that
``jnp.interp`` evaluates on arbitrary (2D) ell grids, so theory lookups fuse
into the surrounding XLA program.

All spectra are stored with the ``l(l+1)/2pi`` (and ``TCMB^2`` if
dimensionless) factors stripped, exactly like the reference.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["TheorySpectra", "load_theory_from_camb", "default_theory",
           "planck_theory", "DATA_DIR"]

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")

_POLS = ("TT", "EE", "BB", "TE")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TheorySpectra:
    """Container of dense per-ell theory spectra tables.

    ``tables[name]`` is a float array indexed by integer ell from 0 to
    ``lpad`` inclusive; evaluation at non-integer / out-of-range ell is
    linear interpolation / zero fill, matching the reference's
    ``interp1d(..., fill_value=0)`` usage. Names: ``lCl_TT`` etc. for
    lensed, ``uCl_TT`` for unlensed, and generic keys like ``kk``.
    """

    tables: Dict[str, jnp.ndarray]
    lpad: int = 9000
    dimensionless: bool = False

    # -- pytree plumbing (tables are leaves; lpad/flags static) ------
    def tree_flatten(self):
        keys = tuple(sorted(self.tables))
        return tuple(self.tables[k] for k in keys), (keys, self.lpad, self.dimensionless)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        keys, lpad, dimensionless = aux
        return cls(dict(zip(keys, leaves)), lpad, dimensionless)

    # -- evaluation ---------------------------------------------------
    def _eval(self, key, ells):
        tab = self.tables[key]
        ells = jnp.asarray(ells)
        grid = jnp.arange(tab.shape[0], dtype=tab.dtype)
        out = jnp.interp(ells.astype(tab.dtype), grid, tab, left=0.0, right=0.0)
        return out

    def lCl(self, spec: str, ells):
        """Lensed CMB Cl (reference API: ``theory.lCl('TT', ells)``)."""
        return self._eval("lCl_" + spec.upper(), ells)

    def uCl(self, spec: str, ells):
        """Unlensed CMB Cl."""
        return self._eval("uCl_" + spec.upper(), ells)

    def gCl(self, spec: str, ells):
        """Generic Cl (e.g. 'kk' for CMB lensing convergence). Cross
        spectra are symmetric: 'gk' falls back to 'kg'; standard CMB
        pol pairs ('TT', ...) fall back to the lensed tables (pyfisher
        behavior the reference's get_grf_cmb relies on)."""
        if spec not in self.tables:
            if spec[::-1] in self.tables:
                spec = spec[::-1]
            elif ("lCl_" + spec.upper()) in self.tables:
                spec = "lCl_" + spec.upper()
        return self._eval(spec, ells)

    # -- mutation (host-side setup) ------------------------------------
    def loadCls(self, ells, cls, pol, lensed=True, lpad=None, fill_zero=True):
        """Ingest a 1D spectrum onto the dense integer-ell table."""
        lpad = lpad or self.lpad
        key = ("lCl_" if lensed else "uCl_") + pol.upper()
        self.tables[key] = _to_table(ells, cls, lpad, fill_zero)

    def loadGenericCls(self, ells, cls, key, lpad=None, fill_zero=True):
        lpad = lpad or self.lpad
        self.tables[key] = _to_table(ells, cls, lpad, fill_zero)

    def astype(self, dtype):
        return TheorySpectra({k: v.astype(dtype) for k, v in self.tables.items()},
                             self.lpad, self.dimensionless)


def _to_table(ells, cls, lpad, fill_zero=True):
    ells = np.asarray(ells, dtype=np.float64)
    cls = np.asarray(cls, dtype=np.float64)
    grid = np.arange(lpad + 1, dtype=np.float64)
    if fill_zero:
        tab = np.interp(grid, ells, cls, left=0.0, right=0.0)
        tab[grid < ells.min()] = 0.0
        tab[grid > ells.max()] = 0.0
    else:
        tab = np.interp(grid, ells, cls)
    return jnp.asarray(tab, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)


def load_theory_from_camb(camb_root: str, TCMB: float = 2.7255e6, lpad: int = 9000,
                          get_dimensionless: bool = True,
                          unlensed_equals_lensed: bool = False) -> TheorySpectra:
    """Load CAMB ``*_lensedCls.dat`` / ``*_scalCls.dat`` /
    ``*_lenspotentialCls.dat`` outputs.

    File conventions follow CAMB (and the reference loader at
    ``orphics/cosmology.py:863``): lensed/scal files carry
    ``l(l+1)Cl/2pi`` in uK^2; lenspotential column 5 is
    ``[l(l+1)]^2 C_phi / 2pi``, giving ``C_kk = 2pi * d_phi / 4``.
    """
    if not get_dimensionless:
        TCMB = 1.0
    th = TheorySpectra({}, lpad=lpad, dimensionless=get_dimensionless)

    lfile = camb_root + "_lensedCls.dat"
    ell, ltt, lee, lbb, lte = np.loadtxt(lfile, unpack=True, usecols=[0, 1, 2, 3, 4])
    mult = 2.0 * np.pi / ell / (ell + 1.0) / TCMB ** 2
    for pol, c in (("TT", ltt), ("EE", lee), ("BB", lbb), ("TE", lte)):
        th.loadCls(ell, c * mult, pol, lensed=True, lpad=lpad)

    try:
        elldd, cldd = np.loadtxt(camb_root + "_lenspotentialCls.dat",
                                 unpack=True, usecols=[0, 5])
        clkk = 2.0 * np.pi * cldd / 4.0
    except OSError:
        elldd, cldd = np.loadtxt(camb_root + "_scalCls.dat", unpack=True, usecols=[0, 4])
        clkk = cldd * (elldd + 1.0) ** 2 / elldd ** 2 / 4.0 / TCMB ** 2
    th.loadGenericCls(elldd, clkk, "kk", lpad=lpad)

    if unlensed_equals_lensed:
        for pol, c in (("TT", ltt), ("EE", lee), ("BB", lbb), ("TE", lte)):
            th.loadCls(ell, c * mult, pol, lensed=False, lpad=lpad)
    else:
        uell, utt, uee, ute = np.loadtxt(camb_root + "_scalCls.dat",
                                         unpack=True, usecols=[0, 1, 2, 3])
        umult = 2.0 * np.pi / uell / (uell + 1.0) / TCMB ** 2
        th.loadCls(uell, utt * umult, "TT", lensed=False, lpad=lpad)
        th.loadCls(uell, uee * umult, "EE", lensed=False, lpad=lpad)
        th.loadCls(uell, ute * umult, "TE", lensed=False, lpad=lpad)
        th.loadCls(uell, uee * 0.0, "BB", lensed=False, lpad=lpad)
    return th


def default_theory(lpad: int = 9000, root: str = "cosmo2017_10K_acc3") -> TheorySpectra:
    """High-accuracy 2017 LCDM theory (reference ``cosmology.py:850``)."""
    return load_theory_from_camb(os.path.join(DATA_DIR, root), lpad=lpad,
                                 get_dimensionless=False)


def planck_theory(ells, ellmax: int = 2000):
    """Planck 2018 TT bandpowers as Cl (reference ``cosmology.py:854``)."""
    fname = os.path.join(DATA_DIR, "COM_PowerSpect_CMB-TT-full_R3.01.txt")
    ls, dells = np.loadtxt(fname, usecols=[0, 1], unpack=True)
    cells = dells / ls / (ls + 1.0) * 2 * np.pi
    sel = ls < ellmax
    return np.interp(np.asarray(ells), ls[sel], cells[sel], left=0.0, right=0.0)
