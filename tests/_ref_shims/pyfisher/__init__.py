"""Minimal numpy stand-in for ``pyfisher`` — just the ``TheorySpectra``
container that ``orphics.cosmology.loadTheorySpectraFromCAMB``
(reference ``cosmology.py:888``) instantiates.

Independent implementation (scipy interp1d, linear, zero fill outside
the tabulated range, table clipped at ``lpad``); it does NOT import any
``orphics_tpu`` code, so parity tests that route the live reference
through this shim share only the on-disk CAMB tables with the code
under test.
"""
import numpy as np
from scipy.interpolate import interp1d


class TheorySpectra:
    def __init__(self):
        self.always_unlensed = False
        self.always_lensed = False
        self.dimensionless = True
        self._uCl = {}
        self._lCl = {}
        self._gCl = {}

    @staticmethod
    def _make(ells, cls, lpad, fill_zero=True):
        ells = np.asarray(ells, dtype=float)
        cls = np.asarray(cls, dtype=float)
        sel = ells < lpad
        if fill_zero:
            fill = 0.0
        else:
            fill = cls[sel][-1]
        return interp1d(ells[sel], cls[sel], bounds_error=False,
                        fill_value=fill)

    def loadCls(self, ells, cls, XYType="TT", lensed=False,
                interporder="linear", lpad=9000, fill_zero=True):
        key = XYType.upper()
        f = self._make(ells, cls, lpad, fill_zero)
        if lensed:
            self._lCl[key] = f
        else:
            self._uCl[key] = f

    def loadGenericCls(self, ells, Cls, keyName, lpad=9000, fill_zero=True):
        self._gCl[keyName] = self._make(ells, Cls, lpad, fill_zero)

    def uCl(self, key, ell):
        key = key.upper()
        if self.always_lensed and key in self._lCl:
            return self._lCl[key](ell)
        return self._uCl[key](ell)

    def lCl(self, key, ell):
        key = key.upper()
        if self.always_unlensed and key in self._uCl:
            return self._uCl[key](ell)
        return self._lCl[key](ell)

    def gCl(self, key, ell):
        try:
            return self._gCl[key](ell)
        except KeyError:
            return self._gCl[key[::-1]](ell)
