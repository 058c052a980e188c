"""Numpy stand-in for ``szar.foregrounds`` — the five component
spectra that the live reference's ``ilc_power`` requests through its
``fdict`` (reference ``orphics/foregrounds.py:505-513``):

    power_tsz(ells, nu1, nu2, fill_type=...)
    power_cibc(ells, nu1, nu2)
    power_cibp(ells, nu1, nu2)
    power_ksz_reion(ells, fill_type=...)
    power_ksz_late(ells, fill_type=...)

The formulas are the standard szar/Dunkley foreground models that the
reference documents in its own ``default_constants`` block
(``foregrounds.py:16-28``, "For szar copies") and template files:

- tSZ: Battaglia D_l template (``data/foregrounds/sz_template_
  battaglia.csv``, D_3000 = A_tsz at 150 GHz) scaled by
  f(nu1) f(nu2) / f(150)^2 with the non-relativistic tSZ frequency
  function f(nu) = mu/tanh(mu/2) - 4 (the reference's own ``ffunc``,
  ``foregrounds.py:603``).
- kSZ: reionization + late-time D_l templates (``early_ksz.txt`` /
  ``late_ksz.txt``).
- CIB Poisson / clustered: D_3000 amplitudes A_cibp / A_cibc at
  150 GHz with a modified-blackbody SED
  mu(nu) = nu^beta B_nu(T_d) dB/dT|cmb^-1 (beta = al_cib, T_d = Td
  from ``default_constants``) and D_l ~ (l/3000)^(2 - n_cib) for the
  clustered term.

This file reads the reference's own template data and implements the
formulas in plain numpy; it does not import ``orphics_tpu``.
"""
import os

import numpy as np
from scipy.interpolate import interp1d

_REF_DATA = "/root/reference/data"

TCMB = 2.726
TCMB_uK = 2.726e6
H_CGS = 6.62608e-27
K_CGS = 1.3806488e-16
hplanck = 6.626068e-34
kboltz = 1.3806503e-23
clight = 299792458.0

# the reference's "For szar copies" constants (foregrounds.py:16-28)
A_tsz = 5.6
nu0 = 150.0
Td = 24.0
al_cib = 1.2
A_cibp = 6.9
A_cibc = 4.9
n_cib = 1.2


def _dl_filler(ells, ls, cls, fill_type="extrapolate", fill_positive=True):
    ells = np.asarray(ells, dtype=float)
    if fill_type == "constant_dl":
        fill_value = (0, cls[-1])
    elif fill_type == "extrapolate":
        fill_value = "extrapolate"
    elif fill_type == "zeros":
        fill_value = 0
    else:
        raise ValueError(fill_type)
    dls = interp1d(ls, cls, bounds_error=False, fill_value=fill_value)(ells)
    if fill_positive:
        dls[dls < 0] = 0
    return dls


def _dl_to_cl(ells, dls):
    ells = np.asarray(ells, dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        return dls * 2.0 * np.pi * np.nan_to_num(1.0 / ells / (ells + 1.0))


def ffunc(nu, tcmb=TCMB):
    nu = np.asarray(nu, dtype=float)
    mu = H_CGS * (1e9 * nu) / (K_CGS * tcmb)
    return mu / np.tanh(mu / 2.0) - 4.0


def power_tsz(ells, nu1, nu2=None, A_tsz_amp=None, fill_type="extrapolate",
              **kwargs):
    if nu2 is None:
        nu2 = nu1
    A = A_tsz if A_tsz_amp is None else A_tsz_amp
    ls, icls = np.loadtxt(
        os.path.join(_REF_DATA, "foregrounds", "sz_template_battaglia.csv"),
        unpack=True, delimiter=",")
    dls = _dl_filler(ells, ls, icls, fill_type=fill_type)
    cl150 = A * _dl_to_cl(ells, dls)
    return cl150 * ffunc(nu1) * ffunc(nu2) / ffunc(nu0) ** 2


def power_ksz_reion(ells, A_rksz=1, fill_type="extrapolate", **kwargs):
    ls, icls = np.loadtxt(
        os.path.join(_REF_DATA, "foregrounds", "early_ksz.txt"), unpack=True)
    dls = _dl_filler(ells, ls, icls, fill_type=fill_type)
    return A_rksz * _dl_to_cl(ells, dls)


def power_ksz_late(ells, A_lksz=1, fill_type="extrapolate", **kwargs):
    ls, icls = np.loadtxt(
        os.path.join(_REF_DATA, "foregrounds", "late_ksz.txt"), unpack=True)
    dls = _dl_filler(ells, ls, icls, fill_type=fill_type)
    return A_lksz * _dl_to_cl(ells, dls)


def _planck_bnu(nu_hz, T):
    x = hplanck * nu_hz / (kboltz * T)
    return (2.0 * hplanck * nu_hz ** 3 / clight ** 2) / np.expm1(x)


def _dbnudt(nu_ghz):
    nu = 1e9 * np.asarray(nu_ghz, dtype=float)
    X = hplanck * nu / (kboltz * TCMB)
    return ((2.0 * hplanck * nu ** 3) / clight ** 2
            * np.exp(X) / (np.exp(X) - 1.0) ** 2 * X / TCMB_uK)


def _cib_mu(nu_ghz):
    nu = np.asarray(nu_ghz, dtype=float)
    return nu ** al_cib * _planck_bnu(nu * 1e9, Td) / _dbnudt(nu)


def power_cibp(ells, nu1, nu2=None):
    if nu2 is None:
        nu2 = nu1
    ells = np.asarray(ells, dtype=float)
    f = _cib_mu(nu1) * _cib_mu(nu2) / _cib_mu(nu0) ** 2
    cl3000 = A_cibp * 2.0 * np.pi / (3000.0 * 3001.0)
    return np.full(ells.shape, cl3000 * f)


def power_cibc(ells, nu1, nu2=None):
    if nu2 is None:
        nu2 = nu1
    ells = np.asarray(ells, dtype=float)
    f = _cib_mu(nu1) * _cib_mu(nu2) / _cib_mu(nu0) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        dl = A_cibc * np.nan_to_num((ells / 3000.0) ** (2.0 - n_cib),
                                    posinf=0.0)
    return _dl_to_cl(ells, dl) * f
