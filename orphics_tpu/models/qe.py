"""Flat-sky quadratic lensing estimators, normalization, and N_L^0.

The reference delegates its QE to the external ``symlens`` package
(README.md:20); its tutorials use ``qest.kappa_from_map("TT"|"EB", ...)``
and ``NlGenerator.updateNoise/getNls`` (tt_verification.ipynb cell 4,
Lensing-noise-curves.ipynb cell 4; ``lensing.py:973-976``). This module
re-derives those capabilities natively from the Hu & Okamoto (2002)
flat-sky forms, organized TPU-first: every estimator is a handful of
elementwise products and 2D FFTs (mode-coupling integrals evaluated as
FFT convolutions), so the whole reconstruction jit-compiles into one
fused XLA program.

Conventions
-----------
Internally spectra and fields live in "physical" Fourier units where
``<|T(l)|^2> = C_l``:  ``T_phys = fft_raw * sqrt(area)/npix``. The
mode-coupling integral is

  integral d^2 l1/(2pi)^2 A(l1) B(L-l1)
      = (npix/area) * fft_raw[ ifft_raw(A) * ifft_raw(B) ](L).

Estimators (f couplings, Hu & Okamoto 2002 Table 1):
  TT: f = C^TT(l1) (L.l1) + C^TT(l2) (L.l2)
  TE: f = C^TE(l1) cos(2 dphi) (L.l1) + C^TE(l2) (L.l2)
  TB: f = C^TE(l1) sin(2 dphi) (L.l1)
  EE: f = [C^EE(l1) (L.l1) + C^EE(l2) (L.l2)] cos(2 dphi)
  EB: f = [C^EE(l1) (L.l1) - C^BB(l2) (L.l2)] sin(2 dphi)
with dphi = phi_l1 - phi_l2, separated via
  cos 2phi = (lx^2 - ly^2)/l^2,  sin 2phi = 2 lx ly / l^2.

Weights F = f / (2 C1tot C2tot) for same-field (TT, EE) and
F = f / (C1tot C2tot) for cross-field (TE, TB, EB) — the standard
"Hu-DeDeo-Vale"-simplified filters (also symlens' default family).

Normalization: phi_hat = A_L * integral F T T with
A_L = [ integral f F ]^(-1); then N^0,phiphi = A_L and
kappa = (L^2/2) phi, N^0,kappakappa = (L^4/4) A_L.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import Geometry, arcmin
from ..ops import fourier as F
from ..ops.binning import Bin2D

__all__ = ["QE", "NlGenerator", "lensing_noise_2d"]

ESTIMATORS = ("TT", "TE", "EE", "EB", "TB")


def _ifft(a):
    return jnp.fft.ifft2(a, axes=(-2, -1))


def _fft(a):
    return jnp.fft.fft2(a, axes=(-2, -1))


class QE:
    """Quadratic estimator engine for one (geometry, theory, noise) config.

    Parameters
    ----------
    geom : Geometry
    theory : TheorySpectra (lensed spectra are used in the couplings)
    ctot2d : dict mapping 'TT'/'EE'/'BB' to total (signal+noise) 2D spectra
        of the *beam-deconvolved* input maps. Build from noise levels with
        :func:`lensing_noise_2d`.
    xmask, ymask : 2D Fourier masks applied to the input legs (CMB
        multipole cuts); kmask : mask on the output L plane.
    """

    def __init__(self, geom: Geometry, theory, ctot2d: Dict[str, jnp.ndarray],
                 xmask=None, ymask=None, kmask=None, dtype=jnp.float32,
                 grad_cut: Optional[float] = None):
        self.geom = geom
        self.dtype = dtype
        modlmap = geom.modlmap(jnp.float64)
        ells = np.arange(theory.lpad + 1)
        self.cl2d = {}
        for spec in ("TT", "EE", "BB", "TE"):
            cl = np.asarray(theory.lCl(spec, ells), dtype=np.float64)
            self.cl2d[spec] = jnp.asarray(
                np.interp(np.asarray(modlmap), ells, cl, left=0, right=0),
                dtype=dtype)
        one = jnp.ones(geom.shape, dtype)
        self.xmask = one if xmask is None else jnp.asarray(xmask, dtype)
        self.ymask = self.xmask if ymask is None else jnp.asarray(ymask, dtype)
        self.kmask = one if kmask is None else jnp.asarray(kmask, dtype)
        if grad_cut is not None:
            self.gmask = self.xmask * (geom.modlmap(dtype) <= grad_cut)
        else:
            self.gmask = self.xmask
        self.ctot = {k: jnp.asarray(v, dtype) for k, v in ctot2d.items()}
        lmap = geom.lmap(dtype)
        self.ly, self.lx = lmap[0], lmap[1]
        ml = geom.modlmap(dtype)
        self.modlmap = ml
        safe = jnp.where(ml > 0, ml, 1.0)
        self.cos2phi = jnp.where(ml > 0, (self.lx ** 2 - self.ly ** 2) / safe ** 2, 0.0)
        self.sin2phi = jnp.where(ml > 0, 2.0 * self.lx * self.ly / safe ** 2, 0.0)
        self._phys = float(geom.area) ** 0.5 / geom.npix
        self._conv_fac = geom.npix / float(geom.area)
        self._al_cache = {}

    # -- mode-coupling integral ---------------------------------------
    def _conv(self, A, B):
        """integral d^2l1/(2pi)^2 A(l1) B(L - l1) on the grid."""
        return _fft(_ifft(A) * _ifft(B)) * self._conv_fac

    # -- normalization -------------------------------------------------
    def A_L(self, est: str):
        """2D phi normalization A_L = [ integral f F ]^(-1) (cached).

        Computed under ``ensure_compile_time_eval`` so the cached grid is
        always concrete (it is a pure function of the static config) even
        when first requested inside a user's jit trace.
        """
        est = est.upper()
        if est not in self._al_cache:
            with jax.ensure_compile_time_eval():
                inv = self._fF_integral(est)
                # Zero/negative values occur only outside kmask support.
                al = jnp.where(jnp.abs(inv) > 1e-30, 1.0 / inv, 0.0).real
                self._al_cache[est] = al.astype(self.dtype)
        return self._al_cache[est]

    def N_L_kk(self, est: str):
        """2D N_L^0 for kappa: (L^4/4) A_L."""
        L = self.modlmap
        return (L ** 4 / 4.0) * self.A_L(est) * _safe_mask(self.kmask)

    def _fF_integral(self, est):
        """integral d^2 l1/(2pi)^2 f(l1,l2) F(l1,l2) as FFT convolutions.

        Each estimator's f^2/(norm C1tot C2tot) is expanded into separable
        products A(l1) B(l2); (L.l1) factors become L_i L_j times moment
        fields l_i l_j A.
        """
        ly, lx = self.ly, self.lx
        Li = (ly, lx)

        def dot_conv(A_moments, B):
            """sum_ij L_i L_j conv(l_i l_j A, B) given A (2D field)."""
            out = 0.0
            for i in range(2):
                for j in range(2):
                    out = out + Li[i] * Li[j] * self._conv(
                        Li[i] * Li[j] * A_moments, B)
            return out

        def cross_conv(A, B):
            """sum_ij L_i L_j conv(l_i A, l_j B)."""
            out = 0.0
            for i in range(2):
                for j in range(2):
                    out = out + Li[i] * Li[j] * self._conv(Li[i] * A, Li[j] * B)
            return out

        xm, ym = self.gmask, self.ymask
        if est == "TT":
            C = self.cl2d["TT"]
            ct1 = self.ctot["TT"]
            A1 = C ** 2 / ct1 * xm
            B1 = ym / self.ctot["TT"]
            t13 = dot_conv(A1, B1)
            t2 = cross_conv(C / ct1 * xm, C / self.ctot["TT"] * ym)
            return t13 + t2
        if est == "EE":
            # f = [C1(L.l1)+C2(L.l2)] cos2dphi ; F = f/(2 C1tot C2tot)
            # f F = f^2/(2 C1 C2tot); cos^2 = (cc' + ss')^2 expand
            C = self.cl2d["EE"]
            ct = self.ctot["EE"]
            return self._sym_cos2_integral(C, ct, xm, ym)
        if est == "EB":
            # f = [C^EE1 (L.l1) - C^BB2 (L.l2)] sin2dphi; F = f/(C1tot C2tot)
            CE, CB = self.cl2d["EE"], self.cl2d["BB"]
            ctE, ctB = self.ctot["EE"], self.ctot["BB"]
            return self._asym_sin2_integral(CE, CB, ctE, ctB, xm, ym)
        if est == "TB":
            # f = C^TE1 sin2dphi (L.l1); F = f/(C^TTtot1 C^BBtot2)
            CTE = self.cl2d["TE"]
            ctT, ctB = self.ctot["TT"], self.ctot["BB"]
            A = CTE ** 2 / ctT * xm
            B = ym / ctB
            return self._sin2_pair_integral(A, B)
        if est == "TE":
            # simplified filters: F = f / (C^TTtot1 C^EEtot2)
            CTE = self.cl2d["TE"]
            ctT, ctE = self.ctot["TT"], self.ctot["EE"]
            # f^2 = C1^2 cos^2 (L.l1)^2 + 2 C1 C2 cos (L.l1)(L.l2)
            #       + C2^2 (L.l2)^2
            ly, lx = self.ly, self.lx
            c, s = self.cos2phi, self.sin2phi
            out = 0.0
            # term1: (L.l1)^2 C1^2 cos^2(2dphi) / (ctT1) * 1/ctE2
            A = CTE ** 2 / ctT * xm
            B = ym / ctE
            out = out + self._cos2sq_dot_integral(A, B)
            # term2: 2 (L.l1)(L.l2) C1 C2 cos / (ctT1 ctE2) -> cross with cos
            A1 = CTE / ctT * xm
            B1 = CTE / ctE * ym
            out = out + 2.0 * self._cos2_cross_integral(A1, B1)
            # term3: (L.l2)^2 C2^2 / ctE2 * 1/ctT1 (no angle factor)
            A2 = xm / ctT
            B2 = CTE ** 2 / ctE * ym
            out = out + self._dot_conv_swapped(A2, B2)
            return out
        raise ValueError(f"unknown estimator {est}")

    # --- angle-factor integral helpers --------------------------------
    def _pairs_cos2(self):
        """cos 2(phi1-phi2) = cc' + ss' as separable (w1, w2) pairs."""
        return [(self.cos2phi, self.cos2phi), (self.sin2phi, self.sin2phi)]

    def _pairs_sin2(self):
        """sin 2(phi1-phi2) = s c' - c s'."""
        return [(self.sin2phi, self.cos2phi, 1.0),
                (self.cos2phi, self.sin2phi, -1.0)]

    def _dot_conv_swapped(self, A, B):
        """sum L_i L_j conv(A, l_i l_j B) (moment on the second leg)."""
        Li = (self.ly, self.lx)
        out = 0.0
        for i in range(2):
            for j in range(2):
                out = out + Li[i] * Li[j] * self._conv(A, Li[i] * Li[j] * B)
        return out

    def _cos2sq_dot_integral(self, A, B):
        """sum (L.l1)^2 cos^2(2dphi) A(l1) B(l2): cos^2 = sum over pair
        products of (cc'+ss')^2 = cc cc' ... expand into 4 separable
        terms."""
        Li = (self.ly, self.lx)
        ws = self._pairs_cos2()
        out = 0.0
        for (w1a, w2a) in ws:
            for (w1b, w2b) in ws:
                for i in range(2):
                    for j in range(2):
                        out = out + Li[i] * Li[j] * self._conv(
                            Li[i] * Li[j] * w1a * w1b * A, w2a * w2b * B)
        return out

    def _cos2_cross_integral(self, A, B):
        """sum (L.l1)(L.l2) cos(2dphi) A(l1) B(l2)."""
        Li = (self.ly, self.lx)
        out = 0.0
        for (w1, w2) in self._pairs_cos2():
            for i in range(2):
                for j in range(2):
                    out = out + Li[i] * Li[j] * self._conv(
                        Li[i] * w1 * A, Li[j] * w2 * B)
        return out

    def _sym_cos2_integral(self, C, ct, xm, ym):
        """EE: integral f^2/(2 C1tot C2tot) with
        f = [C1(L.l1)+C2(L.l2)] cos2dphi."""
        out = 0.0
        Li = (self.ly, self.lx)
        ws = self._pairs_cos2()
        # (C1 (L.l1))^2 cos^2 term and (C2 (L.l2))^2 term (equal by symmetry)
        A = C ** 2 / ct * xm
        B = ym / ct
        for (w1a, w2a) in ws:
            for (w1b, w2b) in ws:
                for i in range(2):
                    for j in range(2):
                        out = out + 0.5 * Li[i] * Li[j] * self._conv(
                            Li[i] * Li[j] * w1a * w1b * A, w2a * w2b * B)
                        out = out + 0.5 * Li[i] * Li[j] * self._conv(
                            w1a * w1b * xm / ct, Li[i] * Li[j] * w2a * w2b
                            * C ** 2 / ct * ym)
        # cross term 2 C1C2 (L.l1)(L.l2) cos^2/(2 C1 C2) -> 1x
        A1 = C / ct * xm
        B1 = C / ct * ym
        for (w1a, w2a) in ws:
            for (w1b, w2b) in ws:
                for i in range(2):
                    for j in range(2):
                        out = out + Li[i] * Li[j] * self._conv(
                            Li[i] * w1a * w1b * A1, Li[j] * w2a * w2b * B1)
        return out

    def _asym_sin2_integral(self, CE, CB, ctE, ctB, xm, ym):
        """EB: integral [CE1(L.l1) - CB2(L.l2)]^2 sin^2(2dphi)
        / (CE1tot CB2tot)."""
        Li = (self.ly, self.lx)
        pairs = self._pairs_sin2()
        out = 0.0
        # expand sin^2 = sum_{a,b} sa sb with signs
        for (w1a, w2a, sa) in pairs:
            for (w1b, w2b, sb) in pairs:
                sign = sa * sb
                # CE1^2 (L.l1)^2 term
                for i in range(2):
                    for j in range(2):
                        out = out + sign * Li[i] * Li[j] * self._conv(
                            Li[i] * Li[j] * w1a * w1b * CE ** 2 / ctE * xm,
                            w2a * w2b * ym / ctB)
                        # CB2^2 (L.l2)^2 term
                        out = out + sign * Li[i] * Li[j] * self._conv(
                            w1a * w1b * xm / ctE,
                            Li[i] * Li[j] * w2a * w2b * CB ** 2 / ctB * ym)
                        # -2 CE1 CB2 (L.l1)(L.l2) term
                        out = out - 2.0 * sign * Li[i] * Li[j] * self._conv(
                            Li[i] * w1a * w1b * CE / ctE * xm,
                            Li[j] * w2a * w2b * CB / ctB * ym)
        return out

    def _sin2_pair_integral(self, A, B):
        """sum (L.l1)^2 sin^2(2dphi) A(l1) B(l2)."""
        Li = (self.ly, self.lx)
        pairs = self._pairs_sin2()
        out = 0.0
        for (w1a, w2a, sa) in pairs:
            for (w1b, w2b, sb) in pairs:
                sign = sa * sb
                for i in range(2):
                    for j in range(2):
                        out = out + sign * Li[i] * Li[j] * self._conv(
                            Li[i] * Li[j] * w1a * w1b * A, w2a * w2b * B)
        return out

    # -- reconstruction --------------------------------------------------
    def unnormalized_phi(self, est, kx, ky):
        """integral F T T as FFT products; kx, ky are *raw* fft k-maps of
        the beam-deconvolved X and Y legs (per estimator: X in {T,E},
        Y in {T,E,B})."""
        est = est.upper()
        X = kx * self._phys
        Y = ky * self._phys
        Li = (self.ly, self.lx)
        if est == "TT":
            barG = self.cl2d["TT"] * X / self.ctot["TT"] * self.gmask
            barW = Y / self.ctot["TT"] * self.ymask
            out = 0.0
            for i in range(2):
                out = out + Li[i] * self._conv(Li[i] * barG, barW)
            return out
        if est == "EB":
            # Our queb_rotmat angle convention (a = 2 atan2(-lx, ly), the
            # enmap/healpix one) flips sin(2 dphi) relative to the
            # Hu-Okamoto phi_l = atan2(ly, lx) convention; validated by the
            # EB Monte-Carlo cross-ratio test (sign measured end-to-end).
            sgn = -1.0
            CE = self.cl2d["EE"]
            barE = CE * X / self.ctot["EE"] * self.gmask
            barB = Y / self.ctot["BB"] * self.ymask
            out = 0.0
            for (w1, w2, s) in self._pairs_sin2():
                for i in range(2):
                    out = out + sgn * s * Li[i] * self._conv(
                        Li[i] * w1 * barE, w2 * barB)
            # (the CB2 coupling term vanishes for CBB=0 fiducial; include it
            # when BB is nonzero)
            if bool(np.any(np.asarray(self.cl2d["BB"]) != 0)):
                CB = self.cl2d["BB"]
                barE2 = X / self.ctot["EE"] * self.gmask
                barB2 = CB * Y / self.ctot["BB"] * self.ymask
                for (w1, w2, s) in self._pairs_sin2():
                    for i in range(2):
                        out = out - sgn * s * Li[i] * self._conv(
                            w1 * barE2, Li[i] * w2 * barB2)
            return out
        if est == "TB":
            # same sin-convention flip as EB
            CTE = self.cl2d["TE"]
            barT = CTE * X / self.ctot["TT"] * self.gmask
            barB = Y / self.ctot["BB"] * self.ymask
            out = 0.0
            for (w1, w2, s) in self._pairs_sin2():
                for i in range(2):
                    out = out - s * Li[i] * self._conv(Li[i] * w1 * barT, w2 * barB)
            return out
        if est == "EE":
            C = self.cl2d["EE"]
            out = 0.0
            barG = C * X / self.ctot["EE"] * self.gmask
            barW = Y / self.ctot["EE"] * self.ymask
            barG2 = X / self.ctot["EE"] * self.gmask
            barW2 = C * Y / self.ctot["EE"] * self.ymask
            for (w1, w2) in self._pairs_cos2():
                for i in range(2):
                    out = out + 0.5 * Li[i] * self._conv(Li[i] * w1 * barG, w2 * barW)
                    out = out + 0.5 * Li[i] * self._conv(
                        w1 * barG2, Li[i] * w2 * barW2)
            return out
        if est == "TE":
            CTE = self.cl2d["TE"]
            out = 0.0
            barT = CTE * X / self.ctot["TT"] * self.gmask   # l1 leg (T)
            barE = Y / self.ctot["EE"] * self.ymask
            for (w1, w2) in self._pairs_cos2():
                for i in range(2):
                    out = out + Li[i] * self._conv(Li[i] * w1 * barT, w2 * barE)
            barT2 = X / self.ctot["TT"] * self.gmask
            barE2 = CTE * Y / self.ctot["EE"] * self.ymask
            for i in range(2):
                out = out + Li[i] * self._conv(barT2, Li[i] * barE2)
            return out
        raise ValueError(est)

    @partial(jax.jit, static_argnames=("self", "est", "return_ft"))
    def kappa_from_map(self, est, kx, ky=None, return_ft: bool = True):
        """Reconstruct kappa from raw-fft k-map legs.

        The reference-tutorials' ``qest.kappa_from_map("TT", kmap,
        alreadyFTed=True, returnFt=True)`` surface. Returns the raw-fft
        kappa (or the real map with ``return_ft=False``).
        """
        if ky is None:
            ky = kx
        uphi = self.unnormalized_phi(est, kx, ky)
        # "phys" fields are continuum/sqrt(area) (so <|T|^2> = C_l with a
        # Kronecker delta); the quadratic integral therefore carries one
        # residual 1/sqrt(area) that must be restored for the response to
        # the true phi to equal 1/A_L.
        phi = self.A_L(est) * uphi * self.kmask * (float(self.geom.area) ** 0.5)
        fkappa_phys = 0.5 * self.modlmap ** 2 * phi
        fkappa_raw = fkappa_phys / self._phys
        if return_ft:
            return fkappa_raw
        return _ifft(fkappa_raw).real


def lensing_noise_2d(geom: Geometry, theory, beam_arcmin, noise_t_uk_arcmin,
                     noise_p_uk_arcmin=None, dtype=jnp.float32):
    """Total 2D spectra of beam-deconvolved maps: C_l + N_l / b_l^2.

    The standard inputs to :class:`QE` (reference tutorials build exactly
    this: ``noise2d = (noise*arcmin)^2 / gauss_beam(modlmap, beam)**2``).
    """
    if noise_p_uk_arcmin is None:
        noise_p_uk_arcmin = np.sqrt(2.0) * noise_t_uk_arcmin
    modlmap = geom.modlmap(jnp.float64)
    ells = np.arange(theory.lpad + 1)
    b2 = np.asarray(F.gauss_beam(modlmap, beam_arcmin)) ** 2
    out = {}
    for spec, noise in (("TT", noise_t_uk_arcmin), ("EE", noise_p_uk_arcmin),
                        ("BB", noise_p_uk_arcmin)):
        cl = np.interp(np.asarray(modlmap), ells,
                       np.asarray(theory.lCl(spec, ells)), left=0, right=0)
        n2d = (noise * arcmin) ** 2 / np.maximum(b2, 1e-30)
        out[spec] = jnp.asarray(cl + n2d, dtype)
    return out


class NlGenerator:
    """Binned N_L^0 curves for instrument configs (the reference-tutorial
    ``NlGenerator(shape,wcs,theory,bin_edges)`` surface)."""

    def __init__(self, geom: Geometry, theory, bin_edges, dtype=jnp.float32):
        self.geom = geom
        self.theory = theory
        self.binner = Bin2D(np.asarray(geom.modlmap(jnp.float64)), bin_edges)
        self.dtype = dtype
        self._qe = None

    def update_noise(self, beam_arcmin, noise_t_uk_arcmin,
                     noise_p_uk_arcmin=None, tellmin=30, tellmax=3000,
                     pellmin=30, pellmax=5000, kmin=10, kmax=None):
        ctot = lensing_noise_2d(self.geom, self.theory, beam_arcmin,
                                noise_t_uk_arcmin, noise_p_uk_arcmin,
                                self.dtype)
        xt = F.mask_kspace(self.geom, lmin=tellmin, lmax=tellmax)
        kmask = F.mask_kspace(self.geom, lmin=kmin, lmax=kmax)
        self._qe_t = QE(self.geom, self.theory, ctot, xmask=xt, kmask=kmask,
                        dtype=self.dtype)
        xp = F.mask_kspace(self.geom, lmin=pellmin, lmax=pellmax)
        self._qe_p = QE(self.geom, self.theory, ctot, xmask=xp, kmask=kmask,
                        dtype=self.dtype)
        return self

    updateNoise = update_noise

    def get_nl(self, est="TT"):
        est = est.upper()
        qe = self._qe_t if est == "TT" else self._qe_p
        n2d = qe.N_L_kk(est)
        cents, n1d = self.binner.bin(n2d)
        return cents, np.asarray(n1d)

    getNl = get_nl

    def get_nl_mv(self, ests=("TT", "TE", "EE", "EB", "TB")):
        """Naive minimum-variance combination 1/N = sum 1/N_est."""
        invs = []
        for est in ests:
            qe = self._qe_t if est == "TT" else self._qe_p
            n2d = np.asarray(qe.N_L_kk(est), dtype=np.float64)
            invs.append(np.where(n2d > 0, 1.0 / n2d, 0.0))
        tot = np.sum(invs, axis=0)
        n_mv = np.where(tot > 0, 1.0 / tot, 0.0)
        cents, n1d = self.binner.bin(jnp.asarray(n_mv))
        return cents, np.asarray(n1d)


def _safe_mask(m):
    return m
