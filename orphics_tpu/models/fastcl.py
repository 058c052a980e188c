"""Speed-of-light binned power spectra: the fused Pallas pipeline as an API.

The reference measures bandpowers with ``maps.FourierCalc.power2d`` +
``stats.bin2D`` (``orphics/maps.py:1594-1650``, ``orphics/stats.py:782``)
— FFT, square, digitize/bincount per map. :class:`FastCl` packages this
framework's fused TPU path behind one object:

  * synthesis and analysis FFTs on the Pallas radix/MXU kernels
    (:mod:`~orphics_tpu.ops.pallas_fft`), the Fourier plane kept in the
    kernels' permuted layout end to end;
  * the covsqrt multiply fused into the inverse FFT (GRF synthesis);
  * mirror + Hermitian split + power collapsed to one half-plane pass
    (``qc_pp_half``) and a half-volume MXU bin-reduce (``bin2_matmul``);
  * two real maps per complex FFT via classic pair packing.

This is the engine behind ``bench.py`` (~1830 sim->bandpower pipelines/s
at 2048^2 fp32 on one v5e chip). Grids must be n = 128*B with B >= 2;
on non-TPU backends the Pallas kernels run in interpreter mode (slow but
exact), so tests and CPU prototyping work unchanged.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import Geometry
from ..ops.binning import Bin2D
from ..ops import pallas_fft as pf
from ..ops.pallas_kernels import bin2_matmul

__all__ = ["FastCl"]


class FastCl:
    """Fused GRF-simulation / bandpower engine on a fixed geometry.

    Parameters
    ----------
    geom : Geometry with shape (n, n), n = 128*B.
    ells, cl1d : 1D theory spectrum for simulation (ells must start at 0
        and step by 1, as from ``TheorySpectra`` tables). Optional —
        pass None to use :meth:`map_bandpowers` only.
    bin_edges : radial bin edges (digitize right=True semantics, as the
        reference's ``bin2D``).
    """

    def __init__(self, geom: Geometry, ells=None, cl1d=None,
                 bin_edges=None, interpret: bool = None):
        n = geom.shape[-1]
        if geom.shape[-2] != n or n % 128 or n < 256:
            raise ValueError("FastCl needs a square n = 128*B grid, B>=2")
        if bin_edges is None:
            raise ValueError("FastCl requires bin_edges")
        if interpret is None:
            # Pallas TPU kernels only lower on tpu-like backends (incl.
            # the axon remote client); everywhere else use interpret
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.geom = geom
        self.n = n
        self.interpret = bool(interpret)
        perm, inv = pf.row_perm(n)
        ml = geom.modlmap_np()
        # Bin2D used transiently for its digitize-table conventions;
        # not retained (its gather tables are ~50 MB at 2048^2 and the
        # fused passes never use them)
        binner = Bin2D(ml[perm][:, perm], np.asarray(bin_edges))
        self.centers = binner.centers
        self._norm = jnp.float32(geom.area / geom.npix ** 2)
        dig2d = np.asarray(binner._dig_dev).reshape(n, n)
        p_of_h, self._pnyq = pf.half_rows(n)
        self._idc = jnp.asarray(dig2d[p_of_h].reshape(-1))
        self._nsg = binner._nseg
        self._icnt = binner._inv_counts
        del binner
        self._mrow = jnp.asarray(inv[(n - perm) % n].astype(np.int32))
        seg = np.arange(self._nsg)[None, :]
        self._oh0 = jnp.asarray((dig2d[0][:, None] == seg)
                                .astype(np.float32))
        self._ohn = jnp.asarray((dig2d[self._pnyq][:, None] == seg)
                                .astype(np.float32))
        self._covsqrt_pp = None
        if cl1d is not None:
            from .grf import spec2flat
            cl = np.asarray(cl1d, np.float64)
            if ells is not None:
                # spec2flat paints by INTEGER index: re-grid spectra
                # whose ells don't start at 0 with unit step (e.g.
                # CAMB tables from ell 2) instead of silently shifting
                # every multipole
                ells = np.asarray(ells)
                if len(ells) != len(cl):
                    raise ValueError("ells and cl1d length mismatch")
                if ells[0] != 0 or np.any(np.diff(ells) != 1):
                    dense = np.arange(int(ells[-1]) + 1)
                    cl = np.interp(dense, ells, cl, left=0.0, right=0.0)
            cs = spec2flat(geom, cl[None, None], exp=0.5,
                           dtype=jnp.float32)[0, 0]
            self._covsqrt_pp = jnp.asarray(
                np.asarray(cs)[perm][:, perm]
                * np.sqrt(geom.npix).astype(np.float32))

    def _row_bins(self, Zr, Zi, p, oh):
        zr, zi = Zr[:, p, :], Zi[:, p, :]
        zmr = jnp.take(zr, self._mrow, axis=1)
        zmi = jnp.take(zi, self._mrow, axis=1)
        qs = 0.5 * (zr * zr + zi * zi + zmr * zmr + zmi * zmi)
        c = zr * zmr - zi * zmi
        hp = jax.lax.Precision.HIGHEST
        return (jnp.einsum("bk,ks->bs", qs, oh, precision=hp),
                jnp.einsum("bk,ks->bs", c, oh, precision=hp))

    def _pair_bandpowers(self, m1, m2):
        """Binned |F1|^2, |F2|^2 of packed real-map pairs via the FUSED
        row-DFT + half-plane power pass (``fft2pp_qc``): the Fourier
        plane never materializes in HBM; boundary-row bins come from
        the [0, 128) Z-row strip the fused pass emits."""
        yr, yi = pf.colfft(m1, m2, interpret=self.interpret)
        return self._pair_bandpowers_y(yr, yi)

    def _pair_bandpowers_y(self, yr, yi):
        """Same from the column intermediate Y (synthesis pipelines pass
        their pre-column Y' directly — colfft(colifft(Y')) = Y')."""
        npairs = yr.shape[0]
        n = self.n
        qs, cc, zrow_r, zrow_i = pf.rowqc_pp(yr, yi,
                                             interpret=self.interpret)
        nh = n // 2
        bqc, bcc = bin2_matmul(qs.reshape(npairs, nh * n),
                               cc.reshape(npairs, nh * n),
                               self._idc, self._nsg,
                               interpret=self.interpret)
        bq0, bc0 = self._row_bins(zrow_r, zrow_i, 0, self._oh0)
        bqn, bcn = self._row_bins(zrow_r, zrow_i, self._pnyq, self._ohn)
        bq = (2.0 * bqc - bq0 + bqn)[:, 1:-1]
        bc = (2.0 * bcc - bc0 + bcn)[:, 1:-1]
        hn = jnp.float32(0.5) * self._norm
        b1 = (bq + bc) * hn * self._icnt
        b2 = (bq - bc) * hn * self._icnt
        return b1, b2

    def sim_bandpowers(self, key, batch: int):
        """(batch, nbins) binned auto bandpowers of `batch` fresh GRF
        sims (and nothing else materializes full-size beyond the FFT
        planes). `batch` must be even; maps come in Re/Im pairs of one
        synthesis inverse FFT. Pass an int seed (fastest: the white
        noise is drawn by the on-chip PRNG inside the synthesis kernel,
        see ``pallas_fft.ifft2pp_noise``) or a JAX PRNG key."""
        if self._covsqrt_pp is None:
            raise ValueError("construct FastCl with (ells, cl1d) to sim")
        if batch % 2:
            raise ValueError("batch must be even (pair-packed sims)")
        npairs = batch // 2
        is_int_seed = isinstance(key, (int, np.integer)) or (
            hasattr(key, "dtype") and jnp.issubdtype(key.dtype, jnp.integer)
            and jnp.ndim(key) == 0)  # old-style PRNGKeys are (2,) uint32
        # the maps are internal here, so the synthesis column pass and
        # the analysis column pass (exact inverses) are BOTH skipped:
        # the pre-column intermediate Y' feeds the fused row-qc directly
        if is_int_seed:
            yr, yi = pf.rowifft_noise_y(self._covsqrt_pp, key, npairs,
                                        interpret=self.interpret)
        else:
            kr, ki = jax.random.split(key)
            shape = (npairs, self.n, self.n)
            er = jax.random.normal(kr, shape, jnp.float32)
            ei = jax.random.normal(ki, shape, jnp.float32)
            yr, yi = pf.rowifft_scaled_y(er, ei, self._covsqrt_pp,
                                         interpret=self.interpret)
        b1, b2 = self._pair_bandpowers_y(yr, yi)
        return jnp.concatenate([b1, b2])

    def cross_bandpowers(self, maps1, maps2, window=None):
        """(B, nbins) binned cross spectra Re(x_hat conj(y_hat)) of two
        real map sets (B, n, n) — one packed FFT per pair: for
        Z = fft2(x + i y), the cross power is Im(Z(k) Z(-k))/2, another
        mirror-even field binned on the half plane. An optional
        ``window`` (n, n) apodization is fused onto the first FFT
        kernel's load (the windowed maps never materialize); debias the
        result by the window's w2 factor yourself."""
        m1 = jnp.asarray(maps1, jnp.float32)
        m2 = jnp.asarray(maps2, jnp.float32)
        if m1.ndim == 2:
            m1, m2 = m1[None], m2[None]
        if m1.shape != m2.shape:
            raise ValueError(f"map sets must match: {m1.shape} vs "
                             f"{m2.shape}")
        n = self.n
        if window is not None:
            yr, yi = pf.colfft_scaled(m1, m2, jnp.asarray(window),
                                      interpret=self.interpret)
        else:
            yr, yi = pf.colfft(m1, m2, interpret=self.interpret)
        s, zrow_r, zrow_i = pf.rows_pp(yr, yi, interpret=self.interpret)
        from ..ops.pallas_kernels import bin_matmul
        bsh = bin_matmul(s.reshape(s.shape[0], (n // 2) * n), self._idc,
                         self._nsg, interpret=self.interpret)

        def srow(p, oh):
            zr, zi = zrow_r[:, p, :], zrow_i[:, p, :]
            zmr = jnp.take(zr, self._mrow, axis=1)
            zmi = jnp.take(zi, self._mrow, axis=1)
            return jnp.einsum("bk,ks->bs", zr * zmi + zi * zmr, oh,
                              precision=jax.lax.Precision.HIGHEST)

        bs = (2.0 * bsh - srow(0, self._oh0)
              + srow(self._pnyq, self._ohn))[:, 1:-1]
        return bs * (jnp.float32(0.5) * self._norm) * self._icnt

    def map_bandpowers(self, maps):
        """(B, nbins) binned auto power spectra of real maps (B, n, n) —
        the fast replacement for FourierCalc.power2d + bin2D per map.
        Odd B is padded with a zero map internally."""
        maps = jnp.asarray(maps, jnp.float32)
        if maps.ndim == 2:
            maps = maps[None]
        B = maps.shape[0]
        if B % 2:
            maps = jnp.concatenate(
                [maps, jnp.zeros((1,) + maps.shape[1:], maps.dtype)])
        m1, m2 = maps[0::2], maps[1::2]
        b1, b2 = self._pair_bandpowers(m1, m2)
        out = jnp.stack([b1, b2], axis=1).reshape(-1, b1.shape[-1])
        return out[:B]
