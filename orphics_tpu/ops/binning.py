"""Radial binning of 2D spectra — the hot reduction of every pipeline.

TPU-native replacement for reference ``orphics/stats.py:782`` ``bin2D``
(``np.digitize`` + ``np.bincount``). The bin assignment of each Fourier
pixel is a pure function of the (static) geometry and bin edges, so it is
precomputed once on the host; the per-map reduction on device is then a
sorted segment-sum, which XLA lowers to an efficient reduction on TPU.

Two device strategies:
  * ``rowcum`` (fast path, auto-detected): radial modulus maps are monotone
    along every row after one shared static column permutation (|l| is
    monotone in |lx| at fixed ly). Binning then becomes: permute columns
    (static gather) -> per-row cumulative sum (dense) -> take the cumsum at
    static per-row bin-boundary positions -> difference and reduce over
    rows. No scatter at all — TPU scatters serialize and cost ~100x more
    than these dense ops.
  * ``segment``: ``jax.ops.segment_sum`` over sort-permuted data with
    ``indices_are_sorted=True`` — the fallback for non-radial modulus maps.

Per-bin means fold statically precomputed 1/count weights. fp32 row
cumsums span only one row (<= nx same-sign terms), keeping relative error
at the 1e-6 level even on 2048^2 grids.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Bin2D", "bin1d", "bin_in_annuli"]


class Bin2D:
    """Radial (annular) binner over a fixed 2D modulus map.

    Parameters
    ----------
    modmap : array (ny, nx)
        The modulus grid (``modlmap`` for spectra, ``modrmap`` for profiles).
    bin_edges : array (nbins+1,)
        Bin edges; semantics match ``np.digitize(..., right=True)`` as in
        the reference (values with ``edges[i-1] < v <= edges[i]`` fall in
        bin ``i-1``; values outside the edge range are dropped).
    """

    def __init__(self, modmap, bin_edges):
        modmap = np.asarray(modmap, dtype=np.float64)
        bin_edges = np.asarray(bin_edges, dtype=np.float64)
        self.bin_edges = bin_edges
        self.centers = (bin_edges[1:] + bin_edges[:-1]) / 2.0
        self.cents = self.centers  # reference-compatible alias
        self.nbins = len(bin_edges) - 1
        dig = np.digitize(modmap.reshape(-1), bin_edges, right=True)
        # dig in [0, nbins+1]; 0 and nbins+1 are out of range.
        self.counts = np.bincount(dig, minlength=self.nbins + 2)[1:-1]
        # Sort pixels by bin id once (host); device reduction is then a
        # gather + sorted segment reduce.
        perm = np.argsort(dig, kind="stable")
        self._perm = jnp.asarray(perm.astype(np.int32))
        self._sorted_ids = jnp.asarray(dig[perm].astype(np.int32))
        self._dig = dig
        # Static per-pixel weights folding the 1/count mean normalization.
        safe_counts = np.where(self.counts == 0, 1, self.counts)
        wvec = np.zeros(self.nbins + 2, dtype=np.float64)
        wvec[1:-1] = 1.0 / safe_counts
        self._mean_w = jnp.asarray(wvec[dig[perm]].astype(np.float32))
        self._nseg = self.nbins + 2
        self._inv_counts = jnp.asarray((1.0 / safe_counts * (self.counts > 0))
                                       .astype(np.float32))
        # ---- rowcum fast path: valid when one shared column permutation
        # makes every row of the modulus map non-decreasing. True for all
        # radial maps (modlmap, modrmap) on regular grids.
        ny, nx = modmap.shape
        colperm = np.argsort(modmap.min(axis=0), kind="stable")
        rows_sorted = modmap[:, colperm]
        self._rowcum = bool(np.all(np.diff(rows_sorted, axis=1) >= 0))
        if self._rowcum:
            # count of elements <= edge per row (digitize right=True puts
            # v == edge into the lower bin, so side='right')
            pos = np.empty((ny, len(bin_edges)), dtype=np.int32)
            for y in range(ny):
                pos[y] = np.searchsorted(rows_sorted[y], bin_edges, side="right")
            self._colperm = jnp.asarray(colperm.astype(np.int32))
            self._pos = jnp.asarray(pos)

    def _rowcum_sum(self, data2d):
        """Scatter-free per-bin sums: column permute -> row cumsum ->
        static boundary gathers -> row reduce."""
        d = jnp.take(data2d, self._colperm, axis=-1)
        c = jnp.cumsum(d, axis=-1)
        zero = jnp.zeros(c.shape[:-1] + (1,), c.dtype)
        cpad = jnp.concatenate([zero, c], axis=-1)
        pos = jnp.broadcast_to(self._pos, data2d.shape[:-2] + self._pos.shape)
        at_edges = jnp.take_along_axis(cpad, pos.astype(jnp.int32), axis=-1)
        rowbin = at_edges[..., 1:] - at_edges[..., :-1]  # (..., ny, nbins)
        return rowbin.sum(axis=-2)

    def sum(self, data2d):
        """Per-bin sums of ``data2d`` (leading batch dims OK)."""
        if self._rowcum:
            return self._rowcum_sum(data2d)
        flat = data2d.reshape(data2d.shape[:-2] + (-1,))
        s = jnp.take(flat, self._perm, axis=-1)
        out = _batched_segment_sum(s, self._sorted_ids, self._nseg)
        return out[..., 1:-1]

    def bin(self, data2d, weights=None):
        """Bin a 2D (or batch of 2D) array into annular means.

        Returns ``(centers, means)``; matches reference
        ``bin2D.bin`` (``orphics/stats.py:790-797``).
        """
        if self._rowcum:
            if weights is None:
                return self.centers, (self._rowcum_sum(data2d)
                                      * self._inv_counts.astype(data2d.dtype))
            w = jnp.broadcast_to(jnp.asarray(weights), data2d.shape[-2:])
            num = self._rowcum_sum(data2d * w)
            den = self._rowcum_sum(jnp.broadcast_to(w, data2d.shape))
            return self.centers, num / den
        flat = data2d.reshape(data2d.shape[:-2] + (-1,))
        s = jnp.take(flat, self._perm, axis=-1)
        if weights is None:
            out = _batched_segment_sum(s * self._mean_w, self._sorted_ids, self._nseg)
            return self.centers, out[..., 1:-1]
        wflat = jnp.take(weights.reshape(-1), self._perm, axis=-1)
        num = _batched_segment_sum(s * wflat, self._sorted_ids, self._nseg)[..., 1:-1]
        den = _batched_segment_sum(jnp.broadcast_to(wflat, s.shape),
                                   self._sorted_ids, self._nseg)[..., 1:-1]
        return self.centers, num / den

    def bin_err(self, data2d):
        """(centers, means, scatter-in-bin error) like the reference err path."""
        cents, means = self.bin(data2d)
        flat = data2d.reshape(data2d.shape[:-2] + (-1,))
        s = jnp.take(flat, self._perm, axis=-1)
        sq = _batched_segment_sum(s * s * self._mean_w, self._sorted_ids, self._nseg)[..., 1:-1]
        counts = jnp.asarray(np.maximum(self.counts, 2), dtype=means.dtype)
        var = (sq - means ** 2) * counts / (counts - 1.0)
        err = jnp.sqrt(jnp.maximum(var, 0.0) / counts)
        return cents, means, err


def _batched_segment_sum(data, ids, nseg):
    if data.ndim == 1:
        return jax.ops.segment_sum(data, ids, num_segments=nseg,
                                   indices_are_sorted=True)
    lead = data.shape[:-1]
    flat = data.reshape(-1, data.shape[-1])
    f = lambda v: jax.ops.segment_sum(v, ids, num_segments=nseg,
                                      indices_are_sorted=True)
    return jax.vmap(f)(flat).reshape(lead + (nseg,))


def bin1d(x, y, bin_edges):
    """Bin samples (x, y) into mean-per-bin; reference ``bin1D``
    (``orphics/stats.py:815``). Host-side numpy (used for theory curves)."""
    x = np.asarray(x)
    y = np.asarray(y)
    cents = (np.asarray(bin_edges)[1:] + np.asarray(bin_edges)[:-1]) / 2.0
    dig = np.digitize(x, bin_edges, right=True)
    nb = len(bin_edges) - 1
    sums = np.bincount(dig, weights=np.nan_to_num(y), minlength=nb + 2)[1:-1]
    cnts = np.bincount(dig[~np.isnan(y)], minlength=nb + 2)[1:-1]
    with np.errstate(invalid="ignore", divide="ignore"):
        means = sums / cnts
    return cents, means


def bin_in_annuli(data2d, modrmap, bin_edges):
    """One-shot annular binning (reference ``orphics/stats.py:853``)."""
    binner = Bin2D(modrmap, bin_edges)
    return binner.bin(data2d)
