"""``pixell.fft`` subset: RAW forward transform; ifft(normalize=True)
matches numpy ifft (pixell's underlying transforms are unnormalized)."""
import numpy as np


def fft(a, ka=None, axes=(-2, -1), nthread=0, **kw):
    return np.fft.fftn(np.asarray(a), axes=tuple(axes))


def ifft(a, oa=None, axes=(-2, -1), normalize=True, nthread=0, **kw):
    axes = tuple(axes)
    res = np.fft.ifftn(np.asarray(a), axes=axes)
    if not normalize:
        res = res * np.prod([a.shape[ax] for ax in axes])
    return res


def rfft(a, axes=(-2, -1), **kw):
    return np.fft.rfftn(np.asarray(a), axes=tuple(axes))


def irfft(a, n=None, axes=(-2, -1), normalize=True, **kw):
    axes = tuple(axes)
    res = np.fft.irfftn(np.asarray(a), s=n, axes=axes)
    if not normalize:
        res = res * np.prod(res.shape[axes[0]:])
    return res
