"""Shim ``astropy.io.fits``: read-only ``open`` over FITS binary
tables, backed by the shim's own self-contained reader
(``_minifits.py``) — independent of orphics_tpu, so reference-side
reads share only the file bytes with the code under test."""
import numpy as np


class _HDU:
    def __init__(self, data=None, header=None, columns=None):
        self.data = data
        self.header = header or {}
        self.columns = columns


class BinTableHDU(_HDU):
    pass


class TableHDU(_HDU):
    pass


class PrimaryHDU(_HDU):
    pass


class HDUList(list):
    def close(self):
        pass

    def writeto(self, *a, **kw):
        raise NotImplementedError("shim astropy: read-only")

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def ColDefs(cols):
    return list(cols)


def open(path, **kw):  # noqa: A001 - astropy's own name
    from ._minifits import read_bintable
    cols = read_bintable(path)
    names = list(cols.keys())
    rec = np.rec.fromarrays([np.asarray(cols[n]).ravel() for n in names],
                            names=names)
    return HDUList([PrimaryHDU(), BinTableHDU(data=rec, columns=names)])
