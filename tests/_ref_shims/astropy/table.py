"""Shim ``astropy.table.Table``: dict-of-columns with .to_pandas()."""
import numpy as np


class Table(dict):
    @classmethod
    def read(cls, path, **kw):
        from orphics_tpu.utils.fitsio import read_bintable
        return cls({k: np.asarray(v) for k, v in read_bintable(path).items()})

    def to_pandas(self):
        import pandas as pd
        return pd.DataFrame({k: np.asarray(v).ravel()
                             for k, v in self.items()})
