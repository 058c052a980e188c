"""Host-side IO: config files, HDF5/npz/pickle persistence, hashing,
logging, colored prints (reference ``orphics/io.py``)."""
from __future__ import annotations

import contextlib
import hashlib
import io as _io
import logging
import os
import pickle
import sys
import time

import numpy as np

__all__ = ["save_dict", "load_dict", "save_pickle", "load_pickle",
           "get_hash", "hash_dict", "mkdir", "save_cols", "load_cols",
           "config_from_yaml", "config_from_file", "list_from_config",
           "bin_edges_from_config", "cprint", "bcolors", "get_logger",
           "nostdout", "load_path_config"]


# ---- dict <-> hdf5 (reference io.py:89-115) -------------------------

def save_dict(fname, d):
    import h5py
    with h5py.File(fname, "w") as f:
        for k, v in d.items():
            f[k] = np.asarray(v)


def load_dict(fname):
    import h5py
    out = {}
    with h5py.File(fname, "r") as f:
        for k in f.keys():
            out[k] = np.asarray(f[k])
    return out


def save_pickle(fname, obj):
    with open(fname, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(fname):
    with open(fname, "rb") as f:
        return pickle.load(f)


# ---- hashing (reference io.py:120-130) --------------------------------

def get_hash(arr):
    return hashlib.md5(np.ascontiguousarray(np.asarray(arr)).tobytes()).hexdigest()


def hash_dict(d):
    items = sorted((str(k), get_hash(np.asarray(v)) if hasattr(v, "__len__")
                    else str(v)) for k, v in d.items())
    return hashlib.md5(str(items).encode()).hexdigest()


def mkdir(dirpath, comm=None):
    """Race-safe mkdir (reference io.py:209 is MPI-collective; here any
    concurrent process tolerates the existing dir)."""
    os.makedirs(dirpath, exist_ok=True)
    return dirpath


def save_cols(fname, cols, **kwargs):
    np.savetxt(fname, np.stack([np.asarray(c) for c in cols], axis=1), **kwargs)


def load_cols(fname, **kwargs):
    return np.loadtxt(fname, unpack=True, **kwargs)


# ---- config (reference io.py:193-281) ----------------------------------

def config_from_yaml(fname):
    import yaml
    with open(fname) as f:
        return yaml.safe_load(f)


def config_from_file(fname):
    """INI file -> nested dict (reference io.py:257)."""
    import configparser
    cp = configparser.ConfigParser()
    cp.optionxform = str
    cp.read(fname)
    return {s: dict(cp[s]) for s in cp.sections()}


def load_path_config(fname=None):
    """paths_local.ini / paths.ini convention (reference io.py:245)."""
    import configparser
    if fname is None:
        for cand in ("input/paths_local.ini", "input/paths.ini"):
            if os.path.exists(cand):
                fname = cand
                break
    if fname is None:
        raise FileNotFoundError("no paths config found")
    cp = configparser.ConfigParser()
    cp.optionxform = str
    cp.read(fname)
    return cp


def list_from_config(config, section, name):
    return [float(x) for x in config[section][name].split(",")]


def bin_edges_from_config(config, section):
    """Bin-edge spec [lo, hi, width] lists (reference io.py:265)."""
    spec = config[section]
    lo = float(spec["bin_edges_low"]) if "bin_edges_low" in spec else None
    hi = float(spec["bin_edges_high"])
    w = float(spec["bin_edges_width"])
    return np.arange(lo, hi + w, w)


# ---- console / logging (reference io.py:152-182, 650-688) ---------------

class bcolors:
    HEADER = '\033[95m'
    OKBLUE = '\033[94m'
    OKGREEN = '\033[92m'
    WARNING = '\033[93m'
    FAIL = '\033[91m'
    ENDC = '\033[0m'
    BOLD = '\033[1m'
    UNDERLINE = '\033[4m'


def cprint(string, color=None, bold=False, uline=False):
    prefix = ""
    if color is not None:
        prefix = getattr(bcolors, {
            "h": "HEADER", "b": "OKBLUE", "g": "OKGREEN",
            "y": "WARNING", "r": "FAIL"}.get(color, color.upper()))
    if bold:
        prefix += bcolors.BOLD
    if uline:
        prefix += bcolors.UNDERLINE
    print(prefix + str(string) + bcolors.ENDC)


def get_logger(log_file=None, level=logging.INFO):
    """Timestamped file+console logger (reference io.py:172)."""
    logger = logging.getLogger("orphics_tpu")
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is None:
        log_file = time.strftime("log_%Y%m%d_%H%M%S.txt")
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    return logger


@contextlib.contextmanager
def nostdout():
    """Suppress stdout within a block (reference io.py:45)."""
    saved = sys.stdout
    sys.stdout = _io.StringIO()
    try:
        yield
    finally:
        sys.stdout = saved
