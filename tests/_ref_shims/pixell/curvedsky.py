"""Stub: curved-sky entry points are not part of the flat-sky parity
shim; orphics_tpu's native SHT (ops/sht.py) is tested on its own."""


def __getattr__(name):
    raise NotImplementedError(
        f"shim pixell.curvedsky has no working '{name}'")
