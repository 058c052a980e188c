"""healpy import shim: reference orphics.maps imports healpy at module
scope but only calls it inside functions the parity tests never hit.
Any actual call raises."""


def __getattr__(name):
    raise NotImplementedError(f"shim healpy has no working '{name}'")
