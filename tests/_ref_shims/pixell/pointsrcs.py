"""Stub pointsrcs module for the parity shim."""


def __getattr__(name):
    raise NotImplementedError(f"shim pixell.pointsrcs has no '{name}'")
