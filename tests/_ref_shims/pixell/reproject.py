"""Stub reproject module for the parity shim."""


def __getattr__(name):
    raise NotImplementedError(f"shim pixell.reproject has no '{name}'")
