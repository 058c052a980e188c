"""Stub coordinates module for the parity shim."""


def __getattr__(name):
    raise NotImplementedError(f"shim pixell.coordinates has no '{name}'")
