"""Stub resample module for the parity shim."""


def __getattr__(name):
    raise NotImplementedError(f"shim pixell.resample has no '{name}'")
