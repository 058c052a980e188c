"""Numpy stand-in for the ``szar`` package (only the ``foregrounds``
submodule that ``orphics.foregrounds.ilc_power`` imports at call time,
reference ``foregrounds.py:493``)."""
from . import foregrounds  # noqa: F401
