"""Shim ``astropy.coordinates.Angle``: degree container with wrap_at."""
import numpy as np


class Angle:
    def __init__(self, val):
        self._deg = np.asarray(val, dtype=float)

    def wrap_at(self, at):
        assert str(at) in ("180d", "180 deg"), at
        return Angle(((self._deg + 180.0) % 360.0) - 180.0)

    @property
    def degree(self):
        return self._deg
