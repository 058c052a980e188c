"""Deterministic toy ephemeris for the parity shim.

``orphics.time.body_circle_annotations`` (reference ``time.py:195``)
calls ``pixell.ephem.eval(body, ctimes) -> (radec, dist)``. The real
pixell wraps an ephemeris solver; structural parity tests inject this
SAME toy into both the reference (via this shim) and orphics_tpu (by
monkeypatching ``orphics_tpu.ephem``), so the assertion covers the
annotation construction (sampling density, styles, row format), not
the solver.
"""
import numpy as np


def eval(name, ctimes):  # noqa: A001  (pixell's name)
    ct = np.atleast_1d(np.asarray(ctimes, dtype=float))
    seed = float(sum(map(ord, name)))
    ra = np.mod(0.013 * seed + ct / 5.3e8, 2 * np.pi)
    dec = 0.35 * np.sin(ct / 8.1e7 + seed)
    radec = np.stack([ra, dec], axis=-1)
    dist = 1.0 + 0.1 * np.cos(ct / 9.7e7 + seed)
    return radec, dist
