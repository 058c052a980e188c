"""Vectorized root finding (reference ``orphics/algorithms.py:4``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["vectorized_bisection_search"]


def vectorized_bisection_search(x, inv_func, ybounds, monotonicity,
                                rtol=1e-4, max_iter=200, verbose=False,
                                hang_check_num_iter=None):
    """Find y(x) given the inverse x(y) by elementwise bisection.

    Jittable: a ``lax.while_loop`` over the whole vector with a hard
    iteration cap replaces the reference's Python loop + hang warning
    (``algorithms.py:32``). ``verbose`` and ``hang_check_num_iter`` are
    accepted for reference call-compatibility (``algorithms.py:4``); the
    hang check is subsumed by ``max_iter``.
    """
    if hang_check_num_iter is not None:
        max_iter = max(max_iter, 10 * hang_check_num_iter)
    if monotonicity not in ("increasing", "decreasing"):
        raise ValueError(monotonicity)
    inc = monotonicity == "increasing"
    x = jnp.asarray(x)
    yl = jnp.full_like(x, ybounds[0])
    yr = jnp.full_like(x, ybounds[1])

    def cond(state):
        yl, yr, i, tol = state
        return jnp.logical_and(jnp.any(jnp.abs(tol) > rtol), i < max_iter)

    def body(state):
        yl, yr, i, _ = state
        ynow = 0.5 * (yl + yr)
        tol = (inv_func(ynow) - x) / x
        if inc:
            yr = jnp.where(tol > 0, ynow, yr)
            yl = jnp.where(tol <= 0, ynow, yl)
        else:
            yl = jnp.where(tol > 0, ynow, yl)
            yr = jnp.where(tol <= 0, ynow, yr)
        return yl, yr, i + 1, tol

    yl, yr, _, _ = jax.lax.while_loop(cond, body,
                                      (yl, yr, 0, jnp.full_like(x, jnp.inf)))
    return 0.5 * (yl + yr)
