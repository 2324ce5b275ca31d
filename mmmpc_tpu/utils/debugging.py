"""Numerical-debugging toggles.

The reference's failure diagnostics are prints in the solve exception path
(mpc_wholebody_qref.py:318-326).  Here the solver never raises — results
carry convergence flags and violation maxima — and these helpers cover the
remaining "where did the NaN come from" workflow (SURVEY.md §5: NaN-check
mode; JAX purity stands in for race detection — there is no shared mutable
state to race on).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_checks():
    """Raise at the first NaN produced inside the context (jax.debug_nans).

    Expensive (disables some fusion); use when a rollout reports
    non-finite costs, not in production.
    """
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def assert_finite_result(result, what="solve"):
    """Host-side sanity check of a SolveResult (raises AssertionError)."""
    for name in ("X", "U", "cost"):
        v = getattr(result, name)
        assert bool(jnp.all(jnp.isfinite(v))), f"{what}: non-finite {name}"


def describe_result(result):
    """One-line human-readable summary of a SolveResult."""
    import numpy as np
    cost = np.asarray(result.cost)
    viol = np.asarray(result.max_violation)
    conv = np.asarray(result.converged)
    if cost.ndim == 0:
        return (f"cost={float(cost):.4f} viol={float(viol):.2e} "
                f"converged={bool(conv)}")
    return (f"batch={cost.shape[0]} mean_cost={cost.mean():.4f} "
            f"max_viol={viol.max():.2e} converged={conv.mean()*100:.1f}%")
