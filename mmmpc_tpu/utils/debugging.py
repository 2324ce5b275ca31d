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


def report_unconverged(ocp, result, params, *, top_k: int = 3, file=None):
    """Fire the batched failure dump whenever part of a batch failed to
    converge — the wiring the reference gets from its try/except print block
    (/root/reference/controllers/mpc_wholebody_qref.py:318-326), applied to
    the batched result instead of a single failed IPOPT solve.

    Returns True when the report fired.  Consumers (bench.py, the batch
    engines' drivers) call this unconditionally after a batched solve; the
    report only prints when ``result.converged`` is not all-True.
    """
    import sys

    import numpy as np

    conv = np.asarray(result.converged)
    if conv.ndim == 0 or bool(conv.all()):
        return False
    out = file if file is not None else sys.stderr
    n_bad = int((~conv).sum())
    print(f"[worst-scenario report] {n_bad}/{conv.size} scenarios "
          f"unconverged:", file=out)
    print(worst_scenario_report(ocp, result, params,
                                top_k=min(top_k, n_bad)), file=out)
    return True


def report_rollout_failures(log, *, constraint_tol: float, top_k: int = 3,
                            file=None):
    """Closed-loop twin of :func:`report_unconverged` for the batched
    engines' RolloutLog/TaskLog outputs (per-tick violation + fallback
    columns instead of per-solve convergence flags).

    Fires when any scenario's worst tick violates ``constraint_tol`` or used
    the shifted-fallback command; dumps the top-k worst scenarios with the
    tick index, the closed-loop state at that tick, and fallback counts.
    Returns True when the report fired.
    """
    import sys

    import numpy as np

    viol = np.asarray(log.violation)            # (B, T)
    fb = (np.asarray(log.fallback)
          if hasattr(log, "fallback") and log.fallback is not None
          else np.zeros_like(viol, dtype=bool))
    worst = viol.max(axis=1)
    bad = (worst > constraint_tol) | fb.any(axis=1)
    if not bad.any():
        return False
    out = file if file is not None else sys.stderr
    order = np.argsort(-worst)[:top_k]
    print(f"[worst-scenario report] {int(bad.sum())}/{viol.shape[0]} "
          f"rollouts exceeded tol {constraint_tol:g} or used the fallback:",
          file=out)
    X = np.asarray(log.X)
    for b in order:
        if not bad[b]:
            continue
        t = int(viol[b].argmax())
        print(f"-- scenario {int(b)}: max violation {worst[b]:.3e} at tick "
              f"{t} (fallback ticks: {int(fb[b].sum())})", file=out)
        print(f"   x[tick]={X[b, min(t, X.shape[1] - 1)].round(4)}",
              file=out)
    return True


def worst_scenario_report(ocp, result, params, top_k: int = 1):
    """Batched failure forensics: extract the argmax-violation scenario(s)
    from a batched SolveResult and break their violation down per constraint
    group — the batched analogue of the reference's failure dump
    (/root/reference/controllers/mpc_wholebody_qref.py:318-326, which prints
    full X/U/s and per-state obstacle margins when one IPOPT solve fails).

    Returns the report string (also suitable for logging).  Host-side; pass
    the params dict the batch was solved with.
    """
    import numpy as np

    viol = np.asarray(result.max_violation)
    if viol.ndim == 0:
        raise ValueError("worst_scenario_report expects a batched result")
    order = np.argsort(-viol)[:top_k]
    lines = [describe_result(result)]
    ks = jnp.arange(ocp.N)
    for b in order:
        X = jnp.asarray(np.asarray(result.X[b]))
        U = jnp.asarray(np.asarray(result.U[b]))
        cs = jax.vmap(lambda x, u, k: ocp.stage_ineq(x, u, k, params))(
            X[:-1], U, ks)
        ct = ocp.terminal_ineq(X[-1], params)
        he = ocp.terminal_eq(X[-1], params)
        lines.append(
            f"-- scenario {int(b)}: viol={viol[b]:.3e} "
            f"cost={float(np.asarray(result.cost[b])):.4f} "
            f"converged={bool(np.asarray(result.converged[b]))}")
        cs_np = np.asarray(cs)
        if cs_np.size:
            stage_idx, row_idx = np.unravel_index(
                np.argmax(cs_np), cs_np.shape)
            lines.append(
                f"   stage ineq: worst row {int(row_idx)} at stage "
                f"{int(stage_idx)} -> {cs_np.max():.3e} "
                f"(rows>0: {(cs_np > 0).sum()} of {cs_np.size})")
            # per-row maxima over the horizon, only the violated rows
            row_max = cs_np.max(axis=0)
            bad = np.flatnonzero(row_max > 0)
            for r in bad[:10]:
                lines.append(f"     row {int(r)}: max over horizon "
                             f"{row_max[r]:.3e}")
        ct_np = np.asarray(ct)
        if ct_np.size:
            lines.append(f"   terminal ineq: max {ct_np.max():.3e} "
                         f"(rows>0: {(ct_np > 0).sum()} of {ct_np.size})")
        he_np = np.asarray(he)
        if he_np.size:
            lines.append(f"   terminal eq: max |h| "
                         f"{np.abs(he_np).max():.3e}")
        lines.append(f"   x0={np.asarray(result.X[b, 0]).round(4)}")
        lines.append(f"   u0={np.asarray(result.U[b, 0]).round(4)}")
    return "\n".join(lines)
