"""Real-time single-solve latency: warm-started receding-horizon config.

Measures p50/p99 wall-clock per MPC tick on the TPU, including host round
trips, for two deployment shapes:

- single scenario (B=1, pure-JAX scan path) — the classic one-robot loop;
- batch-1024 lanes path (Pallas kernels) — fleet serving, which also bounds
  the single-robot latency if one pads the batch.

The RT config (al_iters=3, ilqr_iters=6, later=4) is the warm-start regime:
each tick starts from the previous solution shifted, so a handful of sweeps
tracks the optimum (BASELINE.md RT rows).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem
from mmmpc_tpu.solver import al_ilqr_solve, shift_multipliers
from mmmpc_tpu.solver.batched import al_ilqr_solve_batched
from mmmpc_tpu.utils.configs import SolverConfig

TICKS = 100
RT_CFG = SolverConfig(al_iters=3, ilqr_iters=6, ilqr_iters_later=4,
                      cost_scale=1e5, constraint_tol=1e-3, n_alpha=4,
                      alpha_decay=0.4, scan_unroll=10)


def pct(xs, q):
    return float(np.percentile(np.asarray(xs) * 1e3, q))


def run_loop(solve, x0, U0, params, lam0):
    """Receding-horizon loop carrying BOTH primal (U) and dual (lam) warm
    starts — the dual carry is what holds convergence at a 3x(6,4) budget."""
    res = solve(x0, U0, params, lam0)
    jax.block_until_ready(res.U)
    U, lam = res.U, shift_multipliers(res.lam_stage, res.lam_term, res.lam_eq)
    lat = []
    for _ in range(TICKS):
        t0 = time.perf_counter()
        res = solve(x0, U, params, lam)
        jax.block_until_ready(res.U)
        lat.append(time.perf_counter() - t0)
        U = res.U
        lam = shift_multipliers(res.lam_stage, res.lam_term, res.lam_eq)
    return lat, res


def main():
    mpc, x0_b, U0_b, params = build_problem(1024)
    ocp = mpc.ocp

    single = jax.jit(
        lambda x0, U0, p, lam0: al_ilqr_solve(ocp, x0, U0, p, RT_CFG,
                                              lam0=lam0))
    lat1, res1 = run_loop(single, x0_b[0], U0_b[0], params, None)
    print(f"B=1    p50 {pct(lat1, 50):6.1f} ms  p99 {pct(lat1, 99):6.1f} ms"
          f"  converged={bool(res1.converged)}"
          f"  viol={float(res1.max_violation):.2e}")

    batched = jax.jit(
        lambda x0, U0, p, lam0: al_ilqr_solve_batched(ocp, x0, U0, p, RT_CFG,
                                                      lam0_b=lam0))
    latB, resB = run_loop(batched, x0_b, U0_b, params, None)
    conv = float(jnp.mean(resB.converged.astype(jnp.float32)))
    print(f"B=1024 p50 {pct(latB, 50):6.1f} ms  p99 {pct(latB, 99):6.1f} ms"
          f"  converged={conv*100:.1f}%"
          f"  viol={float(jnp.max(resB.max_violation)):.2e}")


if __name__ == "__main__":
    main()
