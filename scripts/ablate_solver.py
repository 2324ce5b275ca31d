"""Ablation timing: marginal cost of each solver knob on the full jitted
batched solve (bench problem, batch 1024).  More faithful than isolated
component timing, which is dominated by dispatch/layout overhead."""

import dataclasses
import time

import jax
import jax.numpy as jnp

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, SOLVER_CFG, BATCH
from mmmpc_tpu.solver.batched import al_ilqr_solve_batched


def time_cfg(ocp, x0_b, U0_b, params, cfg, reps=5):
    fn = jax.jit(lambda x0, U0: al_ilqr_solve_batched(ocp, x0, U0,
                                                      params, cfg))
    res = fn(x0_b, U0_b)
    jax.block_until_ready(res.U)
    t0 = time.perf_counter()
    for _ in range(reps):
        res = fn(x0_b, U0_b)
    jax.block_until_ready(res.U)
    dt = (time.perf_counter() - t0) / reps * 1e3
    conv = float(jnp.mean(res.converged.astype(jnp.float32)))
    return dt, conv


def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    ocp = mpc.ocp
    base = SOLVER_CFG

    variants = [
        ("baseline (al=8, ilqr=20, n_alpha=4)", base),
        ("n_alpha=2", dataclasses.replace(base, n_alpha=2)),
        ("n_alpha=8", dataclasses.replace(base, n_alpha=8)),
        ("ilqr_iters=10", dataclasses.replace(base, ilqr_iters=10)),
        ("al_iters=4", dataclasses.replace(base, al_iters=4)),
        ("ilqr_iters_later=4", dataclasses.replace(base,
                                                   ilqr_iters_later=4)),
        ("no pallas riccati", dataclasses.replace(
            base, use_pallas_riccati=False)),
    ]
    for name, cfg in variants:
        dt, conv = time_cfg(ocp, x0_b, U0_b, params, cfg)
        n_it = cfg.ilqr_iters + (cfg.al_iters - 1) * (
            cfg.ilqr_iters_later or cfg.ilqr_iters)
        print(f"{name:42s} {dt:8.1f} ms  conv {conv*100:5.1f}%  "
              f"({n_it} iters, {dt/n_it:.3f} ms/iter)")


if __name__ == "__main__":
    main()
