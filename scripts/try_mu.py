"""Sweep AL penalty schedules x iteration budgets: find the cheapest
schedule that converges 100% of the bench batch (cold start)."""

import dataclasses
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, SOLVER_CFG, BATCH
from scripts.ablate_solver import time_cfg


def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    grid = [
        # (al, first, later, mu_init, mu_scale)
        (8, 20, 8, 10.0, 5.0),
        (8, 20, 8, 30.0, 5.0),
        (8, 20, 8, 100.0, 3.0),
        (8, 20, 8, 10.0, 8.0),
        (6, 20, 10, 30.0, 5.0),
        (6, 20, 10, 100.0, 5.0),
        (6, 24, 10, 30.0, 8.0),
        (7, 20, 10, 30.0, 5.0),
        (8, 20, 10, 30.0, 5.0),
        (8, 20, 10, 10.0, 5.0),
    ]
    for al, first, later, mi, ms in grid:
        cfg = dataclasses.replace(SOLVER_CFG, al_iters=al, ilqr_iters=first,
                                  ilqr_iters_later=later, mu_init=mi,
                                  mu_scale=ms, scan_unroll=10)
        dt, conv = time_cfg(mpc.ocp, x0_b, U0_b, params, cfg)
        n_it = first + (al - 1) * (later or first)
        print(f"al={al} it={first}/{later} mu={mi:g}x{ms:g}  {n_it:4d} iters"
              f"  {dt:8.1f} ms  conv {conv*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
