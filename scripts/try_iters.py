"""Iteration-budget sweep at scan_unroll=10: find the cheapest schedule that
still converges the full bench batch."""

import dataclasses
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, SOLVER_CFG, BATCH
from scripts.ablate_solver import time_cfg


def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    for al, first, later in [(8, 20, None), (8, 20, 12), (8, 20, 8),
                             (8, 24, 6), (8, 30, 4), (6, 20, 8),
                             (10, 20, 6), (8, 16, 8)]:
        cfg = dataclasses.replace(SOLVER_CFG, al_iters=al, ilqr_iters=first,
                                  ilqr_iters_later=later, scan_unroll=10)
        dt, conv = time_cfg(mpc.ocp, x0_b, U0_b, params, cfg)
        n_it = first + (al - 1) * (later or first)
        print(f"al={al} first={first} later={later}  {n_it:4d} iters  "
              f"{dt:8.1f} ms  conv {conv*100:5.1f}%")


if __name__ == "__main__":
    main()
