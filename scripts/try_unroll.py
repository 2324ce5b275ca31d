"""Does unrolling the line-search rollout scan help? Times the full batched
solve at several unroll factors."""

import dataclasses
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, SOLVER_CFG, BATCH
from scripts.ablate_solver import time_cfg


def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    for unroll in (1, 2, 4, 10, 20):
        cfg = dataclasses.replace(SOLVER_CFG, scan_unroll=unroll)
        dt, conv = time_cfg(mpc.ocp, x0_b, U0_b, params, cfg)
        print(f"unroll={unroll:3d}  {dt:8.1f} ms  conv {conv*100:5.1f}%")


if __name__ == "__main__":
    main()
