"""Isolate per-iteration vs per-round vs per-solve fixed costs by config
differencing (full lanes-path solves on the real TPU)."""
import dataclasses, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_problem, SOLVER_CFG, BATCH
from scripts.ablate_solver import time_cfg

def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    grid = [
        ("1 round x 10", dict(al_iters=1, ilqr_iters=10)),
        ("1 round x 30", dict(al_iters=1, ilqr_iters=30)),
        ("1 round x 50", dict(al_iters=1, ilqr_iters=50)),
        ("8 rounds x 5", dict(al_iters=8, ilqr_iters=5, ilqr_iters_later=5)),
        ("n_alpha=2 1x30", dict(al_iters=1, ilqr_iters=30, n_alpha=2)),
        ("no fused bwd 1x30", dict(al_iters=1, ilqr_iters=30,
                                   use_fused_backward=False)),
    ]
    for name, kw in grid:
        cfg = dataclasses.replace(SOLVER_CFG, scan_unroll=10, **kw)
        dt, conv = time_cfg(mpc.ocp, x0_b, U0_b, params, cfg)
        print(f"{name:24s} {dt:8.2f} ms  conv {conv*100:5.1f}%", flush=True)

if __name__ == "__main__":
    main()
