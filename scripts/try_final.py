"""Sweep (first, middle, final) inner budgets: the last AL round decides the
final violation, so polish there."""
import dataclasses, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_problem, SOLVER_CFG, BATCH
from scripts.ablate_solver import time_cfg

def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    grid = [
        (8, 20, 8, 14),
        (8, 20, 8, 18),
        (8, 20, 6, 16),
        (8, 20, 7, 16),
        (7, 20, 8, 16),
        (8, 18, 8, 14),
        (8, 20, 9, 14),
    ]
    for al, first, later, fin in grid:
        cfg = dataclasses.replace(SOLVER_CFG, al_iters=al, ilqr_iters=first,
                                  ilqr_iters_later=later,
                                  ilqr_iters_final=fin, scan_unroll=10)
        dt, conv = time_cfg(mpc.ocp, x0_b, U0_b, params, cfg)
        n_it = first + (al - 2) * later + fin
        print(f"al={al} it={first}/{later}/{fin}  {n_it:4d} iters"
              f"  {dt:8.1f} ms  conv {conv*100:5.1f}%", flush=True)

if __name__ == "__main__":
    main()
