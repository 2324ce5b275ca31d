"""Many-AL-rounds / few-inner-iters schedules (dual updates look like the
convergence bottleneck, not inner sweeps)."""
import dataclasses, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_problem, SOLVER_CFG, BATCH
from scripts.ablate_solver import time_cfg

def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    grid = [
        (12, 12, 6, 10.0, 3.0),
        (16, 8, 4, 10.0, 2.0),
        (16, 6, 4, 10.0, 2.0),
        (12, 10, 6, 30.0, 2.5),
        (10, 14, 7, 10.0, 3.0),
        (20, 6, 3, 10.0, 1.8),
        (12, 8, 6, 10.0, 3.0),
        (10, 12, 8, 10.0, 3.0),
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
