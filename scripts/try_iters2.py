"""Re-measure candidate schedules with the per-round rollout removed."""
import dataclasses, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_problem, SOLVER_CFG, BATCH
from scripts.ablate_solver import time_cfg

def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    for al, first, later in [(8, 20, None), (8, 20, 12), (8, 20, 10),
                             (8, 20, 8), (8, 22, 11), (9, 20, 10)]:
        cfg = dataclasses.replace(SOLVER_CFG, al_iters=al, ilqr_iters=first,
                                  ilqr_iters_later=later, scan_unroll=10)
        dt, conv = time_cfg(mpc.ocp, x0_b, U0_b, params, cfg)
        n_it = first + (al - 1) * (later or first)
        print(f"al={al} it={first}/{later}  {n_it:4d} iters  {dt:8.1f} ms"
              f"  conv {conv*100:5.1f}%", flush=True)

if __name__ == "__main__":
    main()
