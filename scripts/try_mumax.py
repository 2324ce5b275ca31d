"""Cap the AL penalty (float32 conditioning) and let multiplier updates do
the work; also n_alpha=3 economy."""
import dataclasses, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_problem, SOLVER_CFG, BATCH
from scripts.ablate_solver import time_cfg

def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    grid = [
        ("mu_max=1e3 8x20/10", dict(al_iters=8, ilqr_iters=20,
                                    ilqr_iters_later=10, mu_max=1e3)),
        ("mu_max=1e4 8x20/10", dict(al_iters=8, ilqr_iters=20,
                                    ilqr_iters_later=10, mu_max=1e4)),
        ("mu_max=1e4 10x20/8", dict(al_iters=10, ilqr_iters=20,
                                    ilqr_iters_later=8, mu_max=1e4)),
        ("mu_max=3e3 10x20/8", dict(al_iters=10, ilqr_iters=20,
                                    ilqr_iters_later=8, mu_max=3e3)),
        ("n_alpha=3 d.35 8x20/12", dict(al_iters=8, ilqr_iters=20,
                                        ilqr_iters_later=12, n_alpha=3,
                                        alpha_decay=0.35)),
        ("n_alpha=3 d.3 8x20/10", dict(al_iters=8, ilqr_iters=20,
                                       ilqr_iters_later=10, n_alpha=3,
                                       alpha_decay=0.3)),
    ]
    for name, kw in grid:
        cfg = dataclasses.replace(SOLVER_CFG, scan_unroll=10, **kw)
        dt, conv = time_cfg(mpc.ocp, x0_b, U0_b, params, cfg)
        print(f"{name:26s} {dt:8.1f} ms  conv {conv*100:5.1f}%", flush=True)

if __name__ == "__main__":
    main()
