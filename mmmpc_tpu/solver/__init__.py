from mmmpc_tpu.solver.al_ilqr import SolveResult, al_ilqr_solve, rollout  # noqa: F401
