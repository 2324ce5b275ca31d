from mmmpc_tpu.solver.al_ilqr import SolveResult, al_ilqr_solve, rollout  # noqa: F401
from mmmpc_tpu.solver.batched import al_ilqr_solve_batched  # noqa: F401
