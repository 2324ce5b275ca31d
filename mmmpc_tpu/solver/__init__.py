from mmmpc_tpu.solver.al_ilqr import (  # noqa: F401
    SolveResult, al_ilqr_solve, rollout, shift_multipliers,
)
from mmmpc_tpu.solver.batched import al_ilqr_solve_batched  # noqa: F401
from mmmpc_tpu.solver.refine import (  # noqa: F401
    al_ilqr_solve_refined, continue_mu, default_refine_config,
)
