"""Two-stage straggler refinement (solver/refine.py).

Properties under test, on the cheap vmap-fallback path (tiny batch, N=5):
- the merge is violation-monotone: no scenario's violation ever increases;
- refining a deliberately under-budgeted stage 1 strictly improves the
  convergence count (this is the feature's reason to exist);
- ``continue_mu`` resumes the AL penalty schedule exactly where stage 1
  stopped (capped at mu_max);
- per-scenario (batch-minor) params entries are gathered consistently with
  the scenario gather.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmmpc_tpu.controllers import MPCWholeBody
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.models.robots import MobileManipulator
from mmmpc_tpu.solver import al_ilqr_solve_batched, al_ilqr_solve_refined
from mmmpc_tpu.solver.refine import continue_mu, default_refine_config
from mmmpc_tpu.utils.configs import SolverConfig


@pytest.fixture()
def problem():
    N = 5
    # deliberately under-budgeted: ONE AL round (multipliers never update
    # within stage 1) cannot meet the injected terminal position equality,
    # so stage 1 leaves real stragglers for stage 2.  The equality must be
    # FEASIBLE for the nonholonomic base, so the jitter is longitudinal
    # only (lateral motion needs yaw in this 0.5 s horizon).
    cfg = SolverConfig(al_iters=1, ilqr_iters=3, constraint_tol=5e-4)
    mpc = MPCWholeBody(MobileManipulator(0.1), [Obstacles(1.0, 0.2, 0.3)],
                       [], N=N, solver_config=cfg)
    rng = np.random.default_rng(11)
    B = 12
    x0 = np.zeros(9)
    x0[3] = 0.2
    x0[6:] = [-np.pi / 4, -np.pi / 2, np.pi / 2]
    x0_b = jnp.asarray(
        x0[None] + rng.standard_normal((B, 9))
        * np.array([0.02, 0, 0, 0.02, 0, 0, 0.005, 0.005, 0.005]))
    U0_b = jnp.zeros((B, N, 5))
    target = np.concatenate([[0.1, 0.0, 0, 0.2, 0, 0], x0[6:]])
    traj = jnp.asarray(np.linspace(x0, target, N + 1))
    params = dict(mpc.make_params(traj, np.zeros((N, 5))),
                  U_last=jnp.zeros((N, 5)), eq_mask=jnp.asarray(1.0))
    return mpc, cfg, x0_b, U0_b, params


def test_refine_monotone_and_improves(problem):
    mpc, cfg, x0_b, U0_b, params = problem
    res1 = al_ilqr_solve_batched(mpc.ocp, x0_b, U0_b, params, cfg)
    res2 = al_ilqr_solve_refined(mpc.ocp, x0_b, U0_b, params, cfg,
                                 refine_size=8)
    v1 = np.asarray(res1.max_violation)
    v2 = np.asarray(res2.max_violation)
    assert (v2 <= v1 + 1e-12).all(), "merge must be violation-monotone"
    # the under-budgeted stage 1 must leave work for stage 2 to do, and
    # stage 2 must do it
    assert v1.max() > cfg.constraint_tol
    assert int(res2.converged.sum()) > int(res1.converged.sum())
    # result contract: same shapes as the one-stage batched solve
    for a, b in zip(res1, res2):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_refine_noop_cases(problem):
    mpc, cfg, x0_b, U0_b, params = problem
    res1 = al_ilqr_solve_batched(mpc.ocp, x0_b, U0_b, params, cfg)
    # refine_size=0 and al_iters=0 refine configs are pass-throughs
    res_r0 = al_ilqr_solve_refined(mpc.ocp, x0_b, U0_b, params, cfg,
                                   refine_size=0)
    np.testing.assert_array_equal(np.asarray(res_r0.U), np.asarray(res1.U))
    rcfg = dataclasses.replace(default_refine_config(cfg), al_iters=0)
    res_a0 = al_ilqr_solve_refined(mpc.ocp, x0_b, U0_b, params, cfg,
                                   refine_cfg=rcfg)
    np.testing.assert_array_equal(np.asarray(res_a0.U), np.asarray(res1.U))


def test_continue_mu_resumes_schedule():
    cfg = SolverConfig(al_iters=3, mu_init=10.0, mu_scale=5.0, mu_max=1e6)
    rcfg = continue_mu(cfg, cfg.al_iters, al_iters=2)
    # mu_at(0) of the refine == mu_at(al_iters) of the base schedule
    assert rcfg.mu_init == pytest.approx(10.0 * 5.0 ** 3)
    # capped at mu_max
    rcfg2 = continue_mu(cfg, 20, al_iters=2)
    assert rcfg2.mu_init == pytest.approx(cfg.mu_max)
    # the rest of the config is inherited
    assert rcfg.mu_scale == cfg.mu_scale
    assert rcfg.constraint_tol == cfg.constraint_tol


def test_refine_gathers_per_scenario_params(problem):
    """U_last with a trailing batch axis must be gathered with its
    scenarios: refining a batch where each robot has its OWN input-rate
    anchor must equal a direct warm-started re-solve of the straggler
    subset (same scenarios, same anchors)."""
    mpc, cfg, x0_b, U0_b, params = problem
    B = x0_b.shape[0]
    rng = np.random.default_rng(3)
    U_last_b = jnp.asarray(
        0.05 * rng.standard_normal((mpc.N, 5, B)))     # batch-minor
    params_b = dict(params, U_last=U_last_b)
    res1 = al_ilqr_solve_batched(mpc.ocp, x0_b, U0_b, params_b, cfg)
    R = 4
    rcfg = default_refine_config(cfg)
    res2 = al_ilqr_solve_refined(mpc.ocp, x0_b, U0_b, params_b, cfg,
                                 refine_cfg=rcfg, refine_size=R)
    # reproduce stage 2 by hand
    idx = np.asarray(jax.lax.top_k(res1.max_violation, R)[1])
    params_r = dict(params_b, U_last=U_last_b[..., idx])
    res_hand = al_ilqr_solve_batched(
        mpc.ocp, x0_b[idx], res1.U[idx], params_r, rcfg,
        lam0_b=(res1.lam_stage[idx], res1.lam_term[idx], res1.lam_eq[idx]))
    better = (np.asarray(res_hand.max_violation)
              < np.asarray(res1.max_violation)[idx])
    expect_U = np.where(better[:, None, None], np.asarray(res_hand.U),
                        np.asarray(res1.U)[idx])
    np.testing.assert_allclose(np.asarray(res2.U)[idx], expect_U, atol=1e-12)
