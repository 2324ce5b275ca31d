"""Parity of the fused AL-expansion + Riccati backward kernel
(ops/wholebody_bwd.py) against the vmapped-AD expansion + batch-minor
Riccati kernel — i.e. the hand-derived FK/constraint gradients vs jax AD.

Interpreter mode on CPU, float32.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mmmpc_tpu.ops.riccati as ric
import mmmpc_tpu.ops.wholebody_bwd as bwd_mod
import mmmpc_tpu.ops.wholebody_fwd as fwd_mod
import mmmpc_tpu.solver.batched as batched_mod
from mmmpc_tpu.controllers import MPCWholeBody
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.models.robots import MobileManipulator
from mmmpc_tpu.solver import al_ilqr_solve_batched
from mmmpc_tpu.solver.al_ilqr import build_core, rollout
from mmmpc_tpu.ops.riccati import riccati_backward_bm
from mmmpc_tpu.utils.configs import SolverConfig

B, N = 1024, 5
F32 = jnp.float32


def make_problem(eq_mask=0.0):
    cfg = SolverConfig(al_iters=2, ilqr_iters=4, n_alpha=3, alpha_decay=0.4,
                       cost_scale=1e5, scan_unroll=5)
    mpc = MPCWholeBody(
        MobileManipulator(0.1), [Obstacles(1.0, 0.2, 0.3)],
        [(np.array([0.8, 0.1, 1.0]), np.array([[1.0, 0.0, 0.0]]))],
        N=N, solver_config=cfg)
    if eq_mask:
        mpc.add_terminal_position_constraint()
    rng = np.random.default_rng(7)
    x0 = np.zeros(9)
    x0[6:] = [-np.pi / 4, -np.pi / 2, np.pi / 2]
    x0_b = jnp.asarray(
        x0[None] + 0.02 * rng.standard_normal((B, 9))
        * np.array([1, 1, 0.2, 0, 0, 0, 0.1, 0.1, 0.1]), F32)
    U0_b = jnp.asarray(0.1 * rng.standard_normal((B, N, 5)), F32)
    target = np.concatenate([[0.5, 0.1, 0, 0, 0, 0], x0[6:]])
    traj = jnp.asarray(np.linspace(x0, target, N + 1), F32)
    params = dict(mpc.make_params(traj, np.zeros((N, 5))),
                  U_last=jnp.zeros((N, 5), F32))
    params = jax.tree.map(lambda a: jnp.asarray(a, F32), params)
    return mpc, cfg, x0_b, U0_b, params


@pytest.mark.parametrize("eq_mask", [0.0, 1.0])
def test_fused_bwd_matches_ad_path(eq_mask, monkeypatch):
    mpc, cfg, x0_b, U0_b, params = make_problem(eq_mask)
    monkeypatch.setattr(bwd_mod, "INTERPRET", True)
    monkeypatch.setattr(ric, "INTERPRET", True)
    ocp = mpc.ocp
    core = build_core(ocp, params, cfg, F32)
    rng = np.random.default_rng(3)

    X_b, Uc_b = jax.vmap(lambda x0, U: rollout(ocp, x0, U, params))(
        x0_b, U0_b)
    lam = jnp.asarray(0.5 * np.abs(rng.standard_normal((B, N, core.nc))),
                      F32)
    lam_t = jnp.asarray(0.5 * np.abs(rng.standard_normal((B, core.nct))),
                        F32)
    lam_e = jnp.asarray(0.1 * rng.standard_normal((B, core.ne)), F32)
    mu = jnp.asarray(10.0, F32)
    reg = jnp.full((B,), 1e-6, F32)

    # reference: vmapped AD expansion + batch-minor Riccati kernel
    X_bm = jnp.transpose(X_b, (1, 2, 0))
    U_bm = jnp.transpose(Uc_b, (1, 2, 0))
    lam_bm = jnp.transpose(lam, (1, 2, 0))
    derivs_bm = jax.vmap(
        jax.vmap(core.stage_derivs, in_axes=(0, 0, 0, 0, None)),
        in_axes=(-1, -1, None, -1, None), out_axes=-1)
    term_derivs_bm = jax.vmap(core.terminal_derivs,
                              in_axes=(-1, -1, -1, None), out_axes=-1)
    derivs = derivs_bm(X_bm[:-1], U_bm, core.ks, lam_bm, mu)
    tg, tH = term_derivs_bm(X_bm[-1], lam_t.T, lam_e.T, mu)
    kff_ref, K_ref = riccati_backward_bm(*derivs, tg, tH, reg)

    # fused kernel
    bwd = ocp.lanes_bwd_factory(cfg)
    kff, K = bwd(X_bm, U_bm, lam_bm, lam_t.T, lam_e.T, mu, reg, params)

    # f32 op-order differences amplified through the Cholesky show up at
    # ~5e-3 absolute on gain entries of magnitude ~10 when the stiff
    # (mu-weighted) terminal equality is active
    np.testing.assert_allclose(np.asarray(kff), np.asarray(kff_ref),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                               rtol=5e-3, atol=5e-3)


def test_fused_solve_matches_unfused(monkeypatch):
    """Full lanes solve with and without the fused backward."""
    mpc, cfg, x0_b, U0_b, params = make_problem()
    monkeypatch.setattr(bwd_mod, "INTERPRET", True)
    monkeypatch.setattr(fwd_mod, "INTERPRET", True)
    monkeypatch.setattr(ric, "INTERPRET", True)
    monkeypatch.setattr(batched_mod.jax, "default_backend", lambda: "tpu")

    res_fused = al_ilqr_solve_batched(mpc.ocp, x0_b, U0_b, params, cfg)
    cfg_un = dataclasses.replace(cfg, use_fused_backward=False)
    res_un = al_ilqr_solve_batched(mpc.ocp, x0_b, U0_b, params, cfg_un)

    S = 64
    np.testing.assert_allclose(np.asarray(res_fused.U[:S]),
                               np.asarray(res_un.U[:S]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(res_fused.cost[:S]),
                               np.asarray(res_un.cost[:S]), rtol=5e-3)
