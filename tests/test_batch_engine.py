"""Batched closed-loop scenario engine: many rollouts on device at once."""

import numpy as np
import jax.numpy as jnp

from mmmpc_tpu.controllers import MPCWholeBody
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.models.robots import MobileManipulator
from mmmpc_tpu.sim.batch_engine import make_batch_closed_loop
from mmmpc_tpu.utils.configs import SolverConfig


def test_batch_closed_loop_tracks_targets():
    N = 8
    cfg = SolverConfig(al_iters=3, ilqr_iters=8)
    mpc = MPCWholeBody(MobileManipulator(0.1), [Obstacles(5.0, 5.0, 0.3)],
                       [], N=N, solver_config=cfg)
    shared = mpc.make_params(np.zeros((N + 1, 9)), np.zeros((N, 5)))
    for k in ("X_ref", "U_ref"):
        shared.pop(k)

    B, T = 4, 55
    rng = np.random.default_rng(0)
    x0 = np.zeros(9)
    x0[6:] = [0, -1.0, 1.0]
    x0_b = jnp.asarray(np.tile(x0, (B, 1)))
    # each scenario drives to its own target
    targets = np.tile(x0, (B, 1))
    targets[:, 0] = 0.8 + 0.1 * rng.standard_normal(B).clip(-1, 1)
    targets[:, 1] = 0.2 * rng.standard_normal(B).clip(-1, 1)
    T_ref = 40
    traj_b = np.stack([np.linspace(x0, targets[i], T_ref + 1)
                       for i in range(B)])
    u_ref_b = np.zeros((B, T_ref, 5))

    run = make_batch_closed_loop(mpc.ocp, cfg, shared, [0, 1], n_ticks=T)
    log = run(x0_b, jnp.asarray(traj_b), jnp.asarray(u_ref_b))

    assert log.X.shape == (B, T + 1, 9)
    assert log.U.shape == (B, T, 5)
    assert not bool(jnp.any(log.fallback))
    # every scenario makes strong progress toward its own target (full
    # FSM-grade endpoint precision needs the approach/rotate phases, which
    # live in the host Interface; the engine is the raw tracking loop)
    init_dist = np.linalg.norm(np.asarray(x0_b[:, :2]) - targets[:, :2],
                               axis=1)
    final_err = np.linalg.norm(
        np.asarray(log.X[:, -1, :2]) - targets[:, :2], axis=1)
    assert np.all(final_err < 0.25), final_err
    assert np.all(final_err < 0.3 * init_dist), (final_err, init_dist)
    # costs are finite and violations controlled throughout
    assert np.all(np.isfinite(np.asarray(log.cost)))
    assert float(jnp.max(log.violation)) < 1e-3
