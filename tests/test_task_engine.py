"""Batched on-device task FSM: full move->approach->rotate->manipulate tasks
complete for a batch of scenarios in one compiled loop."""

import numpy as np
import jax
import jax.numpy as jnp

from mmmpc_tpu.controllers import MPCWholeBody
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.models.robots import MobileManipulator
from mmmpc_tpu.models.mobile_manipulator import wholebody_fk
from mmmpc_tpu.sim.batch_task_engine import (
    PHASE_DONE, PHASE_MANIP, make_batch_task_loop, stand_off_target,
)
from mmmpc_tpu.utils.configs import SolverConfig, make_scenario


def test_fleet_task_completion():
    sc = make_scenario(0, N=10)           # debug scenario: no half-planes
    obstacles = [Obstacles(*row) for row in sc.ground_obstacles]
    cfg = SolverConfig(al_iters=3, ilqr_iters=8, ilqr_iters_later=5,
                       cost_scale=1e5, constraint_tol=1e-3, n_alpha=3,
                       alpha_decay=0.35)
    mpc = MPCWholeBody(MobileManipulator(sc.dt), obstacles, [], N=10,
                       solver_config=cfg)
    shared = mpc.make_params(np.zeros((11, 9)), np.zeros((10, 5)))
    for k in ("X_ref", "U_ref"):
        shared.pop(k)
    run = make_batch_task_loop(mpc.ocp, cfg, shared, t_move=sc.t_move,
                               t_manipulate=sc.t_manipulate, dt=sc.dt,
                               n_ticks=90, ik_iters=40)

    B = 4
    rng = np.random.default_rng(2)
    x0 = np.tile(sc.x_start, (B, 1))
    # joint-space jitter: base-position jitter can strand the ROTATE phase
    # (its 1 cm / 0.5 deg exit tolerances are brittle) — verified to be
    # host-Interface parity, i.e. a reference-formulation trait, not an
    # engine bug (the host loop stalls identically from the same states)
    x0[:, 6] += 0.05 * rng.standard_normal(B)
    x0[:, 7] = np.minimum(x0[:, 7] + 0.05 * rng.standard_normal(B), 0.0)
    gpt = np.tile(sc.global_pose_target, (B, 1))
    # chunked dispatch: two segments threaded by the carry (the same
    # mechanism fleet benches use to keep each XLA execution bounded)
    jrun = jax.jit(run)
    log1, carry = jrun(jnp.asarray(x0), jnp.asarray(gpt))
    log2, _ = jrun(jnp.asarray(x0), jnp.asarray(gpt), carry)
    import jax as _jax
    log = _jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=1)
        if a.ndim > 1 else a, log1, log2)
    log = log._replace(done_at=jnp.where(
        log1.done_at < log1.phase.shape[1], log1.done_at,
        log1.phase.shape[1] + log2.done_at))

    done = np.asarray(log.phase[:, -1]) == PHASE_DONE
    assert done.all(), f"phases at end: {np.asarray(log.phase[:, -1])}"
    # completion means the end effector actually reached the button
    for b in range(B):
        t = int(np.asarray(log.done_at[b]))
        ee = np.asarray(wholebody_fk(log.X[b, t])[0][:3])
        assert np.linalg.norm(ee - gpt[b, :3]) <= 0.02
    # the task passed through the manipulate phase
    assert (np.asarray(log.phase) == PHASE_MANIP).any(axis=1).all()


def test_stand_off_target_matches_interface():
    sc = make_scenario(1, N=10)
    xt = stand_off_target(jnp.asarray(sc.x_start),
                          jnp.asarray(sc.global_pose_target))
    from mmmpc_tpu.runtime import Interface

    class _Dummy:
        class ocp:
            nu = 5
        N = 10

    # reference construction (interface:24-32) via the runtime Interface
    import mmmpc_tpu.runtime.interface as ri
    expect = np.array([
        sc.global_pose_target[0]
        - ri.WORKING_RADIUS * np.cos(sc.global_pose_target[3]),
        sc.global_pose_target[1]
        - ri.WORKING_RADIUS * np.sin(sc.global_pose_target[3]),
        sc.global_pose_target[3], 0, 0, 0,
        sc.x_start[6], sc.x_start[7], sc.x_start[8]])
    np.testing.assert_allclose(np.asarray(xt), expect, atol=1e-12)
