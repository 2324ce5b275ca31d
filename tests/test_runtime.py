"""Closed-loop runtime tests: FSM, planners, local references, sim plant.

The reference's only integration 'test' was running scenario 0 by hand
(SURVEY.md §4).  Here it is automated: the full move -> approach -> rotate ->
manipulate pipeline must finish with the end effector on the button, both
with the model-only plant and with the kinematic simulator."""

import numpy as np
import pytest

from demo_wholebody_qref import build_world
from mmmpc_tpu.runtime.reference import (
    local_ref_pose, local_ref_traj, nearest_index,
)
from mmmpc_tpu.sim.kinematic_plant import (
    KinematicPlant, run_step, setup_environment,
)
from mmmpc_tpu.utils.math import angle_diff


# ------------------------------------------------------------ local refs


def test_nearest_index_and_window():
    traj = np.stack([np.linspace(0, 10, 21), np.zeros(21)], axis=1)
    u = np.zeros((20, 1))
    cur = np.array([3.2, 0.0])
    i = nearest_index(traj, cur, np.array([0]))
    assert i == 6  # 3.2 / 0.5 per step
    local, local_u = local_ref_traj(traj, u, cur, [0], N=5)
    assert local.shape == (6, 2)
    assert local_u.shape == (5, 1)
    np.testing.assert_allclose(local[0, 0], 3.0)


def test_local_ref_window_pads_past_end():
    traj = np.stack([np.linspace(0, 10, 21), np.zeros(21)], axis=1)
    u = np.zeros((20, 1))
    cur = np.array([9.9, 0.0])
    local, local_u = local_ref_traj(traj, u, cur, [0], N=8)
    assert local.shape == (9, 2)
    # repeats the last reference point (reference interface:385-389)
    np.testing.assert_allclose(local[-1], traj[-1])
    np.testing.assert_allclose(local[-3], traj[-1])


def test_local_ref_pose_wraps_yaw():
    traj = np.zeros((5, 9))
    traj[:, 2] = -np.pi + 0.01          # reference yaw near -pi
    u = np.zeros((4, 5))
    current_psi = np.pi - 0.01          # current yaw near +pi
    local, _ = local_ref_pose(traj, u, current_psi, N=4,
                              angle_diff=angle_diff)
    # continuous reference: just 0.02 rad beyond current, not -2pi around
    assert abs(local[0, 2] - (np.pi + 0.01)) < 1e-9


# ------------------------------------------------------------ sim plant


def test_plant_observation_roundtrip():
    """observationCallback(sim conventions) must exactly invert the plant's
    sign/offset conventions."""
    init = np.array([1.0, 2.0, 0.5, np.pi, 0, 0, 0, 0, 0, 0, 0, 0])
    env, ob = setup_environment(initial_state=init, dt=0.01)
    d = ob[0]["robot_0"]["joint_state"]
    np.testing.assert_allclose(d["position"][:3], [1.0, 2.0, 0.5])
    # drive forward: commanded v positive => plant moves along -heading,
    # observed negated velocity is +forward again
    action = np.zeros(env.n())
    action[0] = 1.0
    ob2 = run_step(env, action)
    vel = ob2["robot_0"]["joint_state"]["velocity"]
    np.testing.assert_allclose(-vel[0], -1.0 * np.cos(0.5), atol=1e-12)
    np.testing.assert_allclose(-vel[1], -1.0 * np.sin(0.5), atol=1e-12)


def test_plant_joint_integration():
    env = KinematicPlant(np.zeros(12), 0.01)
    action = np.zeros(11)
    action[3] = 0.7  # dq1 (action index 3 -> state index 4)
    for _ in range(100):
        ob = env.step(action)
    q1 = ob["robot_0"]["joint_state"]["position"][4]
    np.testing.assert_allclose(q1, 0.7, atol=1e-9)


# --------------------------------------------------------- closed loop


@pytest.mark.slow
def test_scenario0_model_only_completes():
    world = build_world(0, N=20, physical_sim=False)
    world.run()
    assert world.task_flag == "manipulate finish"
    pose = world.manipulator_pose_log[-1]
    err = np.linalg.norm(pose[:3] - world.global_pose_target[:3])
    assert err <= 0.01 + 1e-6
    summary = world.metrics.summary()
    assert summary["all_converged"]
    assert summary["max_violation"] < 1e-4
    # phases actually traversed (scenario 0's base target coincides with the
    # start — the stand-off cancels the -0.6 m — so 'move' is skipped and the
    # FSM goes straight to 'rotate', as in the reference)
    flags = {r.task_flag for r in world.metrics.records}
    assert {"rotate", "manipulate"} <= flags


@pytest.mark.slow
def test_scenario0_physical_sim_completes():
    """Same scenario through the kinematic plant: observation processing,
    command integration, 10:1 sim/control timing."""
    world = build_world(0, N=20, physical_sim=True)
    world.run()
    assert world.task_flag == "manipulate finish"
    pose = world.manipulator_pose_log[-1]
    err = np.linalg.norm(pose[:3] - world.global_pose_target[:3])
    assert err <= 0.01 + 1e-6


@pytest.mark.slow
def test_scenario1_model_only_completes():
    """The full scenario-1 task (table-corner half-planes, button cylinder
    under the parked base): move -> approach -> rotate -> manipulate must
    finish with the end effector on the button.  Note: while 'approach' is
    active the FSM-injected terminal position equality can be dynamically
    unreachable for a few ticks; the AL solver tracks it softly (the
    reference's IPOPT would error out and then crash in its except path,
    mpc_wholebody_qref.py:318-329) — so per-tick convergence flags are
    allowed to dip, task completion is the contract."""
    world = build_world(1, N=20, physical_sim=False)
    world.run()
    assert world.task_flag == "manipulate finish"
    pose = world.manipulator_pose_log[-1]
    err = np.linalg.norm(pose[:3] - world.global_pose_target[:3])
    assert err <= 0.01 + 1e-6
    flags = {r.task_flag for r in world.metrics.records}
    assert {"move", "manipulate"} <= flags


@pytest.mark.slow
def test_scenario2_model_only_completes():
    """Scenario 2 (wedge obstacle over the path) must also complete."""
    world = build_world(2, N=20, physical_sim=False)
    world.run()
    assert world.task_flag == "manipulate finish"
    pose = world.manipulator_pose_log[-1]
    err = np.linalg.norm(pose[:3] - world.global_pose_target[:3])
    assert err <= 0.01 + 1e-6
