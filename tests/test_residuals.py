"""Gauss-Newton residual factorizations must reproduce the costs exactly:
stage_cost == ||stage_residuals||^2 for every controller, at random states,
inputs and stages — otherwise the GN solver would optimize a different
objective than the one reported/verified."""

import numpy as np
import jax.numpy as jnp

from mmmpc_tpu.controllers import (
    MPC, MPCBase, MPCManipulator3DoF, MPCWholeBody, MPCWholeBodyEndpoint,
)
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.models.robots import (
    Base, ManipulatorPanda3DoF, MobileManipulator, RobotDemo,
)
from mmmpc_tpu.utils.configs import make_scenario

RNG = np.random.default_rng(11)


def check_consistency(mpc, nx, nu, n_cases=10, ref_width=None):
    N = mpc.N
    traj = RNG.normal(size=(N + 1, ref_width or nx)) * 0.5
    u_ref = RNG.normal(size=(N, nu)) * 0.2
    params = dict(mpc.make_params(traj, u_ref),
                  U_last=jnp.asarray(RNG.normal(size=(N, nu)) * 0.1))
    for _ in range(n_cases):
        x = jnp.asarray(RNG.normal(size=nx))
        u = jnp.asarray(RNG.normal(size=nu) * 0.5)
        k = int(RNG.integers(0, N))
        c = float(mpc.ocp.stage_cost(x, u, k, params))
        r = mpc.ocp.stage_residuals(x, u, k, params)
        np.testing.assert_allclose(float(jnp.sum(r * r)), c,
                                   rtol=1e-10, atol=1e-10)
        ct = float(mpc.ocp.terminal_cost(x, params))
        rt = mpc.ocp.terminal_residuals(x, params)
        np.testing.assert_allclose(float(jnp.sum(rt * rt)), ct,
                                   rtol=1e-10, atol=1e-10)


def test_demo_residuals():
    check_consistency(MPC(RobotDemo(0.1), N=6), 2, 1)


def test_base_residuals():
    check_consistency(
        MPCBase(Base(0.1), [Obstacles(0.5, 0.2, 0.3)], N=6), 6, 2)


def test_manipulator_residuals():
    normals = [np.array([[0.0, 0, 1.0]]), np.array([[1.0, 0, 0.0]])]
    point = np.array([0.3, 0, 0.4])
    check_consistency(
        MPCManipulator3DoF(ManipulatorPanda3DoF(0.1), normals, point, N=6),
        3, 3)


def test_wholebody_qref_residuals():
    sc = make_scenario(1, N=6)
    hp = [(sc.hp_points[j], sc.hp_normals[j][None, :]) for j in range(3)]
    obs = [Obstacles(*row) for row in sc.ground_obstacles]
    check_consistency(
        MPCWholeBody(MobileManipulator(0.1), obs, hp, N=6), 9, 5)


def test_wholebody_qref_residuals_bugfix_mode():
    obs = [Obstacles(1.0, 0.3, 0.4)]
    check_consistency(
        MPCWholeBody(MobileManipulator(0.1), obs, [], N=6,
                     replicate_terminal_selfcol_bug=False), 9, 5)


def test_wholebody_endpoint_residuals():
    obs = [Obstacles(1.0, 0.3, 0.4)]
    check_consistency(
        MPCWholeBodyEndpoint(MobileManipulator(0.1), obs, N=6), 9, 5,
        ref_width=4)
