"""Hand-assembled derivative path must match AD to machine precision, and
solver results must be identical across derivative paths."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mmmpc_tpu.controllers import MPCWholeBody
from mmmpc_tpu.models.mobile_manipulator import (
    wholebody_jacobians, wholebody_step,
)
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.models.robots import MobileManipulator
from mmmpc_tpu.solver import al_ilqr_solve
from mmmpc_tpu.utils.configs import SolverConfig, make_scenario

RNG = np.random.default_rng(5)


def test_wholebody_jacobians_match_ad():
    for _ in range(10):
        x = jnp.asarray(RNG.normal(size=9))
        u = jnp.asarray(RNG.normal(size=5))
        A, B = wholebody_jacobians(x, u, 0.1)
        A_ad = jax.jacfwd(lambda xx: wholebody_step(xx, u, 0.1))(x)
        B_ad = jax.jacfwd(lambda uu: wholebody_step(x, uu, 0.1))(u)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ad), atol=1e-14)
        np.testing.assert_allclose(np.asarray(B), np.asarray(B_ad), atol=1e-14)


def _qref_problem(N=6):
    sc = make_scenario(1, N=N)
    hp = [(sc.hp_points[j], sc.hp_normals[j][None, :]) for j in range(3)]
    obs = [Obstacles(*row) for row in sc.ground_obstacles]
    mpc = MPCWholeBody(MobileManipulator(0.1), obs, hp, N=N,
                       solver_config=SolverConfig(al_iters=4, ilqr_iters=6))
    x0 = np.array([4.45, 5.06, -np.pi, 0, 0, 0, -np.pi / 4, -np.pi, np.pi])
    traj = np.linspace(
        x0, np.concatenate([x0[:6], [0.3, -1.0, 1.0]]), N + 1)
    params = dict(mpc.make_params(traj, np.zeros((N, 5))),
                  U_last=jnp.asarray(RNG.normal(size=(N, 5)) * 0.1))
    return mpc, jnp.asarray(x0), params


def test_stage_gn_matches_jacfwd():
    mpc, x0, params = _qref_problem()
    for _ in range(5):
        x = x0 + jnp.asarray(RNG.normal(size=9) * 0.1)
        u = jnp.asarray(RNG.normal(size=5) * 0.3)
        k = int(RNG.integers(0, mpc.N))
        r, J = mpc.ocp.stage_gn(x, u, k, params)
        r_ref = mpc.ocp.stage_residuals(x, u, k, params)
        J_ref = jax.jacfwd(
            lambda z: mpc.ocp.stage_residuals(z[:9], z[9:], k, params))(
                jnp.concatenate([x, u]))
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                                   atol=1e-12)

        rt, Jt = mpc.ocp.terminal_gn(x, params)
        rt_ref = mpc.ocp.terminal_residuals(x, params)
        Jt_ref = jax.jacfwd(
            lambda xx: mpc.ocp.terminal_residuals(xx, params))(x)
        np.testing.assert_allclose(np.asarray(rt), np.asarray(rt_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(Jt), np.asarray(Jt_ref),
                                   atol=1e-12)

        c, Jc = mpc.ocp.stage_ineq_jac(x, u, k, params)
        Jc_ref = jax.jacfwd(
            lambda z: mpc.ocp.stage_ineq(z[:9], z[9:], k, params))(
                jnp.concatenate([x, u]))
        np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_ref),
                                   atol=1e-12)

        h, Jh = mpc.ocp.terminal_eq_jac(x, params)
        Jh_ref = jax.jacfwd(lambda xx: mpc.ocp.terminal_eq(xx, params))(x)
        np.testing.assert_allclose(np.asarray(Jh), np.asarray(Jh_ref),
                                   atol=1e-12)


def test_solver_paths_agree():
    """hand-Jacobian, jacfwd-GN and exact-Hessian paths must land on the
    same solution (same merit landscape, different expansions)."""
    mpc, x0, params = _qref_problem()
    U0 = jnp.zeros((mpc.N, 5))
    cfg = SolverConfig(al_iters=6, ilqr_iters=12)

    res_hand = al_ilqr_solve(mpc.ocp, x0, U0, params, cfg)

    ocp_gn = dataclasses.replace(
        mpc.ocp, stage_gn=None, terminal_gn=None, dynamics_jacobians=None)
    res_gn = al_ilqr_solve(ocp_gn, x0, U0, params, cfg)

    np.testing.assert_allclose(np.asarray(res_hand.U), np.asarray(res_gn.U),
                               atol=1e-6)
    np.testing.assert_allclose(float(res_hand.cost), float(res_gn.cost),
                               rtol=1e-8)


def _al_expansion_ad_reference(ocp, x, u, k, params, lam_k, mu):
    """Gradient + GN Hessian of the scaled AL stage cost built purely with
    AD from the OCP's residual/constraint functions (the stage_derivs_gn
    construction) — the oracle for every structured stage_al_expansion."""
    nx = ocp.nx
    z = jnp.concatenate([x, u])

    def rz(zz):
        return ocp.stage_residuals(zz[:nx], zz[nx:], k, params)

    r = rz(z)
    J = jax.jacfwd(rz)(z)
    c = ocp.stage_ineq(x, u, k, params)
    Jc = jax.jacfwd(lambda zz: ocp.stage_ineq(zz[:nx], zz[nx:], k, params))(z)
    t = jnp.maximum(0.0, lam_k + mu * c)
    act = (t > 0).astype(x.dtype)
    g = 2.0 * (J.T @ r) + Jc.T @ t
    H = 2.0 * (J.T @ J) + mu * (Jc.T * act[None, :]) @ Jc
    return g, H


def _terminal_al_expansion_ad_reference(ocp, x, params, lam_t, lam_e, mu):
    r = ocp.terminal_residuals(x, params)
    J = jax.jacfwd(lambda xx: ocp.terminal_residuals(xx, params))(x)
    c = ocp.terminal_ineq(x, params)
    Jc = jax.jacfwd(lambda xx: ocp.terminal_ineq(xx, params))(x)
    t = jnp.maximum(0.0, lam_t + mu * c)
    act = (t > 0).astype(x.dtype)
    g = 2.0 * (J.T @ r) + Jc.T @ t
    H = 2.0 * (J.T @ J) + mu * (Jc.T * act[None, :]) @ Jc
    ne = lam_e.shape[0]
    if ne:
        h = ocp.terminal_eq(x, params)
        Jh = jax.jacfwd(lambda xx: ocp.terminal_eq(xx, params))(x)
        g = g + Jh.T @ (lam_e + mu * h)
        H = H + mu * (Jh.T @ Jh)
    return g, H


def _generic_problems():
    """(name, mpc, x0, params) for every controller with a structured AL
    expansion but no hand residual-Jacobian path."""
    import mmmpc_tpu.controllers as C
    from mmmpc_tpu.models.obstacles import Obstacles
    from mmmpc_tpu.models.robots import Base, ManipulatorPanda3DoF, RobotDemo

    N = 6
    rng = np.random.default_rng(11)
    out = []

    mpc = C.MPC(RobotDemo(0.1), N=N)
    traj = np.stack([np.linspace(0, 1, N + 1), np.zeros(N + 1)], axis=1)
    p = dict(mpc.make_params(traj, np.zeros((N, 1))),
             U_last=jnp.zeros((N, 1)))
    out.append(("demo", mpc, np.array([0.0, 0.9]), p))

    mpc = C.MPCBase(Base(0.1), [Obstacles(1.2, 0.1, 0.3)], N=N)
    traj = np.linspace(np.zeros(6), np.array([2.5, 0, 0.4, 0, 0, 0]), N + 1)
    p = dict(mpc.make_params(traj, np.zeros((N, 2))),
             U_last=jnp.zeros((N, 2)))
    out.append(("base", mpc, np.array([1.0, 0.2, 0.3, 1.9, 0.1, 0.2]), p))

    sc = make_scenario(2, N=N)
    for cartesian in (False, True):
        mpc = C.MPCManipulator3DoF(
            ManipulatorPanda3DoF(0.1), list(sc.hp_normals),
            sc.hp_points[0], N=N, is_cartesian_ref=cartesian)
        nref = 3
        traj = np.linspace([0.1, -0.5, 0.6][:nref],
                           [0.4, -1.2, 1.1][:nref], N + 1)
        p = dict(mpc.make_params(traj, np.zeros((N, 3))),
                 U_last=jnp.asarray(RNG.normal(size=(N, 3)) * 0.1))
        out.append((f"arm_cart{cartesian}", mpc,
                    np.array([0.2, -0.8, 0.9]), p))

    robot = MobileManipulator(0.1)
    obs = [Obstacles(2.5, 3.0, 0.6), Obstacles(2.5, 1.0, 0.6)]
    mpc = C.MPCWholeBodyEndpoint(robot, obs, N=N)
    traj = np.linspace([1.0, 1.0, 1.2, 0.0], [2.0, 2.0, 1.0, 0.5], N + 1)
    p = dict(mpc.make_params(traj, np.zeros((N, 5))),
             U_last=jnp.asarray(rng.normal(size=(N, 5)) * 0.1))
    x0 = np.array([1.0, 1.2, 0.4, 0.5, 0.1, 0.1,
                   -np.pi / 4, -np.pi / 2, np.pi / 2])
    out.append(("endpoint", mpc, x0, p))
    return out


def test_generic_al_expansions_match_ad():
    """Every generic controller's structured AL expansion must equal the
    AD-built Gauss-Newton expansion of the same AL stage cost, and its
    closed-form dynamics Jacobians must match jacfwd."""
    mu = 35.0
    rng = np.random.default_rng(3)
    for name, mpc, x0, params in _generic_problems():
        ocp = mpc.ocp
        from mmmpc_tpu.controllers.common import constraint_dims
        nc, nct, ne = constraint_dims(ocp, params, jnp.float64)
        for trial in range(3):
            x = jnp.asarray(x0 + rng.normal(size=ocp.nx) * 0.05)
            u = jnp.asarray(rng.normal(size=ocp.nu) * 0.3)
            k = int(rng.integers(0, ocp.N))
            lam_k = jnp.asarray(np.abs(rng.normal(size=nc)) * 2.0)

            g_ref, H_ref = _al_expansion_ad_reference(
                ocp, x, u, k, params, lam_k, mu)
            lx, lu, lxx, luu, lux = ocp.stage_al_expansion(
                x, u, k, params, lam_k, mu, 1.0)
            nx = ocp.nx
            err = f"{name} stage trial {trial}"
            np.testing.assert_allclose(np.asarray(lx), np.asarray(g_ref[:nx]),
                                       rtol=1e-8, atol=1e-8, err_msg=err)
            np.testing.assert_allclose(np.asarray(lu), np.asarray(g_ref[nx:]),
                                       rtol=1e-8, atol=1e-8, err_msg=err)
            np.testing.assert_allclose(
                np.asarray(lxx), np.asarray(H_ref[:nx, :nx]),
                rtol=1e-8, atol=1e-8, err_msg=err)
            np.testing.assert_allclose(
                np.asarray(luu), np.asarray(H_ref[nx:, nx:]),
                rtol=1e-8, atol=1e-8, err_msg=err)
            np.testing.assert_allclose(
                np.asarray(lux), np.asarray(H_ref[nx:, :nx]),
                rtol=1e-8, atol=1e-8, err_msg=err)

            lam_t = jnp.asarray(np.abs(rng.normal(size=nct)) * 2.0)
            lam_e = jnp.asarray(rng.normal(size=ne))
            g_ref, H_ref = _terminal_al_expansion_ad_reference(
                ocp, x, params, lam_t, lam_e, mu)
            gx, Hxx = ocp.terminal_al_expansion(x, params, lam_t, lam_e,
                                                mu, 1.0)
            err = f"{name} terminal trial {trial}"
            np.testing.assert_allclose(np.asarray(gx), np.asarray(g_ref),
                                       rtol=1e-8, atol=1e-8, err_msg=err)
            np.testing.assert_allclose(np.asarray(Hxx), np.asarray(H_ref),
                                       rtol=1e-8, atol=1e-8, err_msg=err)

            A, B = ocp.dynamics_jacobians(x, u)
            A_ad = jax.jacfwd(lambda xx: ocp.dynamics(xx, u))(x)
            B_ad = jax.jacfwd(lambda uu: ocp.dynamics(x, uu))(u)
            np.testing.assert_allclose(np.asarray(A), np.asarray(A_ad),
                                       atol=1e-12, err_msg=name)
            np.testing.assert_allclose(np.asarray(B), np.asarray(B_ad),
                                       atol=1e-12, err_msg=name)


def test_al_expansion_matches_hand_path():
    """The fully-structured AL expansion must equal the residual-Jacobian
    hand path (same gradient and GN Hessian blocks)."""
    mpc, x0, params = _qref_problem()
    mpc.add_terminal_position_constraint()
    params = dict(mpc.make_params(
        np.asarray(params["X_ref"]), np.asarray(params["U_ref"])),
        U_last=params["U_last"])
    ocp = mpc.ocp
    inv_scale = 1.0
    mu = 25.0
    rng = np.random.default_rng(17)
    for _ in range(5):
        x = x0 + jnp.asarray(rng.normal(size=9) * 0.1)
        u = jnp.asarray(rng.normal(size=5) * 0.3)
        k = int(rng.integers(0, mpc.N))
        lam_k = jnp.asarray(np.abs(rng.normal(size=28)) * 3.0)

        # reference: residual-Jacobian path
        r, J = ocp.stage_gn(x, u, k, params)
        c, Jc = ocp.stage_ineq_jac(x, u, k, params)
        t = lam_k / mu + c
        w = np.sqrt(mu / 2)
        r_full = jnp.concatenate([r, w * jnp.maximum(0.0, t)])
        J_full = jnp.concatenate(
            [J, w * jnp.where((t > 0)[:, None], Jc, 0.0)], axis=0)
        g_ref = 2.0 * (J_full.T @ r_full)
        H_ref = 2.0 * (J_full.T @ J_full)

        lx, lu, lxx, luu, lux = ocp.stage_al_expansion(
            x, u, k, params, lam_k, mu, inv_scale)
        np.testing.assert_allclose(np.asarray(lx), np.asarray(g_ref[:9]),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(lu), np.asarray(g_ref[9:]),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(lxx), np.asarray(H_ref[:9, :9]),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(luu), np.asarray(H_ref[9:, 9:]),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(lux), np.asarray(H_ref[9:, :9]),
                                   rtol=1e-9, atol=1e-9)

        # terminal
        lam_t = jnp.asarray(np.abs(rng.normal(size=18)) * 3.0)
        lam_e = jnp.asarray(rng.normal(size=2))
        rt, Jt = ocp.terminal_gn(x, params)
        ct, Jct = ocp.terminal_ineq_jac(x, params)
        h, Jh = ocp.terminal_eq_jac(x, params)
        tt = lam_t / mu + ct
        r_full = jnp.concatenate([rt, w * jnp.maximum(0.0, tt),
                                  w * (h + lam_e / mu)])
        J_full = jnp.concatenate(
            [Jt, w * jnp.where((tt > 0)[:, None], Jct, 0.0), w * Jh], axis=0)
        g_ref = 2.0 * (J_full.T @ r_full)
        H_ref = 2.0 * (J_full.T @ J_full)
        gx, Hxx = ocp.terminal_al_expansion(x, params, lam_t, lam_e, mu,
                                            inv_scale)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(g_ref),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(Hxx), np.asarray(H_ref),
                                   rtol=1e-9, atol=1e-9)


def test_ee_jacobian_matches_ad():
    from mmmpc_tpu.models.arm import arm_fk, ee_jacobian
    for _ in range(10):
        q = jnp.asarray(RNG.uniform(-np.pi, np.pi, size=3))
        J = ee_jacobian(q)
        J_ad = jax.jacfwd(lambda qq: arm_fk(qq)[0])(q)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad),
                                   atol=1e-13)


def test_wholebody_pose_jacobian_matches_ad():
    from mmmpc_tpu.models.mobile_manipulator import (
        wholebody_fk, wholebody_pose_jacobian,
    )
    for _ in range(10):
        x = jnp.asarray(RNG.normal(size=9))
        J = wholebody_pose_jacobian(x)
        J_ad = jax.jacfwd(lambda xx: wholebody_fk(xx)[0])(x)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad),
                                   atol=1e-13)
