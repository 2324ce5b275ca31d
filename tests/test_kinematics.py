"""Golden-value tests: models vs independent sympy DH derivation + numpy.

The reference has no automated tests (SURVEY.md §4); its FK was validated by
a commented-out spot check (manipulator_3DoF.py:207-224).  Here every model
function is checked against an independent oracle:
- arm FK vs the sympy classical-DH chain (utils/dh_codegen.py),
- the reference's known spot-check value,
- dynamics vs a plain-numpy reimplementation of the reference formulas,
- the analytic-free Jacobian vs sympy's geometric Jacobian,
- IK round-trips FK within tolerance and respects bounds.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import sympy as sp

from mmmpc_tpu.models import (
    arm_fk, arm_ik, arm_step, base_step, ee_jacobian, wholebody_fk,
    wholebody_step, point_mass_step,
)
from mmmpc_tpu.models.arm import ARM_IK_LOWER, ARM_IK_UPPER, ee_velocity
from mmmpc_tpu.utils.configs import BASELINK2JOINT1_X, BASELINK2JOINT1_Z
from mmmpc_tpu.utils.dh_codegen import geometric_jacobian, panda3dof_dh_table, panda3dof_positions
from mmmpc_tpu.utils.math import angle_diff, wrap_to_pi

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def dh_oracle():
    (q1, q2, q3), p2, p3, pe = panda3dof_positions()
    f2 = sp.lambdify((q1, q2, q3), p2, "numpy")
    f3 = sp.lambdify((q1, q2, q3), p3, "numpy")
    fe = sp.lambdify((q1, q2, q3), pe, "numpy")
    return f2, f3, fe


def random_q(n):
    lo = np.array([-np.pi / 2, -np.pi, 0.0])
    hi = np.array([np.pi / 2, 0.0, 1.5 * np.pi])
    return RNG.uniform(lo, hi, size=(n, 3))


def test_arm_fk_matches_dh_oracle(dh_oracle):
    f2, f3, fe = dh_oracle
    for q in random_q(50):
        ee, j2, j3 = arm_fk(jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(j2), np.asarray(f2(*q)).ravel(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(j3), np.asarray(f3(*q)).ravel(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(ee), np.asarray(fe(*q)).ravel(), atol=1e-12)


def test_arm_fk_reference_spot_check():
    # The joint vectors in the reference's debug block
    # (manipulator_3DoF.py:215-224) are IPOPT IK solutions for the end-point
    # target (0.6, 0, 0.1); our FK must map every one of them back onto that
    # target — a cross-validation against the reference's own solver output.
    for q in ([0.42323673, -1.39921683, 1.15256477],
              [0.39936281, -1.43605116, 1.21150565],
              [0.33722445, -1.53417834, 1.37474546]):
        ee, _, _ = arm_fk(jnp.asarray(q))
        np.testing.assert_allclose(
            [float(ee[0]), float(ee[2])], [0.6, 0.1], atol=1e-7)
        assert float(ee[1]) == 0.0


def test_arm_fk_y_is_zero():
    for q in random_q(10):
        ee, j2, j3 = arm_fk(jnp.asarray(q))
        assert float(ee[1]) == 0.0 and float(j2[1]) == 0.0 and float(j3[1]) == 0.0


def test_ee_jacobian_matches_sympy(dh_oracle):
    q1, q2, q3 = sp.symbols("q1 q2 q3", real=True)
    J_sym = geometric_jacobian(panda3dof_dh_table(q1, q2, q3), [1, 3, 5])
    Jf = sp.lambdify((q1, q2, q3), J_sym[:3, :], "numpy")
    for q in random_q(20):
        J = ee_jacobian(jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(J), np.asarray(Jf(*q)), atol=1e-10)


def test_ee_velocity_consistent_with_fd():
    q = jnp.asarray(random_q(1)[0])
    dq = jnp.array([0.3, -0.2, 0.1])
    eps = 1e-7
    ee0, _, _ = arm_fk(q)
    ee1, _, _ = arm_fk(q + eps * dq)
    fd = (ee1 - ee0) / eps
    np.testing.assert_allclose(np.asarray(ee_velocity(q, dq)), np.asarray(fd), atol=1e-5)


def np_base_step(x, u, dt):
    # Literal transcription of reference base.py:17-26 in numpy.
    return np.array([
        x[0] + dt * x[3],
        x[1] + dt * x[4],
        x[2] + dt * x[5],
        x[3] + dt * (u[0] * np.cos(x[2]) - x[4] * x[5]),
        x[4] + dt * (u[0] * np.sin(x[2]) + x[3] * x[5]),
        x[5] + dt * u[1],
    ])


def test_base_step_matches_reference_formula():
    for _ in range(20):
        x = RNG.normal(size=6)
        u = RNG.normal(size=2)
        got = base_step(jnp.asarray(x), jnp.asarray(u), 0.1)
        np.testing.assert_allclose(np.asarray(got), np_base_step(x, u, 0.1), atol=1e-14)


def test_wholebody_step_composition():
    x = RNG.normal(size=9)
    u = RNG.normal(size=5)
    got = wholebody_step(jnp.asarray(x), jnp.asarray(u), 0.1)
    want = np.concatenate([np_base_step(x[:6], u[:2], 0.1), x[6:] + 0.1 * u[2:]])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-14)


def test_wholebody_fk_lift(dh_oracle):
    _, _, fe = dh_oracle
    x = np.array([1.2, -0.7, 0.9, 0, 0, 0, 0.3, -1.1, 1.4])
    pose_ee, j2, j3 = wholebody_fk(jnp.asarray(x))
    ee_arm = np.asarray(fe(0.3, -1.1, 1.4)).ravel()
    r = ee_arm[0] + BASELINK2JOINT1_X
    np.testing.assert_allclose(float(pose_ee[0]), x[0] + r * np.cos(x[2]), atol=1e-12)
    np.testing.assert_allclose(float(pose_ee[1]), x[1] + r * np.sin(x[2]), atol=1e-12)
    np.testing.assert_allclose(float(pose_ee[2]), ee_arm[2] + BASELINK2JOINT1_Z, atol=1e-12)
    np.testing.assert_allclose(float(pose_ee[3]), x[2], atol=1e-15)


def test_point_mass_step():
    got = point_mass_step(jnp.array([1.0, 2.0]), jnp.array([3.0]), 0.1)
    np.testing.assert_allclose(np.asarray(got), [1.2, 2.3], atol=1e-15)


def test_arm_ik_roundtrip():
    # IK targets generated by FK of in-bound joint configs must be recovered
    # (up to redundancy: FK(ik(q)) == FK-target).
    lo, hi = np.asarray(ARM_IK_LOWER), np.asarray(ARM_IK_UPPER)
    qs = RNG.uniform(lo + 0.1, hi - 0.1, size=(20, 3))
    for q in qs:
        ee, _, _ = arm_fk(jnp.asarray(q))
        target = np.array([float(ee[0]), 0.0, float(ee[2])])
        q_sol = arm_ik(jnp.asarray(q) + 0.2, jnp.asarray(target))
        ee_sol, _, _ = arm_fk(q_sol)
        np.testing.assert_allclose(
            [float(ee_sol[0]), float(ee_sol[2])], [target[0], target[2]], atol=1e-6)
        assert np.all(np.asarray(q_sol) >= lo - 1e-12)
        assert np.all(np.asarray(q_sol) <= hi + 1e-12)


def test_arm_ik_reference_case():
    # The standalone IK prototype's target (reference utils/numerical_solve.py)
    # and the Interface's usage pattern: target [x, 0, z] reachable from a
    # deep-folded start.
    q0 = jnp.array([-np.pi / 4, -3 * np.pi / 4, np.pi])
    target = jnp.array([0.4, 0.0, 0.3])
    q = arm_ik(q0, target)
    ee, _, _ = arm_fk(q)
    np.testing.assert_allclose([float(ee[0]), float(ee[2])], [0.4, 0.3], atol=1e-6)


def test_arm_ik_is_vmappable():
    targets = jnp.asarray(
        np.stack([[0.4, 0.0, 0.3], [0.3, 0.0, 0.5], [0.5, 0.0, 0.2]]))
    q0 = jnp.tile(jnp.array([0.0, -0.5, 0.5]), (3, 1))
    qs = jax.vmap(arm_ik)(q0, targets)
    for i in range(3):
        ee, _, _ = arm_fk(qs[i])
        np.testing.assert_allclose(
            [float(ee[0]), float(ee[2])],
            [float(targets[i, 0]), float(targets[i, 2])], atol=1e-6)


def test_angle_diff_semantics():
    # Reference docstring example (mpc_wholebody_qref.py:92-96):
    # a=-3.14, b=3.14 => ~ +0.0032
    d = float(angle_diff(-3.14, 3.14))
    np.testing.assert_allclose(d, 2 * np.pi - 6.28, atol=1e-12)
    # antisymmetric-ish wrap checks
    np.testing.assert_allclose(float(angle_diff(0.1, -0.1)), 0.2, atol=1e-12)
    np.testing.assert_allclose(float(angle_diff(np.pi - 0.1, -np.pi + 0.1)),
                               -0.2, atol=1e-12)
    assert -np.pi <= float(wrap_to_pi(100.0)) < np.pi
