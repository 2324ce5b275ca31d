"""Whole-body model: diff-drive base + Panda-3DoF arm composition.

Pure-function re-design of the reference MobileManipulator
(/root/reference/robot_models/mobile_manipulator.py).

state x = [px, py, psi, dx, dy, dpsi, q1, q2, q3]   (9,)
input u = [dV, dw, dq1, dq2, dq3]                    (5,)
"""

import jax.numpy as jnp

from mmmpc_tpu.models.arm import arm_fk, arm_step, ee_jacobian
from mmmpc_tpu.models.base import base_step
from mmmpc_tpu.utils.configs import BASELINK2JOINT1_X, BASELINK2JOINT1_Z


def _lift_to_world(p_arm, px, py, cpsi, spsi):
    """Lift an arm-frame point (x, 0, z) into the world frame.

    Planar rotation of the arm's x-axis by the base yaw plus the base-link ->
    joint-1 offsets (reference mobile_manipulator.py:36-53; the arm's local y
    is identically 0, so only the x component rotates).
    """
    r = p_arm[0] + BASELINK2JOINT1_X
    return jnp.stack([px + r * cpsi, py + r * spsi, p_arm[2] + BASELINK2JOINT1_Z])


def wholebody_fk(state):
    """World-frame end-effector pose and joint positions.

    Returns (pose_endpoint (4,) = [x, y, z, psi], pos_joint2 (3,),
    pos_joint3 (3,)) — reference forward_tranformation
    (mobile_manipulator.py:17-55): the end-effector yaw is the base yaw.
    """
    px, py, psi = state[0], state[1], state[2]
    q = state[6:9]
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    ee, j2, j3 = arm_fk(q)
    ee_w = _lift_to_world(ee, px, py, cpsi, spsi)
    j2_w = _lift_to_world(j2, px, py, cpsi, spsi)
    j3_w = _lift_to_world(j3, px, py, cpsi, spsi)
    pose_ee = jnp.concatenate([ee_w, psi[None]])
    return pose_ee, j2_w, j3_w


def wholebody_pose_jacobian(state):
    """Closed-form 4x9 Jacobian of the end-effector world pose wrt the state.

    d(wholebody_fk(state)[0]) / d state for the endpoint-tracking controller's
    AL expansion (reference mpc_wholebody.py tracks this pose).  Only
    [px, py, psi, q1, q2, q3] enter the pose: the x/y rows rotate the arm-frame
    x-Jacobian by the base yaw and pick up the lever-arm term -r sin/cos(psi),
    the z row is the arm-frame z-Jacobian, and the yaw row is d psi/d psi = 1.
    Verified against jax.jacfwd in tests/test_hand_jacobians.py.
    """
    psi = state[2]
    q = state[6:9]
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    ee, _, _ = arm_fk(q)
    r = ee[0] + BASELINK2JOINT1_X
    Ja = ee_jacobian(q)                      # rows [x, 0, z] wrt q
    z = jnp.zeros_like(psi)
    one = jnp.ones_like(psi)
    return jnp.stack([
        jnp.stack([one, z, -r * spsi, z, z, z,
                   cpsi * Ja[0, 0], cpsi * Ja[0, 1], cpsi * Ja[0, 2]]),
        jnp.stack([z, one, r * cpsi, z, z, z,
                   spsi * Ja[0, 0], spsi * Ja[0, 1], spsi * Ja[0, 2]]),
        jnp.stack([z, z, z, z, z, z, Ja[2, 0], Ja[2, 1], Ja[2, 2]]),
        jnp.stack([z, z, one, z, z, z, z, z, z]),
    ])


def wholebody_step(x, u, dt):
    """One Euler step of the composed base+arm kinematics.

    Reference f_kinematics (mobile_manipulator.py:57-75).
    """
    x_base = base_step(x[:6], u[:2], dt)
    q_next = arm_step(x[6:9], u[2:5], dt)
    return jnp.concatenate([x_base, q_next])


def wholebody_jacobians(x, u, dt):
    """Closed-form (A, B) = (d step/dx, d step/du) of wholebody_step.

    The Euler-integrated dynamics are simple enough that AD is pure
    overhead; hand-coding them removes 14 JVP sweeps per stage from the
    solver's hot loop.  Verified against jax.jacfwd in tests.
    """
    psi, dx, dy, dpsi = x[2], x[3], x[4], x[5]
    dV = u[0]
    c, s = jnp.cos(psi), jnp.sin(psi)
    z = jnp.zeros_like(psi)
    one = jnp.ones_like(psi)
    dt = jnp.asarray(dt, x.dtype)

    A_base = jnp.stack([
        jnp.stack([one, z, z, dt, z, z]),
        jnp.stack([z, one, z, z, dt, z]),
        jnp.stack([z, z, one, z, z, dt]),
        jnp.stack([z, z, -dt * dV * s, one, -dt * dpsi, -dt * dy]),
        jnp.stack([z, z, dt * dV * c, dt * dpsi, one, dt * dx]),
        jnp.stack([z, z, z, z, z, one]),
    ])
    A = jnp.zeros((9, 9), x.dtype).at[:6, :6].set(A_base)
    A = A.at[6, 6].set(1.0).at[7, 7].set(1.0).at[8, 8].set(1.0)

    B = jnp.zeros((9, 5), x.dtype)
    B = B.at[3, 0].set(dt * c).at[4, 0].set(dt * s).at[5, 1].set(dt)
    B = B.at[6, 2].set(dt).at[7, 3].set(dt).at[8, 4].set(dt)
    return A, B
