"""Differential-drive base: geometry + discrete kinematics.

Pure-function, jit/vmap-safe re-design of the reference Base class
(/root/reference/robot_models/base.py).  State and input layouts are
identical to the reference:

state  x = [px, py, psi, dx, dy, dpsi]      (world-frame velocities)
input  u = [dV, dw]                          (accelerations)
"""

import jax.numpy as jnp

from mmmpc_tpu.utils.math import wrap_to_pi

# Geometry estimated in simulation (reference base.py:9-15).  The reference's
# base_radius() short-circuits the sqrt formula and returns the hardcoded 0.4.
BASE_LENGTH = 2 * (0.7 / 2 + 0.157)
BASE_WIDTH = 0.52
BASE_RADIUS = 0.4


def base_jacobians(x, u, dt):
    """Closed-form (A, B) of base_step — same hand-derivation as the base
    block of wholebody_jacobians (mobile_manipulator.py); keeps AD out of
    the base-only controller's hot loop.  Verified against jax.jacfwd in
    tests/test_hand_jacobians.py."""
    psi, dx, dy, dpsi = x[2], x[3], x[4], x[5]
    dV = u[0]
    c, s = jnp.cos(psi), jnp.sin(psi)
    z = jnp.zeros_like(psi)
    one = jnp.ones_like(psi)
    dt = jnp.asarray(dt, x.dtype)
    A = jnp.stack([
        jnp.stack([one, z, z, dt, z, z]),
        jnp.stack([z, one, z, z, dt, z]),
        jnp.stack([z, z, one, z, z, dt]),
        jnp.stack([z, z, -dt * dV * s, one, -dt * dpsi, -dt * dy]),
        jnp.stack([z, z, dt * dV * c, dt * dpsi, one, dt * dx]),
        jnp.stack([z, z, z, z, z, one]),
    ])
    B = jnp.zeros((6, 2), x.dtype)
    B = B.at[3, 0].set(dt * c).at[4, 0].set(dt * s).at[5, 1].set(dt)
    return A, B


def base_step(x, u, dt, limited_yaw: bool = False):
    """Euler-integrated 6-state base model (reference base.py:17-26).

    The velocity update includes the world-frame cross-coupling terms
    -dy*dpsi / +dx*dpsi exactly as the reference writes them.
    """
    px, py, psi, dx, dy, dpsi = x[0], x[1], x[2], x[3], x[4], x[5]
    dV, dw = u[0], u[1]
    psi_next = psi + dt * dpsi
    if limited_yaw:
        psi_next = wrap_to_pi(psi_next)
    return jnp.stack(
        [
            px + dt * dx,
            py + dt * dy,
            psi_next,
            dx + dt * (dV * jnp.cos(psi) - dy * dpsi),
            dy + dt * (dV * jnp.sin(psi) + dx * dpsi),
            dpsi + dt * dw,
        ]
    )
