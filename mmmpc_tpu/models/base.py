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
