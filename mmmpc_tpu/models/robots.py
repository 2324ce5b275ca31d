"""Object wrappers over the pure-function models — the reference's robot API.

The reference controllers receive robot *objects* exposing ``dt``,
``f_kinematics`` and ``forward_tranformation`` (sic)
(/root/reference/robot_models/*.py).  These thin classes reproduce that
surface so a user of the reference can wire up controllers the same way,
while all computation stays in the jit/vmap-safe functions of
mmmpc_tpu.models.
"""

import jax.numpy as jnp

from mmmpc_tpu.models import arm, base, mobile_manipulator, point_mass


class RobotDemo:
    """1-D double integrator (reference robot_models/robot_demo.py)."""

    nx, nu = 2, 1

    def __init__(self, dt):
        self.dt = dt

    def f_kinematics(self, x, u):
        return point_mass.point_mass_step(x, u, self.dt)


class Base:
    """Differential-drive base (reference robot_models/base.py)."""

    nx, nu = 6, 2

    def __init__(self, dt):
        self.dt = dt
        self.base_length = base.BASE_LENGTH
        self.base_width = base.BASE_WIDTH

    def base_radius(self):
        return base.BASE_RADIUS

    def f_kinematics(self, x, u, limited_yaw=False):
        return base.base_step(x, u, self.dt, limited_yaw=limited_yaw)


class ManipulatorPanda3DoF:
    """Reduced Panda arm (reference robot_models/manipulator_3DoF.py)."""

    nx, nu = 3, 3

    def __init__(self, dt):
        self.dt = dt

    def forward_tranformation(self, q):  # reference spelling kept
        return arm.arm_fk(jnp.asarray(q))

    def inverse_transformation(self, q_initial_guess, x_target):
        return arm.arm_ik(jnp.asarray(q_initial_guess),
                          jnp.asarray(x_target))

    def f_kinematics(self, q, q_dot):
        return arm.arm_step(q, q_dot, self.dt)


class MobileManipulator:
    """Base + arm composition (reference robot_models/mobile_manipulator.py)."""

    nx, nu = 9, 5

    def __init__(self, dt):
        self.dt = dt
        self.base = Base(dt)
        self.manipulator = ManipulatorPanda3DoF(dt)

    def forward_tranformation(self, state):
        return mobile_manipulator.wholebody_fk(jnp.asarray(state))

    def f_kinematics(self, x, u):
        return mobile_manipulator.wholebody_step(x, u, self.dt)
