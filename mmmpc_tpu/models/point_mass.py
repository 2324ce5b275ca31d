"""1-D double integrator — the demo robot.

Reference: /root/reference/robot_models/robot_demo.py.
state x = [p, v], input u = [a].
"""

import jax.numpy as jnp


def point_mass_step(x, u, dt):
    u0 = jnp.reshape(u, ())  # accept (1,) or scalar input
    return jnp.stack([x[0] + dt * x[1], x[1] + dt * u0])
