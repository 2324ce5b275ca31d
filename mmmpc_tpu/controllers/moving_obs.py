"""Whole-body MPC with dynamic (moving) ground obstacles.

Reconstruction of the reference's unavailable ``moving_obs`` branch
(README.md:85-88, demo_wholebody_separate.py; see SURVEY.md §2.1 note): the
same qref formulation, but obstacle positions are promoted from constants
baked into ``reset()`` to per-solve, per-step parameters predicted forward
over the horizon.  ``predict_obstacle_trajectory`` supplies the standard
constant-velocity prediction.

Because the base class already treats obstacle data as a runtime array, the
only change is the (N+1, n_obs, 3) obstacle parameter indexed by stage k
(``moving_obstacles=True``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mmmpc_tpu.controllers.wholebody_qref import MPCWholeBody


def predict_obstacle_trajectory(obstacles, velocities, N, dt):
    """Constant-velocity obstacle prediction over the horizon.

    obstacles: (n_obs, 3) rows [x, y, radius]; velocities: (n_obs, 2).
    Returns (N+1, n_obs, 3) with radii held constant.
    """
    obstacles = jnp.asarray(obstacles)
    velocities = jnp.asarray(velocities)
    ts = jnp.arange(N + 1)[:, None, None] * dt        # (N+1, 1, 1)
    xy = obstacles[None, :, :2] + ts * velocities[None, :, :]
    r = jnp.broadcast_to(obstacles[None, :, 2:], (N + 1,) + obstacles[:, 2:].shape)
    return jnp.concatenate([xy, r], axis=-1)


class MPCWholeBodyMovingObs(MPCWholeBody):
    """qref whole-body MPC over predicted obstacle trajectories."""

    def __init__(self, robot, obstacle_list, obstacle_manipulation_list,
                 N=10, **kwargs):
        super().__init__(robot, obstacle_list, obstacle_manipulation_list,
                         N=N, moving_obstacles=True, **kwargs)
        # until told otherwise, obstacles are static: tile them over the horizon
        self.obstacles_value = jnp.tile(self.obstacles_value[None],
                                        (N + 1, 1, 1))

    def set_obstacle_prediction(self, obstacle_traj):
        """Set the (N+1, n_obs, 3) predicted obstacle trajectory for the next
        solve (call each tick with fresh observations)."""
        obstacle_traj = jnp.asarray(obstacle_traj)
        assert obstacle_traj.shape == (self.N + 1, self.n_obs, 3)
        self.obstacles_value = obstacle_traj

    def observe_obstacles(self, positions, velocities):
        """Convenience: constant-velocity prediction from one observation."""
        obs = np.asarray(self.obstacles_value[0]).copy()
        obs[:, :2] = np.asarray(positions)
        self.set_obstacle_prediction(
            predict_obstacle_trajectory(obs, velocities, self.N, self.dt))
