"""Obstacle value types.

The reference represents ground obstacles as a list of (x, y, radius) records
(/root/reference/robot_models/obstacles.py) and manipulator obstacles as a
list of (point, normal) half-plane pairs (demo_wholebody_qref.py:21-33).
Here both are dense arrays so they vmap/shard as data — obstacle layouts are
runtime inputs to compiled solvers, never baked into the program.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


class Obstacles:
    """API-compatible single ground obstacle record (x, y, radius)."""

    def __init__(self, x, y, radius):
        self.x = x
        self.y = y
        self.radius = radius


def ground_obstacle_array(obstacle_list) -> np.ndarray:
    """Stack Obstacles records (or (x,y,r) tuples) into an (n, 3) array."""
    rows = []
    for obs in obstacle_list:
        if isinstance(obs, Obstacles):
            rows.append([obs.x, obs.y, obs.radius])
        else:
            rows.append(list(obs))
    if not rows:
        return np.zeros((0, 3))
    return np.asarray(rows, dtype=float)


@dataclasses.dataclass
class HalfPlanes:
    """Padded half-plane obstacle set for the manipulator.

    The union-of-half-planes semantics (a point is safe if it is on the
    outside of at least ONE plane) follow the reference's obsAvoidConvex
    (mpc_wholebody_qref.py:57-89).  ``mask`` marks live rows so batches with
    different obstacle counts share one compiled program.
    """

    points: jnp.ndarray    # (n_hp, 3)
    normals: jnp.ndarray   # (n_hp, 3)
    mask: jnp.ndarray      # (n_hp,)

    @staticmethod
    def from_list(pairs, n_pad: int | None = None) -> "HalfPlanes":
        n = len(pairs)
        n_pad = n_pad or max(n, 1)
        pts = np.zeros((n_pad, 3))
        nrm = np.zeros((n_pad, 3))
        msk = np.zeros((n_pad,))
        for j, (p, nvec) in enumerate(pairs):
            pts[j] = np.asarray(p, dtype=float).reshape(3)
            nrm[j] = np.asarray(nvec, dtype=float).reshape(3)
            msk[j] = 1.0
        return HalfPlanes(jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(msk))
