"""Dynamic-obstacle whole-body MPC demo.

Reconstruction of the reference's unavailable ``moving_obs`` branch entry
point (``demo_wholebody_separate.py``, README.md:57,85-88): the same
whole-body task with a ground obstacle crossing the robot's path; each tick
the controller receives a constant-velocity prediction of the obstacle's
trajectory over the horizon.
"""

import numpy as np

from mmmpc_tpu.controllers import MPCWholeBodyMovingObs
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.models.robots import MobileManipulator
from mmmpc_tpu.runtime import Interface

DT = 0.1
N = 20
T_MOVE = 5
T_MANIPULATE = 2


class MovingObstacleInterface(Interface):
    """Interface that advances the obstacle and refreshes the controller's
    per-step obstacle prediction each control tick."""

    def __init__(self, *args, obstacle_velocity, **kwargs):
        super().__init__(*args, **kwargs)
        self.obstacle_velocity = np.asarray(obstacle_velocity, dtype=float)
        self.obstacle_positions = np.asarray(
            [[o.x, o.y] for o in self.controller.obstacle_list], dtype=float)
        self.obstacle_log = []

    def timerCallback(self):
        # world update: obstacles move one control period per tick
        self.obstacle_positions = (self.obstacle_positions
                                   + self.dt * self.obstacle_velocity)
        self.obstacle_log.append(self.obstacle_positions.copy())
        self.controller.observe_obstacles(self.obstacle_positions,
                                          self.obstacle_velocity)
        super().timerCallback()


def build_world(physical_sim=False):
    x_start = np.array([0, 0, 0, 0, 0, 0, -np.pi / 4, -np.pi, np.pi])
    global_pose_target = np.array([5 - 0.6, 5, 0.606 + 0.333 + 0.5, -np.pi])
    # an obstacle that will cross the straight-line path mid-transit
    obstacle_list = [Obstacles(2.5, -0.5, 0.5)]
    obstacle_velocity = np.array([[0.0, 0.6]])

    robot = MobileManipulator(DT)
    controller = MPCWholeBodyMovingObs(robot, obstacle_list, [], N=N)
    world = MovingObstacleInterface(
        DT, T_MOVE, T_MANIPULATE, x_start, global_pose_target, controller,
        physical_sim=physical_sim, obstacle_velocity=obstacle_velocity)
    return world


if __name__ == "__main__":
    world = build_world()
    world.run()
    print("task finished:", world.task_flag,
          "after", world.mpc_step_counter, "MPC steps")
    print("metrics:", world.metrics.summary())
