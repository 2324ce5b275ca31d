from mmmpc_tpu.controllers.demo import MPC  # noqa: F401
from mmmpc_tpu.controllers.base import MPCBase  # noqa: F401
from mmmpc_tpu.controllers.manipulator import MPCManipulator3DoF  # noqa: F401
from mmmpc_tpu.controllers.wholebody_qref import MPCWholeBody  # noqa: F401
from mmmpc_tpu.controllers.wholebody_endpoint import MPCWholeBodyEndpoint  # noqa: F401
from mmmpc_tpu.controllers.moving_obs import MPCWholeBodyMovingObs, predict_obstacle_trajectory  # noqa: F401
