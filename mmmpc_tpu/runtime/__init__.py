from mmmpc_tpu.runtime.interface import Interface  # noqa: F401
from mmmpc_tpu.runtime.reference import (  # noqa: F401
    local_ref_traj, local_ref_pose, nearest_index,
)
