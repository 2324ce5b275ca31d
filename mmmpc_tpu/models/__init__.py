from mmmpc_tpu.models.base import BASE_RADIUS, base_step  # noqa: F401
from mmmpc_tpu.models.arm import (  # noqa: F401
    ARM_JOINT_LOWER, ARM_JOINT_UPPER, arm_fk, arm_step, ee_jacobian, arm_ik,
)
from mmmpc_tpu.models.mobile_manipulator import (  # noqa: F401
    wholebody_fk, wholebody_step,
)
from mmmpc_tpu.models.point_mass import point_mass_step  # noqa: F401
