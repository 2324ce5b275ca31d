from mmmpc_tpu.native.bindings import (  # noqa: F401
    available, arm_fk, wholebody_fk, wholebody_step, plant_step,
    plant_observation, nearest_index, local_ref_window, integrate_command,
)
