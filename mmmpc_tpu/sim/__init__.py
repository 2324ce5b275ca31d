from mmmpc_tpu.sim.kinematic_plant import (  # noqa: F401
    KinematicPlant, plant_observation, plant_step, setup_environment,
    run_step,
)
