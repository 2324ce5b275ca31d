from mmmpc_tpu.utils.math import angle_diff, safe_norm, wrap_to_pi  # noqa: F401
