from mmmpc_tpu.ops.riccati import riccati_backward  # noqa: F401
