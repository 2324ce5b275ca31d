from mmmpc_tpu.ocp.spec import OCP  # noqa: F401
