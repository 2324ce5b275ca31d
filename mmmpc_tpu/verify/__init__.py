from mmmpc_tpu.verify.oracle import scipy_solve  # noqa: F401
