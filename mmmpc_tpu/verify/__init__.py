from mmmpc_tpu.verify.oracle import lbfgs_solve, scipy_solve  # noqa: F401
