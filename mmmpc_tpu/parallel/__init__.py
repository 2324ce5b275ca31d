from mmmpc_tpu.parallel.data_parallel import (  # noqa: F401
    make_mesh, batched_solve_fn, controller_batched_fn, sharded_solve_fn,
    BatchStats,
)
