"""Multi-host scaffolding: single-process degenerate path on the virtual
8-device mesh (the multi-process path differs only in process bootstrap and
jax.make_array_from_process_local_data assembly, both jax-native)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from mmmpc_tpu.parallel import (
    batched_solve_fn, global_data_mesh, host_local_batch, init_distributed,
    process_batch_slice, sharded_solve_fn,
)
from tests.test_parallel import _problem, small_mpc  # noqa: F401


def test_init_distributed_noop_without_config(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert init_distributed() is False


def test_process_batch_slice_single():
    local, off = process_batch_slice(64)
    assert local == 64 and off == 0


def test_host_local_batch_solve_matches_vmap(small_mpc):
    """Global-mesh + host-local feeding reproduces the plain vmap solve."""
    B = 16
    x0_b, U0_b, params = _problem(small_mpc, B)
    mesh = global_data_mesh()
    x0_g, U0_g = host_local_batch(mesh, (np.asarray(x0_b),
                                         np.asarray(U0_b)))
    assert len(x0_g.sharding.device_set) == len(jax.devices())

    run = sharded_solve_fn(small_mpc.solve_fn(), mesh)
    res, stats = run(x0_g, U0_g, params)

    run_local = jax.jit(batched_solve_fn(small_mpc.solve_fn()))
    res_ref, _ = run_local(x0_b, U0_b, params)
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(res_ref.U),
                               atol=1e-10)
    assert float(stats.n_solved) == B


@pytest.mark.slow
def test_true_multiprocess_collectives():
    """Spawn 2 real OS processes (4 virtual devices each) and run the full
    multi-host path: jax.distributed bootstrap, global mesh, host-local
    feeding, cross-process psum/pmax inside the program, bit-parity with the
    single-process oracle (scripts/dryrun_multiprocess.py)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, MMMPC_MP_PORT="18931")
    # the child processes must NOT inherit this test run's 8-device flag
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "dryrun_multiprocess.py")],
        env=env, cwd=repo, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PASS" in out.stdout
