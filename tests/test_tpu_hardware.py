"""Real-hardware kernel parity lane (VERDICT r3 #9).

Re-runs the kernel parity checks with INTERPRET=False on an actual TPU so
that interpreter-mode parity cannot mask a Mosaic lowering difference.
Skipped entirely unless invoked as:

    MMMPC_TPU_TESTS=1 python -m pytest -m tpu tests/

(the env flag makes conftest.py keep the real backend instead of forcing
the CPU mesh; float64 stays off — these are f32 kernels).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if os.environ.get("MMMPC_TPU_TESTS") != "1":
    pytest.skip("TPU hardware lane: run MMMPC_TPU_TESTS=1 pytest -m tpu",
                allow_module_level=True)

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

if jax.devices()[0].platform == "cpu":
    pytest.skip("no TPU device available", allow_module_level=True)

from mmmpc_tpu.solver.al_ilqr import build_core, rollout      # noqa: E402
from mmmpc_tpu.ops.riccati import riccati_backward_bm         # noqa: E402
from mmmpc_tpu.utils.configs import SolverConfig              # noqa: E402

B, N = 1024, 5
F32 = jnp.float32


def test_riccati_kernel_matches_scan_on_hw():
    """Pallas batch-on-lanes Riccati vs the pure-JAX scan, both on TPU."""
    from tests.test_pallas_riccati import reference_backward

    nx, nu = 4, 2
    rng = np.random.default_rng(3)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32))

    def psd(*s):
        a = rng.standard_normal(s).astype(np.float32)
        return jnp.asarray(np.einsum("...ij,...kj->...ik", a, a)
                           + 0.5 * np.eye(s[-1], dtype=np.float32))

    args_bm = (r(B, N, nx), r(B, N, nu), psd(B, N, nx, nx),
               psd(B, N, nu, nu), 0.1 * r(B, N, nu, nx),
               r(B, N, nx, nx) * 0.3 + jnp.eye(nx, dtype=F32),
               0.3 * r(B, N, nx, nu), r(B, nx), psd(B, nx, nx))
    # the pure-JAX reference path must run its small matmuls in full f32:
    # on TPU `@` defaults to bf16 MXU passes, which is the REFERENCE being
    # wrong, not the kernel (the kernel is elementwise f32 throughout)
    with jax.default_matmul_precision("highest"):
        kff_ref, K_ref = reference_backward(*args_bm, 1e-6)
    # batch-minor kernel layout; reg per-scenario
    reg = jnp.full((B,), 1e-6, F32)
    mn = [jnp.moveaxis(a, 0, -1) for a in args_bm]
    kff, K = riccati_backward_bm(*mn, reg)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(kff, -1, 0)),
                               np.asarray(kff_ref), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(K, -1, 0)),
                               np.asarray(K_ref), atol=2e-4, rtol=1e-3)


def _bwd_parity_hw(mpc, cfg, x0_b, U0_b, params, rng, p99_tol):
    """Fused backward kernel vs structured-expansion + Riccati kernel, both
    executing compiled on the TPU (the hardware twin of
    tests/test_generic_bwd.py's interpreter check)."""
    ocp = mpc.ocp
    core = build_core(ocp, params, cfg, F32)
    nc, nct, ne = core.nc, core.nct, core.ne
    x0_bm = x0_b.T
    U0_bm = jnp.transpose(U0_b, (1, 2, 0))
    rollout_bm = jax.vmap(lambda x0, U: rollout(ocp, x0, U, params),
                          in_axes=(-1, -1), out_axes=-1)
    X_bm, Uc_bm = rollout_bm(x0_bm, U0_bm)
    lams = (jnp.asarray(np.abs(rng.standard_normal((N, nc, B)))
                        .astype(np.float32) * 0.3),
            jnp.asarray(np.abs(rng.standard_normal((nct, B)))
                        .astype(np.float32) * 0.3),
            jnp.asarray(rng.standard_normal((max(ne, 0), B))
                        .astype(np.float32) * 0.3))
    mu = jnp.asarray(10.0, F32)
    reg = jnp.full((B,), 1e-6, F32)

    derivs_bm = jax.vmap(
        jax.vmap(core.stage_derivs, in_axes=(0, 0, 0, 0, None)),
        in_axes=(-1, -1, None, -1, None), out_axes=-1)
    term_derivs_bm = jax.vmap(core.terminal_derivs,
                              in_axes=(-1, -1, -1, None), out_axes=-1)
    # full-f32 matmuls in the structured reference assembly (bf16 MXU
    # default would make the REFERENCE the inaccurate side)
    with jax.default_matmul_precision("highest"):
        derivs = derivs_bm(X_bm[:-1], Uc_bm, core.ks, lams[0], mu)
        tg, tH = term_derivs_bm(X_bm[-1], lams[1], lams[2], mu)
    kff_ref, K_ref = riccati_backward_bm(*derivs, tg, tH, reg)

    bwd = ocp.lanes_bwd_factory(cfg)
    kff, K = bwd(X_bm, Uc_bm, lams[0], lams[1], lams[2], mu, reg, params)

    for hand, ref in ((kff, kff_ref), (K, K_ref)):
        d = np.abs(np.asarray(hand, np.float64) - np.asarray(ref, np.float64))
        assert np.percentile(d, 99) < p99_tol, np.percentile(d, 99)


def test_qref_fused_bwd_on_hw():
    from tests.test_fused_bwd import make_problem

    mpc, cfg, x0_b, U0_b, params = make_problem()
    rng = np.random.default_rng(3)
    _bwd_parity_hw(mpc, cfg, x0_b, U0_b, params, rng, p99_tol=5e-3)


def test_endpoint_fused_bwd_on_hw():
    from tests.test_generic_bwd import _endpoint_problem

    mpc, cfg, x0_b, U0_b, params, rng = _endpoint_problem()
    _bwd_parity_hw(mpc, cfg, x0_b, U0_b, params, rng, p99_tol=1e-3)


@pytest.mark.parametrize("cartesian", [False, True])
def test_arm_fused_bwd_on_hw(cartesian):
    from tests.test_generic_bwd import _arm_problem

    mpc, cfg, x0_b, U0_b, params, rng = _arm_problem(cartesian)
    _bwd_parity_hw(mpc, cfg, x0_b, U0_b, params, rng, p99_tol=1e-3)


def test_qref_lanes_solve_on_hw():
    """Full lanes solve (both fused kernels compiled on TPU) vs the vmap
    fallback: identical solution quality."""
    import dataclasses

    from tests.test_fused_bwd import make_problem
    from mmmpc_tpu.solver import al_ilqr_solve_batched

    mpc, cfg, x0_b, U0_b, params = make_problem()
    res_lanes = al_ilqr_solve_batched(mpc.ocp, x0_b, U0_b, params, cfg)
    cfg_vmap = dataclasses.replace(cfg, use_pallas_riccati=False)
    res_ref = al_ilqr_solve_batched(mpc.ocp, x0_b, U0_b, params, cfg_vmap)
    np.testing.assert_allclose(np.asarray(res_lanes.cost),
                               np.asarray(res_ref.cost),
                               rtol=5e-3, atol=5e-3)
    assert float(jnp.max(res_lanes.max_violation)) < 1e-2
