"""Is the arm fused-bwd mismatch an algebra bug or f32 conditioning?

Compute kff via (a) the f32 structured path (test's reference), (b) the f32
fused kernel, (c) an f64 structured ground truth. Compare a,b each vs c.
"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")

import mmmpc_tpu.ops.generic_bwd as gb_mod
import mmmpc_tpu.ops.riccati as ric
gb_mod.INTERPRET = True
ric.INTERPRET = True

from mmmpc_tpu.solver.al_ilqr import build_core, rollout
from mmmpc_tpu.ops.riccati import riccati_backward_bm
from mmmpc_tpu.utils.configs import SolverConfig

B, N = 1024, 5
F32, F64 = jnp.float32, jnp.float64
CART = len(sys.argv) > 1 and sys.argv[1] == "cart"


def make(dtype):
    from mmmpc_tpu.controllers import MPCManipulator3DoF
    from mmmpc_tpu.models.robots import ManipulatorPanda3DoF
    cfg = SolverConfig(al_iters=2, ilqr_iters=4, n_alpha=3, alpha_decay=0.4,
                       scan_unroll=5)
    mpc = MPCManipulator3DoF(
        ManipulatorPanda3DoF(0.1),
        [np.array([[1 / np.sqrt(2), 0, 1 / np.sqrt(2)]]),
         np.array([[-1 / np.sqrt(2), 0, 1 / np.sqrt(2)]])],
        np.array([0.0, 0.0, 0.35]), N=N, is_cartesian_ref=CART,
        solver_config=cfg)
    rng = np.random.default_rng(13)
    q0 = np.array([0.3, -1.2, 1.2])
    x0_b = jnp.asarray(np.clip(
        q0[None] + rng.standard_normal((B, 3)) * 0.2,
        mpc.qlim[0] + 1e-3, mpc.qlim[1] - 1e-3).astype(np.float32), dtype)
    U0_b = jnp.asarray((0.3 * rng.standard_normal((B, N, 3))
                        ).astype(np.float32), dtype)
    if CART:
        traj = np.linspace([0.45, 0.0, 0.5], [0.35, 0.0, 0.6], N + 1)
    else:
        traj = np.linspace(q0, [0.0, -0.6, 0.9], N + 1)
    params = dict(mpc.make_params(traj, np.zeros((N, 3))),
                  U_last=jnp.zeros((N, 3), dtype))
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float64),
                                                dtype), params)
    return mpc, cfg, x0_b, U0_b, params, rng


def structured_kff(dtype, use_plain_riccati):
    mpc, cfg, x0_b, U0_b, params, rng = make(dtype)
    ocp = mpc.ocp
    core = build_core(ocp, params, cfg, dtype)
    nc, nct, ne = core.nc, core.nct, core.ne
    x0_bm = x0_b.T
    U0_bm = jnp.transpose(U0_b, (1, 2, 0))
    rollout_bm = jax.vmap(lambda x0, U: rollout(ocp, x0, U, params),
                          in_axes=(-1, -1), out_axes=-1)
    X_bm, Uc_bm = rollout_bm(x0_bm, U0_bm)
    lams = (jnp.asarray((np.abs(rng.standard_normal((N, nc, B))) * 0.3
                         ).astype(np.float32), dtype),
            jnp.asarray((np.abs(rng.standard_normal((nct, B))) * 0.3
                         ).astype(np.float32), dtype),
            jnp.asarray((rng.standard_normal((max(ne, 0), B)) * 0.3
                         ).astype(np.float32), dtype))
    mu = jnp.asarray(10.0, dtype)
    reg = jnp.full((B,), 1e-6, dtype)
    derivs_bm = jax.vmap(
        jax.vmap(core.stage_derivs, in_axes=(0, 0, 0, 0, None)),
        in_axes=(-1, -1, None, -1, None), out_axes=-1)
    term_derivs_bm = jax.vmap(core.terminal_derivs,
                              in_axes=(-1, -1, -1, None), out_axes=-1)
    derivs = derivs_bm(X_bm[:-1], Uc_bm, core.ks, lams[0], mu)
    tg, tH = term_derivs_bm(X_bm[-1], lams[1], lams[2], mu)
    if use_plain_riccati:
        # f64 plain Riccati, batch via vmap over last axis
        lx, lu, lxx, luu, lux, A, Bm = [jnp.moveaxis(d, -1, 0)
                                        for d in derivs]
        tg_ = tg.T
        tH_ = jnp.moveaxis(tH, -1, 0)

        def one(lx, lu, lxx, luu, lux, A, Bm, tg, tH, reg1):
            Vx, Vxx = tg, tH
            kffs, Ks = [], []
            for k in reversed(range(N)):
                Qx = lx[k] + A[k].T @ Vx
                Qu = lu[k] + Bm[k].T @ Vx
                Qxx = lxx[k] + A[k].T @ Vxx @ A[k]
                Quu = luu[k] + Bm[k].T @ Vxx @ Bm[k]
                Qux = lux[k] + Bm[k].T @ Vxx @ A[k]
                Quu_r = Quu + reg1 * jnp.eye(3, dtype=Quu.dtype)
                sol = jnp.linalg.solve(
                    Quu_r, jnp.concatenate([Qu[:, None], Qux], axis=1))
                kff, K = -sol[:, 0], -sol[:, 1:]
                Vx = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
                Vxx = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
                Vxx = 0.5 * (Vxx + Vxx.T)
                kffs.append(kff)
                Ks.append(K)
            return jnp.stack(kffs[::-1]), jnp.stack(Ks[::-1])

        kff, K = jax.vmap(one)(lx, lu, lxx, luu, lux, A, Bm, tg_, tH_, reg)
        return jnp.moveaxis(kff, 0, -1), mpc
    kff, K = riccati_backward_bm(*derivs, tg, tH, reg)
    return kff, mpc


def fused_kff():
    mpc, cfg, x0_b, U0_b, params, rng = make(F32)
    ocp = mpc.ocp
    core = build_core(ocp, params, cfg, F32)
    nc, nct, ne = core.nc, core.nct, core.ne
    x0_bm = x0_b.T
    U0_bm = jnp.transpose(U0_b, (1, 2, 0))
    rollout_bm = jax.vmap(lambda x0, U: rollout(ocp, x0, U, params),
                          in_axes=(-1, -1), out_axes=-1)
    X_bm, Uc_bm = rollout_bm(x0_bm, U0_bm)
    lams = (jnp.asarray((np.abs(rng.standard_normal((N, nc, B))) * 0.3
                         ).astype(np.float32), F32),
            jnp.asarray((np.abs(rng.standard_normal((nct, B))) * 0.3
                         ).astype(np.float32), F32),
            jnp.asarray((rng.standard_normal((max(ne, 0), B)) * 0.3
                         ).astype(np.float32), F32))
    mu = jnp.asarray(10.0, F32)
    reg = jnp.full((B,), 1e-6, F32)
    bwd = ocp.lanes_bwd_factory(cfg)
    kff, K = bwd(X_bm, Uc_bm, lams[0], lams[1], lams[2], mu, reg, params)
    return kff


kff64, _ = structured_kff(F64, use_plain_riccati=True)
kff32s, _ = structured_kff(F32, use_plain_riccati=False)
kff32f = fused_kff()

e_struct = np.abs(np.asarray(kff32s, np.float64) - np.asarray(kff64))
e_fused = np.abs(np.asarray(kff32f, np.float64) - np.asarray(kff64))
e_cross = np.abs(np.asarray(kff32f, np.float64)
                 - np.asarray(kff32s, np.float64))
print(f"cartesian={CART}")
print(f"|f32 structured - f64| max {e_struct.max():.3e} "
      f"p99 {np.percentile(e_struct, 99):.3e}")
print(f"|f32 fused      - f64| max {e_fused.max():.3e} "
      f"p99 {np.percentile(e_fused, 99):.3e}")
print(f"|f32 fused - f32 structured| max {e_cross.max():.3e}")
b = np.unravel_index(e_cross.argmax(), e_cross.shape)
print(f"worst cross idx {b}: struct->f64 err {e_struct[b]:.3e}, "
      f"fused->f64 err {e_fused[b]:.3e}")
