"""Attribute per-iteration time in the batch-minor lanes path: scan 160
iterations with components stubbed, like scripts/ablate_iter.py but for
_solve_batched_lanes' inner loop."""

import time

import jax
import jax.numpy as jnp

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, SOLVER_CFG, BATCH
from mmmpc_tpu.solver.al_ilqr import build_core, rollout
from mmmpc_tpu.ops.riccati import riccati_backward_bm

N_ITERS = 160


def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    ocp = mpc.ocp
    cfg = SOLVER_CFG
    dtype = jnp.float32
    core = build_core(ocp, params, cfg, dtype)
    B = x0_b.shape[0]
    fwd_ls = ocp.lanes_fwd_factory(cfg)

    rollout_bm = jax.vmap(lambda x0, U: rollout(ocp, x0, U, params),
                          in_axes=(-1, -1), out_axes=-1)
    derivs_bm = jax.vmap(
        jax.vmap(core.stage_derivs, in_axes=(0, 0, 0, 0, None)),
        in_axes=(-1, -1, None, -1, None), out_axes=-1)
    term_derivs_bm = jax.vmap(core.terminal_derivs,
                              in_axes=(-1, -1, -1, None), out_axes=-1)
    al_term_bm = jax.vmap(
        jax.vmap(core.al_terminal, in_axes=(-1, -1, -1, None)),
        in_axes=(0, None, None, None))

    x0_bm = x0_b.T
    U0_bm = jnp.transpose(U0_b, (1, 2, 0))
    lams = (jnp.zeros((ocp.N, core.nc, B), dtype),
            jnp.zeros((core.nct, B), dtype),
            jnp.zeros((core.ne, B), dtype))
    mu = jnp.asarray(10.0, dtype)
    reg = jnp.full((B,), 1e-6, dtype)
    alphas_idx = jnp.arange(cfg.n_alpha)

    X0, Uc0 = jax.jit(rollout_bm)(x0_bm, U0_bm)
    d0 = jax.jit(lambda X, U: derivs_bm(X[:-1], U, core.ks, lams[0], mu))(
        X0, Uc0)
    tg0, tH0 = jax.jit(lambda X: term_derivs_bm(X[-1], lams[1], lams[2],
                                                mu))(X0)
    k0, K0 = jax.jit(lambda d, tg, tH: riccati_backward_bm(
        *d, tg, tH, reg))(d0, tg0, tH0)
    k0, K0 = k0.astype(dtype), K0.astype(dtype)

    def make_loop(do_derivs, do_term, do_ric, do_ls):
        def it(carry, _):
            X, U, cost = carry
            if do_derivs:
                derivs = derivs_bm(X[:-1], U, core.ks, lams[0], mu)
            else:
                derivs = jax.tree.map(lambda a: a + 0.0 * cost[0], d0)
            if do_term:
                tg, tH = term_derivs_bm(X[-1], lams[1], lams[2], mu)
            else:
                tg, tH = tg0 + 0.0 * cost[0], tH0
            if do_ric:
                kffs, Ks = riccati_backward_bm(*derivs, tg, tH, reg)
                kffs, Ks = kffs.astype(dtype), Ks.astype(dtype)
            else:
                kffs, Ks = k0 + 0.0 * derivs[0][0, 0], K0
            if do_ls:
                Xc, Uc, xlast, cc = fwd_ls(X[:-1], U, kffs, Ks, lams[0],
                                           mu, params)
                cc = cc + al_term_bm(xlast, lams[1], lams[2], mu)
                best = jnp.argmin(cc, axis=0)
                onehot = (alphas_idx[:, None] == best[None, :]).astype(dtype)
                cost = jnp.sum(cc * onehot, axis=0)
                X_stage = jnp.einsum("kaxb,ab->kxb", Xc, onehot)
                U = jnp.einsum("kaub,ab->kub", Uc, onehot)
                x_last = jnp.einsum("axb,ab->xb", xlast, onehot)
                X = jnp.concatenate([X_stage, x_last[None]], axis=0)
            else:
                X = X + 1e-8 * kffs[0, 0][None, None, :]
                cost = cost + kffs[0, 0]
            return (X, U, cost), None

        def loop(X, U):
            (X, U, c), _ = jax.lax.scan(it, (X, U, jnp.zeros((B,), dtype)),
                                        None, length=N_ITERS)
            return X, U, c
        return jax.jit(loop)

    def timeit(fn, reps=3):
        out = fn(X0, Uc0)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(X0, Uc0)
        jax.block_until_ready(out[0])
        return (time.perf_counter() - t0) / reps * 1e3 / N_ITERS

    full = timeit(make_loop(1, 1, 1, 1))
    no_d = timeit(make_loop(0, 1, 1, 1))
    no_t = timeit(make_loop(1, 0, 1, 1))
    no_r = timeit(make_loop(1, 1, 0, 1))
    no_l = timeit(make_loop(1, 1, 1, 0))
    print(f"full lanes iter    {full:7.3f} ms")
    print(f"- stage derivs     {no_d:7.3f}  (derivs cost ~{full-no_d:.3f})")
    print(f"- terminal derivs  {no_t:7.3f}  (term cost   ~{full-no_t:.3f})")
    print(f"- riccati          {no_r:7.3f}  (riccati     ~{full-no_r:.3f})")
    print(f"- line search      {no_l:7.3f}  (LS+select   ~{full-no_l:.3f})")


if __name__ == "__main__":
    main()
