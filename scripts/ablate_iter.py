"""Time a scan of 160 inner iLQR iterations with individual components
stubbed out, to attribute the ~1 ms/iter budget."""

import time

import jax
import jax.numpy as jnp

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, SOLVER_CFG, BATCH
from mmmpc_tpu.solver.al_ilqr import build_core, rollout
from mmmpc_tpu.ops.riccati import riccati_backward

N_ITERS = 160


def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    ocp = mpc.ocp
    cfg = SOLVER_CFG
    dtype = jnp.float32
    core = build_core(ocp, params, cfg, dtype)
    B = x0_b.shape[0]

    lams = (jnp.zeros((B, ocp.N, core.nc), dtype),
            jnp.zeros((B, core.nct), dtype),
            jnp.zeros((B, core.ne), dtype))
    mu = jnp.asarray(10.0, dtype)

    rollout_b = jax.vmap(lambda x0, U: rollout(ocp, x0, U, params))
    derivs_b = jax.vmap(jax.vmap(core.stage_derivs,
                                 in_axes=(0, 0, 0, 0, None)),
                        in_axes=(0, 0, None, 0, None))
    term_derivs_b = jax.vmap(core.terminal_derivs, in_axes=(0, 0, 0, None))
    fwd_b = jax.vmap(core.fwd_pass, in_axes=(0, 0, 0, 0, 0, None, 0, None))
    alphas = cfg.alpha_decay ** jnp.arange(cfg.n_alpha, dtype=dtype)

    X0_full, Uc0 = jax.jit(rollout_b)(x0_b, U0_b)
    d0 = jax.jit(lambda X, U: derivs_b(X[:, :-1], U, core.ks, lams[0], mu))(
        X0_full, Uc0)
    tg0, tH0 = jax.jit(lambda X: term_derivs_b(X[:, -1], lams[1], lams[2],
                                               mu))(X0_full)
    reg = jnp.full((B,), 1e-6, dtype)
    k0, K0 = jax.jit(lambda d, tg, tH: riccati_backward(*d, tg, tH, reg))(
        d0, tg0, tH0)
    k0 = k0.astype(dtype)
    K0 = K0.astype(dtype)

    def make_loop(do_derivs, do_term, do_ric, do_ls):
        def it(carry, _):
            X, U, cost = carry
            if do_derivs:
                derivs = derivs_b(X[:, :-1], U, core.ks, lams[0], mu)
            else:
                derivs = jax.tree.map(lambda a: a + 0.0 * cost[0], d0)
            if do_term:
                tg, tH = term_derivs_b(X[:, -1], lams[1], lams[2], mu)
            else:
                tg, tH = tg0 + 0.0 * cost[0], tH0
            if do_ric:
                kffs, Ks = riccati_backward(*derivs, tg, tH, reg)
                kffs = kffs.astype(dtype)
                Ks = Ks.astype(dtype)
            else:
                kffs = k0 + 0.0 * derivs[0][..., :5].sum() * 0
                Ks = K0
            if do_ls:
                Xc, Uc, cc = jax.vmap(
                    lambda a: fwd_b(X[:, 0], X, U, kffs, Ks, a, lams, mu))(
                        alphas)
                best = jnp.argmin(cc, axis=0)
                best_cost = jnp.take_along_axis(cc, best[None], axis=0)[0]
                bsel = best[:, None, None]
                X = jnp.take_along_axis(
                    jnp.moveaxis(Xc, 0, 1), bsel[..., None], axis=1)[:, 0]
                U = jnp.take_along_axis(
                    jnp.moveaxis(Uc, 0, 1), bsel[..., None], axis=1)[:, 0]
                cost = best_cost
            else:
                X = X + 1e-8 * kffs[:, 0, 0][:, None, None]
                cost = cost + kffs[:, 0, 0]
            return (X, U, cost), None

        def loop(X, U):
            (X, U, c), _ = jax.lax.scan(it, (X, U, jnp.zeros((B,), dtype)),
                                        None, length=N_ITERS)
            return X, U, c
        return jax.jit(loop)

    def timeit(fn, reps=3):
        out = fn(X0_full, Uc0)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(X0_full, Uc0)
        jax.block_until_ready(out[0])
        return (time.perf_counter() - t0) / reps * 1e3 / N_ITERS

    full = timeit(make_loop(1, 1, 1, 1))
    no_d = timeit(make_loop(0, 1, 1, 1))
    no_t = timeit(make_loop(1, 0, 1, 1))
    no_r = timeit(make_loop(1, 1, 0, 1))
    no_l = timeit(make_loop(1, 1, 1, 0))
    print(f"full iter          {full:7.3f} ms")
    print(f"- stage derivs     {no_d:7.3f}  (derivs cost ~{full-no_d:.3f})")
    print(f"- terminal derivs  {no_t:7.3f}  (term cost   ~{full-no_t:.3f})")
    print(f"- riccati          {no_r:7.3f}  (riccati+layout ~{full-no_r:.3f})")
    print(f"- line search      {no_l:7.3f}  (LS cost     ~{full-no_l:.3f})")


if __name__ == "__main__":
    main()
