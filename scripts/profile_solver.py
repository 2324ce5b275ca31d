"""Component-level timing of the batched AL-iLQR solve (bench problem).

Times each stage of one iLQR iteration in isolation at the bench batch size
so optimization effort goes where the milliseconds are.  Run on the TPU:

    python scripts/profile_solver.py
"""

import time

import jax
import jax.numpy as jnp

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, SOLVER_CFG, N, BATCH
from mmmpc_tpu.solver.al_ilqr import build_core, rollout
from mmmpc_tpu.ops.riccati import riccati_backward


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    mpc, x0_b, U0_b, params = build_problem(BATCH)
    ocp = mpc.ocp
    cfg = SOLVER_CFG
    dtype = jnp.float32
    core = build_core(ocp, params, cfg, dtype)
    B = x0_b.shape[0]

    rollout_b = jax.jit(jax.vmap(lambda x0, U: rollout(ocp, x0, U, params)))
    X_b, Uc_b = rollout_b(x0_b, U0_b)
    jax.block_until_ready(X_b)

    lams = (jnp.zeros((B, ocp.N, core.nc), dtype),
            jnp.zeros((B, core.nct), dtype),
            jnp.zeros((B, core.ne), dtype))
    mu = jnp.asarray(10.0, dtype)
    reg = jnp.full((B,), 1e-6, dtype)

    derivs_b = jax.jit(jax.vmap(jax.vmap(core.stage_derivs,
                                         in_axes=(0, 0, 0, 0, None)),
                                in_axes=(0, 0, None, 0, None)))
    term_derivs_b = jax.jit(jax.vmap(core.terminal_derivs,
                                     in_axes=(0, 0, 0, None)))
    derivs = derivs_b(X_b[:, :-1], Uc_b, core.ks, lams[0], mu)
    term_g, term_H = term_derivs_b(X_b[:, -1], lams[1], lams[2], mu)
    jax.block_until_ready(term_g)

    ric = jax.jit(lambda d, tg, tH, r: riccati_backward(*d, tg, tH, r))
    kffs, Ks = ric(derivs, term_g, term_H, reg)
    jax.block_until_ready(kffs)
    kffs = kffs.astype(dtype)
    Ks = Ks.astype(dtype)

    fwd_b = jax.vmap(core.fwd_pass, in_axes=(0, 0, 0, 0, 0, None, 0, None))
    alphas = cfg.alpha_decay ** jnp.arange(cfg.n_alpha, dtype=dtype)

    def linesearch(X, U, kffs, Ks, lams):
        Xc, Uc, cc = jax.vmap(
            lambda a: fwd_b(X[:, 0], X, U, kffs, Ks, a, lams, mu))(alphas)
        return Xc, Uc, cc

    ls = jax.jit(linesearch)
    out = ls(X_b, Uc_b, kffs, Ks, lams)
    jax.block_until_ready(out[0])

    eval_con_b = jax.jit(jax.vmap(core.eval_constraints))
    cons = eval_con_b(X_b, Uc_b)
    jax.block_until_ready(cons[0])

    t_rollout = timeit(rollout_b, x0_b, U0_b)
    t_derivs = timeit(lambda: derivs_b(X_b[:, :-1], Uc_b, core.ks,
                                       lams[0], mu))
    t_term = timeit(lambda: term_derivs_b(X_b[:, -1], lams[1], lams[2], mu))
    t_ric = timeit(lambda: ric(derivs, term_g, term_H, reg))
    t_ls = timeit(lambda: ls(X_b, Uc_b, kffs, Ks, lams))
    t_con = timeit(lambda: eval_con_b(X_b, Uc_b))

    n_iters = cfg.ilqr_iters + (cfg.al_iters - 1) * (
        cfg.ilqr_iters_later if cfg.ilqr_iters_later is not None
        else cfg.ilqr_iters)
    per_iter = t_derivs + t_term + t_ric + t_ls
    print(f"batch={B} N={N}  (all times ms)")
    print(f"open-loop rollout       {t_rollout:8.3f}  x {cfg.al_iters}")
    print(f"stage derivs            {t_derivs:8.3f}  per iter")
    print(f"terminal derivs         {t_term:8.3f}  per iter")
    print(f"riccati backward        {t_ric:8.3f}  per iter")
    print(f"line search ({cfg.n_alpha} alphas)  {t_ls:8.3f}  per iter")
    print(f"constraint eval         {t_con:8.3f}  x {cfg.al_iters}")
    print(f"--> per-iter total      {per_iter:8.3f}; "
          f"predicted solve {per_iter * n_iters + (t_rollout + t_con) * cfg.al_iters:8.1f}")


if __name__ == "__main__":
    main()
