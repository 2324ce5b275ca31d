"""Component timing of the generic (non-flagship) batched lanes path.

For each formulation that lacks dedicated fused kernels, times the pieces of
one iLQR iteration at a given batch so optimization effort goes where the
milliseconds are.  Run on the TPU:

    python scripts/profile_generic.py [batch] [name ...]
"""

import sys
import time
import os

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import jax
import jax.numpy as jnp

from bench_controllers import problems, N


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def profile_one(name, mpc, x0_b, params):
    from mmmpc_tpu.solver.al_ilqr import build_core, rollout
    from mmmpc_tpu.ops.riccati import riccati_backward_bm

    ocp = mpc.ocp
    cfg = mpc.solver_config
    dtype = jnp.float32
    params = dict(params, U_last=jnp.zeros((N, ocp.nu), dtype))
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    core = build_core(ocp, params, cfg, dtype)
    B = x0_b.shape[0]
    x0_bm = jnp.asarray(x0_b, dtype).T
    U0_bm = jnp.zeros((N, ocp.nu, B), dtype)

    rollout_bm = jax.jit(jax.vmap(lambda x0, U: rollout(ocp, x0, U, params),
                                  in_axes=(-1, -1), out_axes=-1))
    X_bm, Uc_bm = rollout_bm(x0_bm, U0_bm)
    jax.block_until_ready(X_bm)

    lams = (jnp.zeros((N, core.nc, B), dtype),
            jnp.zeros((core.nct, B), dtype),
            jnp.zeros((core.ne, B), dtype))
    mu = jnp.asarray(10.0, dtype)
    reg = jnp.full((B,), 1e-6, dtype)

    derivs_bm = jax.jit(jax.vmap(
        jax.vmap(core.stage_derivs, in_axes=(0, 0, 0, 0, None)),
        in_axes=(-1, -1, None, -1, None), out_axes=-1))
    term_derivs_bm = jax.jit(jax.vmap(core.terminal_derivs,
                                      in_axes=(-1, -1, -1, None),
                                      out_axes=-1))
    derivs = derivs_bm(X_bm[:-1], Uc_bm, core.ks, lams[0], mu)
    term_g, term_H = term_derivs_bm(X_bm[-1], lams[1], lams[2], mu)
    jax.block_until_ready(term_g)

    ric = jax.jit(lambda d, tg, tH, r: riccati_backward_bm(*d, tg, tH, r))
    kffs, Ks = ric(derivs, term_g, term_H, reg)
    jax.block_until_ready(kffs)
    kffs = kffs.astype(dtype)
    Ks = Ks.astype(dtype)

    fwd_ls = ocp.lanes_fwd_factory(cfg)
    has_term = getattr(fwd_ls, "includes_terminal", False)
    if has_term:
        fl = jax.jit(lambda X, U, kf, K, l0, l1, l2: fwd_ls(
            X, U, kf, K, l0, l1, l2, mu, params))
        out = fl(X_bm[:-1], Uc_bm, kffs, Ks, *lams)
        t_fwd_fn = lambda: fl(X_bm[:-1], Uc_bm, kffs, Ks, *lams)
    else:
        fl = jax.jit(lambda X, U, kf, K, l0: fwd_ls(
            X, U, kf, K, l0, mu, params))
        out = fl(X_bm[:-1], Uc_bm, kffs, Ks, lams[0])
        t_fwd_fn = lambda: fl(X_bm[:-1], Uc_bm, kffs, Ks, lams[0])
    jax.block_until_ready(out[0])

    al_total_bm = jax.jit(jax.vmap(core.al_total,
                                   in_axes=(-1, -1, (-1, -1, -1), None)),
                          static_argnums=())
    c0 = al_total_bm(X_bm, Uc_bm, lams, mu)
    jax.block_until_ready(c0)

    eval_con_bm = jax.jit(jax.vmap(core.eval_constraints, in_axes=(-1, -1),
                                   out_axes=-1))
    cons = eval_con_bm(X_bm, Uc_bm)
    jax.block_until_ready(cons[0])

    t_derivs = timeit(lambda: derivs_bm(X_bm[:-1], Uc_bm, core.ks,
                                        lams[0], mu))
    t_term = timeit(lambda: term_derivs_bm(X_bm[-1], lams[1], lams[2], mu))
    t_ric = timeit(lambda: ric(derivs, term_g, term_H, reg))
    t_fwd = timeit(t_fwd_fn)
    t_al = timeit(lambda: al_total_bm(X_bm, Uc_bm, lams, mu))
    t_con = timeit(lambda: eval_con_bm(X_bm, Uc_bm))
    t_roll = timeit(lambda: rollout_bm(x0_bm, U0_bm))

    n_iters = cfg.ilqr_iters + (cfg.al_iters - 1) * (
        cfg.ilqr_iters_later if cfg.ilqr_iters_later is not None
        else cfg.ilqr_iters)
    per_iter = t_derivs + t_term + t_ric + t_fwd
    print(f"== {name}  batch={B} nx={ocp.nx} nu={ocp.nu} nc={core.nc} "
          f"nct={core.nct} ne={core.ne}  (ms)")
    print(f"  stage derivs   {t_derivs:8.3f}")
    print(f"  term derivs    {t_term:8.3f}")
    print(f"  riccati bwd    {t_ric:8.3f}")
    print(f"  fwd+linesearch {t_fwd:8.3f}  (term fused: {has_term})")
    print(f"  al_total       {t_al:8.3f}  x {cfg.al_iters}")
    print(f"  eval_con       {t_con:8.3f}  x {cfg.al_iters}")
    print(f"  rollout        {t_roll:8.3f}  x 1")
    pred = per_iter * n_iters + (t_al + t_con) * cfg.al_iters + t_roll
    print(f"  per-iter {per_iter:.3f} x {n_iters} iters -> predicted "
          f"{pred:.1f} ms  ({B / pred * 1000:.0f} solves/s)")
    sys.stdout.flush()


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    names = set(sys.argv[2:])
    for name, mpc, x0_b, params in problems(batch):
        if names and name not in names:
            continue
        profile_one(name, mpc, x0_b, params)


if __name__ == "__main__":
    main()
