"""Direct timing of the two Pallas kernels at the bench batch size."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from bench import build_problem, SOLVER_CFG, BATCH, N
from mmmpc_tpu.solver.al_ilqr import build_core, rollout

mpc, x0_b, U0_b, params = build_problem(BATCH)
ocp, cfg = mpc.ocp, SOLVER_CFG
dtype = jnp.float32
core = build_core(ocp, params, cfg, dtype)
B = x0_b.shape[0]
print("built", flush=True)

x0_bm = x0_b.T
U0_bm = jnp.transpose(U0_b, (1, 2, 0))
rollout_bm = jax.jit(jax.vmap(lambda x0, U: rollout(ocp, x0, U, params),
                              in_axes=(-1, -1), out_axes=-1))
X, Uc = rollout_bm(x0_bm, U0_bm)
jax.block_until_ready(X)
print("rollout done", flush=True)

nc, nct, ne = core.nc, core.nct, core.ne
lam_s = jnp.zeros((N, nc, B), dtype)
lam_t = jnp.zeros((nct, B), dtype)
lam_e = jnp.zeros((ne, B), dtype)
mu = jnp.asarray(10.0, dtype)
reg = jnp.full((B,), 1e-6, dtype)

def timeit(fn, *args, reps=50):
    out = fn(*args); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3

bwd = ocp.lanes_bwd_factory(cfg)
jbwd = jax.jit(lambda X, U, ls, lt, le, mu, reg: bwd(X, U, ls, lt, le,
                                                     mu, reg, params))
kffs, Ks = jbwd(X, Uc, lam_s, lam_t, lam_e, mu, reg)
print("bwd compiled", flush=True)
print("bwd_fused  ms:", timeit(jbwd, X, Uc, lam_s, lam_t, lam_e, mu, reg),
      flush=True)

fwd = ocp.lanes_fwd_factory(cfg)
jfwd = jax.jit(lambda X, U, k, K, ls, lt, le, mu: fwd(
    X[:-1], U, k, K, ls, lt, le, mu, params))
out = jfwd(X, Uc, kffs.astype(dtype), Ks.astype(dtype), lam_s, lam_t,
           lam_e, mu)
print("fwd compiled", flush=True)
print("fwd_ls     ms:", timeit(jfwd, X, Uc, kffs.astype(dtype),
                               Ks.astype(dtype), lam_s, lam_t, lam_e, mu),
      flush=True)

# selection glue
Xc, Ucand, xlast, cc = out
alphas_idx = jnp.arange(cfg.n_alpha)
def select(Xc, Ucand, xlast, cc):
    best = jnp.argmin(cc, axis=0)
    onehot = (alphas_idx[:, None] == best[None, :]).astype(dtype)
    X_stage = jnp.einsum("kaxb,ab->kxb", Xc, onehot)
    U_best = jnp.einsum("kaub,ab->kub", Ucand, onehot)
    x_last = jnp.einsum("axb,ab->xb", xlast, onehot)
    return X_stage, U_best, x_last, jnp.sum(cc * onehot, axis=0)
jsel = jax.jit(select)
s = jsel(Xc, Ucand, xlast, cc)
print("select     ms:", timeit(jsel, Xc, Ucand, xlast, cc), flush=True)

eval_con = jax.jit(jax.vmap(core.eval_constraints, in_axes=(-1, -1),
                            out_axes=-1))
c = eval_con(X, Uc)
print("eval_con   ms:", timeit(eval_con, X, Uc), flush=True)
print("rollout    ms:", timeit(rollout_bm, x0_bm, U0_bm), flush=True)
al_tot = jax.jit(jax.vmap(core.al_total, in_axes=(-1, -1, (-1, -1, -1),
                                                  None)))
o = al_tot(X, Uc, (lam_s, lam_t, lam_e), mu)
print("al_total   ms:", timeit(al_tot, X, Uc, (lam_s, lam_t, lam_e), mu),
      flush=True)
