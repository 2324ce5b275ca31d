"""Localize the arm fused-backward parity failure: evaluate the BwdHooks
stage_quad/term_quad directly (outside Pallas) on (8,128) tiles and diff every
block against the structured AL expansion (core.stage_derivs)."""

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from mmmpc_tpu.solver.al_ilqr import build_core, rollout
from mmmpc_tpu.utils.configs import SolverConfig
from mmmpc_tpu.ops import generic_bwd as gb

B, N = 1024, 5
F32 = jnp.float32
CART = len(sys.argv) > 1 and sys.argv[1] == "cart"


def _arm_problem(cartesian=False):
    from mmmpc_tpu.controllers import MPCManipulator3DoF
    from mmmpc_tpu.models.robots import ManipulatorPanda3DoF
    cfg = SolverConfig(al_iters=2, ilqr_iters=4, n_alpha=3, alpha_decay=0.4,
                       scan_unroll=5)
    mpc = MPCManipulator3DoF(
        ManipulatorPanda3DoF(0.1),
        [np.array([[1 / np.sqrt(2), 0, 1 / np.sqrt(2)]]),
         np.array([[-1 / np.sqrt(2), 0, 1 / np.sqrt(2)]])],
        np.array([0.0, 0.0, 0.35]), N=N, is_cartesian_ref=cartesian,
        solver_config=cfg)
    rng = np.random.default_rng(13)
    q0 = np.array([0.3, -1.2, 1.2])
    x0_b = jnp.asarray(np.clip(
        q0[None] + rng.standard_normal((B, 3)) * 0.2,
        mpc.qlim[0] + 1e-3, mpc.qlim[1] - 1e-3), F32)
    U0_b = jnp.asarray(0.3 * rng.standard_normal((B, N, 3)), F32)
    if cartesian:
        traj = np.linspace([0.45, 0.0, 0.5], [0.35, 0.0, 0.6], N + 1)
    else:
        traj = np.linspace(q0, [0.0, -0.6, 0.9], N + 1)
    params = dict(mpc.make_params(traj, np.zeros((N, 3))),
                  U_last=jnp.zeros((N, 3), F32))
    params = jax.tree.map(lambda a: jnp.asarray(a, F32), params)
    return mpc, cfg, x0_b, U0_b, params, rng


mpc, cfg, x0_b, U0_b, params, rng = _arm_problem(CART)
ocp = mpc.ocp
core = build_core(ocp, params, cfg, F32)
nc, nct, ne = core.nc, core.nct, core.ne
print("nc/nct/ne:", nc, nct, ne)
x0_bm = x0_b.T
U0_bm = jnp.transpose(U0_b, (1, 2, 0))
rollout_bm = jax.vmap(lambda x0, U: rollout(ocp, x0, U, params),
                      in_axes=(-1, -1), out_axes=-1)
X_bm, Uc_bm = rollout_bm(x0_bm, U0_bm)
lams = (jnp.asarray(np.abs(rng.standard_normal((N, nc, B))) * 0.3, F32),
        jnp.asarray(np.abs(rng.standard_normal((nct, B))) * 0.3, F32),
        jnp.asarray(rng.standard_normal((ne, B)) * 0.3, F32) if ne else
        jnp.zeros((0, B), F32))
mu = jnp.asarray(10.0, F32)

derivs_bm = jax.vmap(
    jax.vmap(core.stage_derivs, in_axes=(0, 0, 0, 0, None)),
    in_axes=(-1, -1, None, -1, None), out_axes=-1)
term_derivs_bm = jax.vmap(core.terminal_derivs,
                          in_axes=(-1, -1, -1, None), out_axes=-1)
lx_r, lu_r, lxx_r, luu_r, lux_r, A_r, B_r = derivs_bm(
    X_bm[:-1], Uc_bm, core.ks, lams[0], mu)
tg_r, tH_r = term_derivs_bm(X_bm[-1], lams[1], lams[2], mu)

# ---- hand hooks, evaluated directly on tiles ----
hooks = None
# rebuild the factory's hooks by calling lanes_bwd_factory but capturing hooks
import mmmpc_tpu.ops.generic_bwd as gb_mod
orig = gb_mod.make_generic_bwd_fused
captured = {}


def capture(**kw):
    captured.update(kw)
    return orig(**kw)


gb_mod.make_generic_bwd_fused = capture
ocp.lanes_bwd_factory(cfg)
gb_mod.make_generic_bwd_fused = orig
hooks = captured["hooks"]

smem = {}
packed = hooks.pack(params)
for nm, shape in hooks.smem_shapes.items():
    smem[nm] = jnp.asarray(packed[nm], F32).reshape(shape)


def tiles(a):            # (n, B) -> list of (8,128)
    return [a[i].reshape(8, 128) for i in range(a.shape[0])]


def flat(t):             # (8,128)-or-scalar -> (B,)
    return jnp.broadcast_to(gb._as_tile(t), (8, 128)).reshape(-1)


nx, nu = 3, 3
for k in range(N):
    xk = tiles(X_bm[k])
    uk = tiles(Uc_bm[k])
    lam = tiles(lams[0][k])
    lx, lu, lxx, luu, lux, cons = hooks.stage_quad(xk, uk, smem, k)
    gb_mod._al_rows_stage(cons, lam, mu, lx, lu, lxx, luu, lux, nx, nu)
    for name, hand, ref in [
        ("lx", lx, lx_r[k]), ("lu", lu, lu_r[k])]:
        for i in range(3):
            d = np.abs(np.asarray(flat(hand[i]) - ref[i]))
            if d.max() > 3e-4:
                b = int(d.argmax())
                print(f"k={k} {name}[{i}] maxdiff {d.max():.3e} at b={b} "
                      f"hand={float(flat(hand[i])[b]):.6f} "
                      f"ref={float(ref[i, b]):.6f} x={np.asarray(X_bm[k,:,b])}")
    for name, hand, ref in [
        ("lxx", lxx, lxx_r[k]), ("luu", luu, luu_r[k]), ("lux", lux, lux_r[k])]:
        for i in range(3):
            for j in range(3):
                d = np.abs(np.asarray(flat(hand[i][j]) - ref[i, j]))
                if d.max() > 3e-4:
                    b = int(d.argmax())
                    print(f"k={k} {name}[{i}][{j}] maxdiff {d.max():.3e} "
                          f"at b={b} hand={float(flat(hand[i][j])[b]):.6f} "
                          f"ref={float(ref[i, j, b]):.6f}")

xt = tiles(X_bm[-1])
gx, Hxx, cons_t, eqs = hooks.term_quad(xt, smem)
lamt = tiles(lams[1])
lame = tiles(lams[2]) if ne else []
gb_mod._al_rows_term(cons_t, eqs, lamt, lame, mu, gx, Hxx, nx)
for i in range(3):
    d = np.abs(np.asarray(flat(gx[i]) - tg_r[i]))
    if d.max() > 3e-4:
        b = int(d.argmax())
        print(f"term gx[{i}] maxdiff {d.max():.3e} at b={b} "
              f"x={np.asarray(X_bm[-1,:,b])}")
    for j in range(3):
        d = np.abs(np.asarray(flat(Hxx[i][j]) - tH_r[i, j]))
        if d.max() > 3e-4:
            b = int(d.argmax())
            print(f"term Hxx[{i}][{j}] maxdiff {d.max():.3e} at b={b}")
print("done")
