"""Compare hand wedge_slack and selfcol_rows against AD twins elementwise."""
import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")

from mmmpc_tpu.models.arm import arm_fk
from mmmpc_tpu.ocp.constraints import (
    halfplane_union_g, manipulator_sample_points, relu_max, self_collision_g)
from mmmpc_tpu.ops import generic_bwd as gb
import mmmpc_tpu.ops.generic_bwd as gb_mod
from mmmpc_tpu.utils.configs import SolverConfig

F32 = jnp.float32
B, N = 1024, 5

from mmmpc_tpu.controllers import MPCManipulator3DoF
from mmmpc_tpu.models.robots import ManipulatorPanda3DoF
cfg = SolverConfig(al_iters=2, ilqr_iters=4, n_alpha=3, alpha_decay=0.4,
                   scan_unroll=5)
mpc = MPCManipulator3DoF(
    ManipulatorPanda3DoF(0.1),
    [np.array([[1 / np.sqrt(2), 0, 1 / np.sqrt(2)]]),
     np.array([[-1 / np.sqrt(2), 0, 1 / np.sqrt(2)]])],
    np.array([0.0, 0.0, 0.35]), N=N, solver_config=cfg)
params = dict(mpc.make_params(np.zeros((N + 1, 3)), np.zeros((N, 3))),
              U_last=jnp.zeros((N, 3), F32))
params = jax.tree.map(lambda a: jnp.asarray(a, F32), params)

rng = np.random.default_rng(13)
q0 = np.array([0.3, -1.2, 1.2])
Q = jnp.asarray(np.clip(q0[None] + rng.standard_normal((B, 3)) * 0.4,
                        mpc.qlim[0] + 1e-3, mpc.qlim[1] - 1e-3), F32)

# AD twins
def f_slack(q):
    ee, j2, j3 = arm_fk(q)
    pts = manipulator_sample_points(ee, j2, j3)
    return relu_max(halfplane_union_g(pts, params["hp_points"],
                                      params["hp_normals"],
                                      params["hp_mask"], expand=0.0))

def f_selfcol(q):
    ee, j2, j3 = arm_fk(q)
    return self_collision_g(ee, j2, j3)

sv_ad, sg_ad = jax.vmap(jax.value_and_grad(f_slack))(Q)
scv_ad = jax.vmap(f_selfcol)(Q)
scj_ad = jax.vmap(jax.jacfwd(f_selfcol))(Q)

# hand twins, via captured hooks internals: re-create them by calling the
# factory's closures through stage_quad with zero weights is awkward; instead
# re-import the module-level functions by re-executing lanes_bwd_factory and
# capturing through make_generic_bwd_fused.
captured = {}
orig = gb_mod.make_generic_bwd_fused
gb_mod.make_generic_bwd_fused = lambda **kw: captured.update(kw) or orig(**kw)
mpc.ocp.lanes_bwd_factory(cfg)
gb_mod.make_generic_bwd_fused = orig
hooks = captured["hooks"]

smem = {}
packed = hooks.pack(params)
for nm, shape in hooks.smem_shapes.items():
    smem[nm] = jnp.asarray(packed[nm], F32).reshape(shape)

# stage_quad with Q=R=M=0 weights isolates PHR rows; instead directly probe
# by monkeypatching: easiest is evaluate stage_quad and extract cons rows
# (selfcol rows are last 4) and compare; the slack shows up in lx via
# SLACK_WEIGHT so compare lx with weights zeroed except slack.
smem0 = dict(smem)
for w in ("Q", "R", "M", "P"):
    smem0[w] = jnp.zeros_like(smem[w])

def tiles(a):
    return [a[:, i].reshape(8, 128) for i in range(a.shape[1])]

def flat(t):
    return np.asarray(jnp.broadcast_to(gb._as_tile(t), (8, 128)).reshape(-1))

xk = tiles(Q)
uk = [jnp.zeros((8, 128), F32)] * 3
lx, lu, lxx, luu, lux, cons = hooks.stage_quad(xk, uk, smem0, 0)
two_s = 2.0 / cfg.cost_scale

# with zero weights, lx = two_s * SLACK_WEIGHT * smax * sq
for i in range(3):
    hand = flat(lx[i]) / (two_s * 1e6)
    ad = np.asarray(sv_ad * sg_ad[:, i])
    d = np.abs(hand - ad)
    b = int(d.argmax())
    print(f"slack smax*sq[{i}]: maxdiff {d.max():.3e} at b={b} "
          f"hand={hand[b]:.6f} ad={ad[b]:.6f} q={np.asarray(Q[b])} "
          f"smax={float(sv_ad[b]):.6f}")

# selfcol rows: cons rows 12..16 -> (val, gq, gu)
for r in range(4):
    val, gq, gu = cons[12 + r]
    dv = np.abs(flat(val) - np.asarray(scv_ad[:, r]))
    b = int(dv.argmax())
    print(f"selfcol val[{r}]: maxdiff {dv.max():.3e} at b={b}")
    for i in range(3):
        dg = np.abs(flat(gq[i]) - np.asarray(scj_ad[:, r, i]))
        b = int(dg.argmax())
        print(f"  selfcol gq[{r}][{i}]: maxdiff {dg.max():.3e} at b={b} "
              f"hand={flat(gq[i])[b]:.6f} ad={float(scj_ad[b, r, i]):.6f} "
              f"q={np.asarray(Q[b])}")
