"""Pallas TPU kernel factory: fused forward rollout + parallel line search
for ANY OCP, expressed through small tile-level hooks.

ops/wholebody_fwd.py fuses the iLQR forward pass for the flagship qref
formulation with its FK hand-inlined; the remaining controllers (demo 1-D,
base-only, arm-only, wholebody-endpoint — reference controllers/mpc_demo.py,
mpc_base.py, mpc_manipulator_3DoF.py, mpc_wholebody.py) previously ran the
vmapped lax.scan line search, which is HBM/launch-latency bound at their tiny
per-step working sets (2-9 states): the scan issues O(N) dependent steps whose
operands never fill a vector register.  This factory gives every formulation
the same fusion: one kernel walks the horizon once with the per-candidate
states, accumulated AL costs and all line-search step sizes resident in VMEM,
with the batch on the (8, 128) lanes.

A controller opts in by building :class:`LanesHooks` — four tile-level
callables (dynamics, stage cost+ineq, terminal cost+ineq+eq, param packing)
operating on *lists of (8, 128) tiles* (one tile per state/input component,
1024 scenarios per tile) plus SMEM refs for runtime parameters (weights,
references, obstacle geometry: the reference's ``opti.parameter`` mechanism,
mutable without recompilation).  All boilerplate — grid/block specs, control
clamping, the PHR augmented-Lagrangian penalty bookkeeping of
solver/al_ilqr.py (`_al_penalty_ineq`/`_al_penalty_eq`), candidate outputs and
the fused terminal cost — lives here, exactly once.

Semantics replicated (asserted per controller in tests/test_generic_fwd.py):

    u_k   = clamp(U_k + alpha * kff_k + K_k (x_k - X_k))
    cost += stage_cost(x_k, u_k) * inv_scale + PHR(stage_ineq, lam_k, mu)
    x_{k+1} = dyn(x_k, u_k)
    cost += terminal_cost(x_N) * inv_scale + PHR(terminal_ineq, lam_t, mu)
            + lam_e . h(x_N) + mu/2 ||h(x_N)||^2
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmmpc_tpu.models.arm import A2, A3, A5, A6, A7

SUB, LANE = 8, 128
LANES = SUB * LANE

# Set True to run kernels through the pallas interpreter (CPU testing).
INTERPRET = False

NEG_BIG = -1e9   # matches ocp/constraints._NEG_BIG (masked constraint rows)
EPS = 1e-9       # matches utils/math.safe_norm / safe_dist


@dataclasses.dataclass
class LanesHooks:
    """Tile-level description of one OCP for the fused forward kernel.

    ``x``/``u`` below are lists of (8, 128) float32 tiles (component-major,
    batch on lanes); ``smem`` is a dict name -> SMEM ref as declared in
    ``smem_shapes``; ``g`` is the stage index (a grid scalar, usable for
    SMEM row indexing like ``smem["X_ref"][g, i]``).  Constraint hooks may
    return Python-float constants (e.g. NEG_BIG for masked rows) — they
    broadcast against the multiplier tiles.
    """

    nc: int                                    # stage inequality rows
    nct: int                                   # terminal inequality rows
    ne: int                                    # terminal equality rows
    smem_shapes: Dict[str, Tuple[int, ...]]    # name -> (2-D/3-D) shape
    pack: Callable                             # params -> {name: array}
    dyn: Callable                              # (x, u) -> x_next tiles
    stage: Callable                            # (x, u, smem, g) -> (cost, [nc])
    terminal: Callable                         # (x, smem) -> (cost, [nct], [ne])
    # Optional VMEM rollout carry (incremental-trig protocol, round 5): a
    # formulation whose stage/terminal hooks need sin/cos of state angles
    # declares n_carry > 0 and supplies carry_init(x, smem) -> [n_carry
    # tiles] (evaluated ONCE at stage 0 — the only full transcendental
    # evaluation of the rollout) and carry_step(carry, x, u, smem) ->
    # next-stage carry (the angle-addition rotation of
    # ops/wholebody_fwd.py::_trig_advance).  With n_carry set, ``dyn``,
    # ``stage`` and ``terminal`` receive the carry as an extra trailing
    # argument: dyn(x, u, carry), stage(x, u, smem, g, carry),
    # terminal(x, smem, carry) — where ``terminal`` gets the carry of x_N.
    # Measured motivation: sin/cos cost ~50 FMA-slots each on the v5e VPU
    # (scripts/roofline.py --peak), the dominant hidden cost of trig-heavy
    # formulations (arm, endpoint).
    n_carry: int = 0
    carry_init: Callable = None
    carry_step: Callable = None


# ---------------------------------------------------------------------------
# Shared tile helpers for controller hooks
# ---------------------------------------------------------------------------

def qform_t(M_ref, e):
    """e^T M e with M an (n, n) SMEM weight matrix, e a list of n tiles."""
    n = len(e)
    acc = None
    for i in range(n):
        row = None
        for j in range(n):
            t = M_ref[i, j] * e[j]
            row = t if row is None else row + t
        t = e[i] * row
        acc = t if acc is None else acc + t
    return acc


def wrap_pi_t(a):
    """Tile wrap into [-pi, pi) — utils/math.wrap_to_pi."""
    return jnp.mod(a + math.pi, 2.0 * math.pi) - math.pi


def relu_max_t(gs):
    """relu(max over a list of tiles); [] -> 0.0 (empty-group guard)."""
    if not gs:
        return 0.0
    m = gs[0]
    for t in gs[1:]:
        m = jnp.maximum(m, t)
    return jnp.maximum(m, 0.0)


def ground_circles_t(px, py, obs_ref, n_obs, body_radius):
    """(r_obs + r_body) - dist tiles per ground obstacle row in SMEM
    (ocp/constraints.ground_circle_g)."""
    gs = []
    for o in range(n_obs):
        dx = px - obs_ref[o, 0]
        dy = py - obs_ref[o, 1]
        gs.append((obs_ref[o, 2] + body_radius)
                  - jnp.sqrt(dx * dx + dy * dy + EPS))
    return gs


def arm_trig_t(q1, q2, q3):
    """The 6 trig tiles of the arm FK: [s1, c1, st, ct, sb, cb] (sin/cos of
    q1, th = q1-q2, be = th-q3) — the incremental-trig carry for arm-frame
    formulations (LanesHooks.n_carry protocol)."""
    th = q1 - q2
    be = th - q3
    return [jnp.sin(q1), jnp.cos(q1), jnp.sin(th), jnp.cos(th),
            jnp.sin(be), jnp.cos(be)]


def arm_trig_advance_t(tr, du1, du2, du3):
    """Advance the arm trig carry across q += (du1, du2, du3) (already
    scaled by dt): exact angle-addition with small-angle sin/cos of the
    deltas (ops/wholebody_fwd.py::_sincos_small)."""
    from mmmpc_tpu.ops.wholebody_fwd import _rot, _sincos_small
    s1, c1, st, ct, sb, cb = tr
    sd, cd = _sincos_small(du1)
    s1, c1 = _rot(s1, c1, sd, cd)
    sd, cd = _sincos_small(du1 - du2)
    st, ct = _rot(st, ct, sd, cd)
    sd, cd = _sincos_small(du1 - du2 - du3)
    sb, cb = _rot(sb, cb, sd, cd)
    return [s1, c1, st, ct, sb, cb]


def arm_fk_from_trig_t(tr):
    """Arm-frame FK tiles (ee, j2, j3) from the trig carry — the same
    algebra as arm_fk_t with sin/cos factored out."""
    s1, c1, st, ct, sb, cb = tr
    x2 = A2 * s1 + A3 * c1
    z2 = A2 * c1 - A3 * s1
    x3 = x2 - A3 * ct + A5 * st
    z3 = z2 + A3 * st + A5 * ct
    xe = x3 + A6 * cb - A7 * sb
    ze = z3 - A6 * sb - A7 * cb
    return [xe, 0.0, ze], [x2, 0.0, z2], [x3, 0.0, z3]


def arm_fk_t(q1, q2, q3):
    """Arm-frame FK tiles: (ee, j2, j3), each [x, y, z] with y == 0.0
    (models/arm.arm_fk; reference manipulator_3DoF.py:10-77)."""
    return arm_fk_from_trig_t(arm_trig_t(q1, q2, q3))


def halfplane_union_t(points, hpo_ref, hpn_ref, hpm_ref, n_hp):
    """g_i = -max_j n_j . (o_j - p_i) per sampled point, with masked faces
    and the all-masked guard (ocp/constraints.halfplane_union_g; the face
    points in hpo_ref are already pushed out by the expansion margin)."""
    any_live = hpm_ref[0, 0]
    for f in range(1, n_hp):
        any_live = any_live + hpm_ref[f, 0]
    gs = []
    for p in points:
        dmax = None
        for f in range(n_hp):
            d = None
            for c in range(3):
                t = hpn_ref[f, c] * (hpo_ref[f, c] - p[c])
                d = t if d is None else d + t
            d = jnp.where(hpm_ref[f, 0] > 0, d, NEG_BIG)
            dmax = d if dmax is None else jnp.maximum(dmax, d)
        gs.append(jnp.where(any_live > 0, -dmax, NEG_BIG))
    return gs


def self_collision_t(ee, j2, j3, radius):
    """radius - ||p_check - ee|| tiles for the four reference check points
    (ocp/constraints.self_collision_g; first check is the frame origin)."""
    checks = (
        [0.0, 0.0, 0.0],
        [j2[c] * 0.5 for c in range(3)],
        j2,
        [(j2[c] + j3[c]) * 0.5 for c in range(3)],
    )
    out = []
    for chk in checks:
        d2 = EPS
        for c in range(3):
            dc = chk[c] - ee[c]
            d2 = d2 + dc * dc
        out.append(radius - jnp.sqrt(d2))
    return out


def sample_points_t(ee, j2, j3):
    """The six sampled link points (ocp/constraints.manipulator_sample_points
    — reference mpc_wholebody_qref.py:216-217)."""
    return (
        [j2[c] * 0.5 for c in range(3)],
        j2,
        [(j2[c] + j3[c]) * 0.5 for c in range(3)],
        j3,
        [(j3[c] + ee[c]) * 0.5 for c in range(3)],
        ee,
    )


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

def make_generic_fwd_linesearch(*, nx, nu, N, u_clamp, alphas, inv_scale,
                                hooks: LanesHooks, interpret=False):
    """Build the fused line-search rollout for one OCP described by hooks.

    Returns ``fwd(X_bm, U_bm, kff_bm, K_bm, lam_bm, lamt_bm, lame_bm, mu,
    params) -> (Xc (N, n_alpha, nx, B), Uc (N, n_alpha, nu, B),
    xlast (n_alpha, nx, B), cc (n_alpha, B))`` with all arrays batch-minor,
    B % 1024 == 0, and cc INCLUDING the terminal AL cost
    (``fwd.includes_terminal == True``) — plug-compatible with
    solver/batched._solve_batched_lanes.
    """
    n_alpha = len(alphas)
    alphas = tuple(float(a) for a in alphas)
    u_lo = tuple(float(v) for v in u_clamp[0])
    u_hi = tuple(float(v) for v in u_clamp[1])
    inv_scale = float(inv_scale)
    nc, nct, ne = hooks.nc, hooks.nct, hooks.ne
    smem_names = list(hooks.smem_shapes.keys())
    f32 = jnp.float32

    def kernel(*refs):
        i = 0
        mu_ref = refs[i]; i += 1
        smem = {}
        for nm in smem_names:
            smem[nm] = refs[i]; i += 1
        X_in = refs[i]; U_in = refs[i + 1]
        kff_in = refs[i + 2]; K_in = refs[i + 3]; i += 4
        lam_in = lamt_in = lame_in = None
        if nc:
            lam_in = refs[i]; i += 1
        if nct:
            lamt_in = refs[i]; i += 1
        if ne:
            lame_in = refs[i]; i += 1
        if hooks.n_carry:
            (Xc_out, Uc_out, xlast_out, cc_out, x_s, cost_s,
             carry_s) = refs[i:i + 7]
        else:
            Xc_out, Uc_out, xlast_out, cc_out, x_s, cost_s = refs[i:i + 6]

        g = pl.program_id(1)
        mu = mu_ref[0, 0]
        inv2mu = 0.5 / mu      # scalar: one divide instead of a tile divide

        def ld(ref, n):
            arr = ref[0][..., 0, :, :]
            return [arr[r] for r in range(n)]

        Xk = ld(X_in, nx)
        Uk = ld(U_in, nu)
        kffk = ld(kff_in, nu)
        Kk = K_in[0][..., 0, :, :]                # (nu, nx, SUB, LANE)
        lam = ld(lam_in, nc) if nc else []

        @pl.when(g == 0)
        def _():
            if hooks.n_carry:
                c0 = hooks.carry_init(Xk, smem)
            for a in range(n_alpha):
                for r in range(nx):
                    x_s[a, r] = Xk[r]
                if hooks.n_carry:
                    for r in range(hooks.n_carry):
                        carry_s[a, r] = c0[r]
                cost_s[a] = jnp.zeros((SUB, LANE), f32)

        for a in range(n_alpha):
            x = [x_s[a, r] for r in range(nx)]
            carry = ([carry_s[a, r] for r in range(hooks.n_carry)]
                     if hooks.n_carry else None)

            # control: feedforward + feedback, clamped to the static ulim
            u = []
            for r in range(nu):
                acc = Uk[r] + alphas[a] * kffk[r]
                for j in range(nx):
                    acc = acc + Kk[r, j] * (x[j] - Xk[j])
                if math.isfinite(u_lo[r]):
                    acc = jnp.maximum(acc, u_lo[r])
                if math.isfinite(u_hi[r]):
                    acc = jnp.minimum(acc, u_hi[r])
                u.append(acc)

            if hooks.n_carry:
                raw, gs = hooks.stage(x, u, smem, g, carry)
            else:
                raw, gs = hooks.stage(x, u, smem, g)
            stage = inv_scale * raw
            if nc:
                assert len(gs) == nc, (len(gs), nc)
                pen = None
                for r in range(nc):
                    t = jnp.maximum(lam[r] + mu * gs[r], 0.0)
                    term = t * t - lam[r] * lam[r]
                    pen = term if pen is None else pen + term
                stage = stage + pen * inv2mu
            cost_s[a] = cost_s[a] + stage

            if hooks.n_carry:
                xn = hooks.dyn(x, u, carry)
                carry_n = hooks.carry_step(carry, x, u, smem)
                for r in range(hooks.n_carry):
                    carry_s[a, r] = carry_n[r]
            else:
                xn = hooks.dyn(x, u)
            for r in range(nx):
                Xc_out[0, a, r, 0] = x[r]
            for r in range(nu):
                Uc_out[0, a, r, 0] = u[r]
            for r in range(nx):
                x_s[a, r] = xn[r]

            @pl.when(g == N - 1)
            def _():
                if hooks.n_carry:
                    rawN, gts, hts = hooks.terminal(xn, smem, carry_n)
                else:
                    rawN, gts, hts = hooks.terminal(xn, smem)
                cterm = cost_s[a] + inv_scale * rawN
                if nct:
                    assert len(gts) == nct, (len(gts), nct)
                    penN = None
                    for r in range(nct):
                        lt = lamt_in[r, 0]
                        t = jnp.maximum(lt + mu * gts[r], 0.0)
                        term = t * t - lt * lt
                        penN = term if penN is None else penN + term
                    cterm = cterm + penN * inv2mu
                if ne:
                    assert len(hts) == ne, (len(hts), ne)
                    for r in range(ne):
                        le = lame_in[r, 0]
                        cterm = (cterm + le * hts[r]
                                 + 0.5 * mu * hts[r] * hts[r])
                for r in range(nx):
                    xlast_out[a, r, 0] = xn[r]
                cc_out[a, 0] = cterm

    def smem_spec(shape):
        # whole-array SMEM blocks; per-stage rows read with the grid index
        return pl.BlockSpec(shape, lambda b, g: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    def vspec(trail):
        blk = (1,) + trail + (1, SUB, LANE)

        def imap(b, g):
            return (g,) + (0,) * len(trail) + (b, 0, 0)

        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def bspec(lead):
        # per-batch-block input with no stage axis (terminal multipliers)
        blk = lead + (1, SUB, LANE)

        def imap(b, g):
            return (0,) * len(lead) + (b, 0, 0)

        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def ospec_term(lead):
        blk = lead + (1, SUB, LANE)

        def imap(b, g):
            return (0,) * len(lead) + (b, 0, 0)

        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def fwd(X_bm, U_bm, kff_bm, K_bm, lam_bm, lamt_bm, lame_bm, mu, params):
        Bsz = X_bm.shape[-1]
        assert Bsz % LANES == 0, f"batch {Bsz} must be a multiple of {LANES}"
        nb = Bsz // LANES

        def tile(a):
            a = a.astype(f32)
            return a.reshape(a.shape[:-1] + (nb, SUB, LANE))

        packed = hooks.pack(params)
        ops = [jnp.asarray(mu, f32).reshape(1, 1)]
        in_specs = [smem_spec((1, 1))]
        for nm in smem_names:
            shape = hooks.smem_shapes[nm]
            ops.append(jnp.asarray(packed[nm], f32).reshape(shape))
            in_specs.append(smem_spec(shape))
        ops += [tile(X_bm), tile(U_bm), tile(kff_bm), tile(K_bm)]
        in_specs += [vspec((nx,)), vspec((nu,)), vspec((nu,)),
                     vspec((nu, nx))]
        if nc:
            ops.append(tile(lam_bm))
            in_specs.append(vspec((nc,)))
        if nct:
            ops.append(tile(lamt_bm))
            in_specs.append(bspec((nct,)))
        if ne:
            ops.append(tile(lame_bm))
            in_specs.append(bspec((ne,)))

        out_specs = [
            pl.BlockSpec((1, n_alpha, nx, 1, SUB, LANE),
                         lambda b, g: (g, 0, 0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_alpha, nu, 1, SUB, LANE),
                         lambda b, g: (g, 0, 0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            ospec_term((n_alpha, nx)),
            ospec_term((n_alpha,)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((N, n_alpha, nx, nb, SUB, LANE), f32),
            jax.ShapeDtypeStruct((N, n_alpha, nu, nb, SUB, LANE), f32),
            jax.ShapeDtypeStruct((n_alpha, nx, nb, SUB, LANE), f32),
            jax.ShapeDtypeStruct((n_alpha, nb, SUB, LANE), f32),
        ]

        Xc, Uc, xlast, cc = pl.pallas_call(
            kernel,
            grid=(nb, N),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=(
                [pltpu.VMEM((n_alpha, nx, SUB, LANE), f32),
                 pltpu.VMEM((n_alpha, SUB, LANE), f32)]
                + ([pltpu.VMEM((n_alpha, hooks.n_carry, SUB, LANE), f32)]
                   if hooks.n_carry else [])),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret or INTERPRET,
        )(*ops)

        return (Xc.reshape(N, n_alpha, nx, Bsz),
                Uc.reshape(N, n_alpha, nu, Bsz),
                xlast.reshape(n_alpha, nx, Bsz),
                cc.reshape(n_alpha, Bsz))

    fwd.includes_terminal = True
    return fwd
