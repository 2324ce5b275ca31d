"""Pallas TPU kernel factory: fused AL-expansion + Riccati backward sweep
for ANY OCP, expressed through small tile-level hooks — the backward twin of
ops/generic_fwd.py.

ops/wholebody_bwd.py fuses the stage-derivative assembly into the backward
sweep for the flagship qref formulation; the remaining controllers ran the
vmapped structured expansion (solver/al_ilqr.py stage_derivs) whose blocks —
~(nx+nu)^2 + 2 nx nu floats per (scenario, stage) — round-trip through HBM
into ops/riccati.py every iteration, and whose dense A/B matrices make the
in-kernel A^T Vxx A contraction pay for entries that are structurally zero.
This factory gives every formulation the qref treatment, exactly once:

- hooks emit the per-stage quadratic model and the constraint rows as Python
  lists whose entries are literal floats or (8, 128) tiles (batch on lanes);
  the constant-folding entry algebra and the Riccati stage step (shared
  with ops/wholebody_bwd via ops/entry_algebra — ONE implementation for
  both backward kernels since round 5) skip literal zeros at trace time,
  so a sparse dynamics Jacobian or a box-row gradient costs only its live
  entries;
- the factory owns all PHR augmented-Lagrangian bookkeeping (t = max(0,
  lam + mu c), gradient += c_x^T t, Hessian += mu act c_x c_x^T — the exact
  semantics of the controllers' stage_al_expansion / terminal_al_expansion),
  the Riccati recursion with its unrolled lanes Cholesky, and the grid /
  block-spec plumbing; masked rows (literal values <= NEG_BIG) are skipped
  outright since their PHR projection is identically zero;
- the terminal expansion (tracking + terminal inequality + equality rows)
  initializes the value function in-kernel from the x_N tiles.

Parity vs the vmapped structured-expansion + ops/riccati.py path (which is
itself AD-verified in tests/test_hand_jacobians.py) is asserted per
controller in tests/test_generic_bwd.py, interpreter mode on CPU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmmpc_tpu.ops.entry_algebra import (  # shared entry algebra (round 5)
    _add, _as_tile, _dot, _mul, _zero, riccati_stage,
)
from mmmpc_tpu.ops.wholebody_bwd import _relu_max_grad  # noqa: F401

SUB, LANE = 8, 128
LANES = SUB * LANE

# Set True to run kernels through the pallas interpreter (CPU testing).
INTERPRET = False

NEG_BIG = -1e9
_MASKED = -1e8      # literal row values at or below this are masked rows


@dataclasses.dataclass
class BwdHooks:
    """Tile-level description of one OCP for the fused backward kernel.

    ``x``/``u`` are lists of (8, 128) float32 tiles (component-major, batch
    on lanes); ``smem`` is a dict name -> SMEM ref as declared in
    ``smem_shapes``; ``g`` is the stage index (a grid scalar usable for SMEM
    row indexing).  Entries of every returned list may be Python floats —
    the assembly folds them at trace time.

    stage_quad -> (lx, lu, lxx, luu, lux, cons): the *scaled* (inv_scale
    applied by the hook, matching stage_al_expansion) gradient and GN-Hessian
    of the smooth stage cost, plus ``cons`` = list of nc rows
    (val, gx[nx], gu[nu]) for the stage inequalities in the OCP's row order.

    term_quad -> (gx, Hxx, cons_t, eqs): same for the terminal cost;
    ``cons_t`` rows are (val, gx[nx]); ``eqs`` rows are (h, gx[nx]).
    """

    nc: int
    nct: int
    ne: int
    smem_shapes: Dict[str, Tuple[int, ...]]
    pack: Callable
    dyn_jac: Callable     # (x, u, smem, g) -> (A[nx][nx], Bm[nx][nu])
    stage_quad: Callable  # (x, u, smem, g) -> (lx, lu, lxx, luu, lux, cons)
    term_quad: Callable   # (x, smem) -> (gx, Hxx, cons_t, eqs)
    # Optional VMEM sweep carry — the BACKWARD twin of generic_fwd's
    # incremental-trig protocol: carry_init(xt, smem) evaluates the trig of
    # the TERMINAL state once; carry_retreat(carry, x, u, smem) rotates it
    # back by this stage's dt*(input-rate) deltas (valid because X is the
    # open-loop rollout of U).  With n_carry set, ``term_quad`` receives
    # the terminal carry and ``stage_quad``/``dyn_jac`` receive this
    # stage's carry as an extra trailing argument.
    n_carry: int = 0
    carry_init: Callable = None
    carry_retreat: Callable = None


def _masked(val):
    return val is None or (isinstance(val, (int, float)) and val <= _MASKED)


def _al_rows_stage(cons, lam, mu, lx, lu, lxx, luu, lux, nx, nu):
    """PHR assembly of inequality rows into the stage quadratic model
    (the exact algebra of the controllers' stage_al_expansion)."""
    for r, (val, gx_c, gu_c) in enumerate(cons):
        if _masked(val):
            continue
        t = jnp.maximum(lam[r] + mu * val, 0.0)
        act = (t > 0).astype(jnp.float32)
        mua = mu * act
        for i in range(nx):
            if not _zero(gx_c[i]):
                lx[i] = _add(lx[i], _mul(t, gx_c[i]))
                for j in range(i + 1):
                    h = _mul(mua, _mul(gx_c[i], gx_c[j]))
                    lxx[i][j] = _add(lxx[i][j], h)
                    if j != i:
                        lxx[j][i] = _add(lxx[j][i], h)
        for i in range(nu):
            if not _zero(gu_c[i]):
                lu[i] = _add(lu[i], _mul(t, gu_c[i]))
                for j in range(i + 1):
                    h = _mul(mua, _mul(gu_c[i], gu_c[j]))
                    luu[i][j] = _add(luu[i][j], h)
                    if j != i:
                        luu[j][i] = _add(luu[j][i], h)
                for j in range(nx):
                    if not _zero(gx_c[j]):
                        lux[i][j] = _add(lux[i][j],
                                         _mul(mua, _mul(gu_c[i], gx_c[j])))


def _al_rows_term(cons_t, eqs, lamt, lame, mu, gx, Hxx, nx):
    """PHR terminal inequality rows + augmented equality rows."""
    for r, (val, gx_c) in enumerate(cons_t):
        if _masked(val):
            continue
        t = jnp.maximum(lamt[r] + mu * val, 0.0)
        act = (t > 0).astype(jnp.float32)
        mua = mu * act
        for i in range(nx):
            if not _zero(gx_c[i]):
                gx[i] = _add(gx[i], _mul(t, gx_c[i]))
                for j in range(i + 1):
                    h = _mul(mua, _mul(gx_c[i], gx_c[j]))
                    Hxx[i][j] = _add(Hxx[i][j], h)
                    if j != i:
                        Hxx[j][i] = _add(Hxx[j][i], h)
    for r, (h_val, gx_c) in enumerate(eqs):
        t = lame[r] + mu * h_val
        for i in range(nx):
            if not _zero(gx_c[i]):
                gx[i] = _add(gx[i], _mul(t, gx_c[i]))
                for j in range(i + 1):
                    h = _mul(mu, _mul(gx_c[i], gx_c[j]))
                    Hxx[i][j] = _add(Hxx[i][j], h)
                    if j != i:
                        Hxx[j][i] = _add(Hxx[j][i], h)


# _riccati_stage now lives in ops/entry_algebra.py (round-5
# consolidation with ops/wholebody_bwd.py) as ``riccati_stage``.


def make_generic_bwd_fused(*, nx, nu, N, hooks: BwdHooks, interpret=False):
    """Build the fused backward sweep for one OCP described by hooks.

    Returns ``bwd(X_bm (N+1,nx,B), U_bm (N,nu,B), lam_stage (N,nc,B),
    lam_term (nct,B), lam_eq (ne,B), mu, reg (B,), params)
    -> (kff (N,nu,B), K (N,nu,nx,B))`` — plug-compatible with
    solver/batched._solve_batched_lanes (ocp.lanes_bwd_factory contract).
    """
    nc, nct, ne = hooks.nc, hooks.nct, hooks.ne
    smem_names = list(hooks.smem_shapes.keys())
    f32 = jnp.float32

    def kernel(*refs):
        i = 0
        mu_ref = refs[i]; i += 1
        smem = {}
        for nm in smem_names:
            smem[nm] = refs[i]; i += 1
        X_in = refs[i]; U_in = refs[i + 1]; i += 2
        lam_in = lamt_in = lame_in = None
        if nc:
            lam_in = refs[i]; i += 1
        Xterm_in = refs[i]; i += 1
        if nct:
            lamt_in = refs[i]; i += 1
        if ne:
            lame_in = refs[i]; i += 1
        reg_in = refs[i]; i += 1
        if hooks.n_carry:
            kff_out, K_out, Vx_s, Vxx_s, carry_s = refs[i:i + 5]
        else:
            kff_out, K_out, Vx_s, Vxx_s = refs[i:i + 4]

        g = pl.program_id(1)
        k = N - 1 - g           # the stage this grid step processes
        mu = mu_ref[0, 0]

        def ld(ref, n):
            arr = ref[0][..., 0, :, :]
            return [arr[r] for r in range(n)]

        def ld_term(ref, n):
            arr = ref[...][..., 0, :, :]
            return [arr[r] for r in range(n)]

        @pl.when(g == 0)
        def _():
            xt = ld_term(Xterm_in, nx)
            if hooks.n_carry:
                ct = hooks.carry_init(xt, smem)
                for r in range(hooks.n_carry):
                    carry_s[r] = ct[r]
                gx, Hxx, cons_t, eqs = hooks.term_quad(xt, smem, ct)
            else:
                gx, Hxx, cons_t, eqs = hooks.term_quad(xt, smem)
            assert len(cons_t) == nct, (len(cons_t), nct)
            assert len(eqs) == ne, (len(eqs), ne)
            lamt = ld_term(lamt_in, nct) if nct else []
            lame = ld_term(lame_in, ne) if ne else []
            _al_rows_term(cons_t, eqs, lamt, lame, mu, gx, Hxx, nx)
            for i_ in range(nx):
                Vx_s[i_] = _as_tile(gx[i_])
                for j_ in range(nx):
                    Vxx_s[i_, j_] = _as_tile(Hxx[i_][j_])

        xk = ld(X_in, nx)
        uk = ld(U_in, nu)
        lam = ld(lam_in, nc) if nc else []

        if hooks.n_carry:
            c_next = [carry_s[r] for r in range(hooks.n_carry)]
            c_k = hooks.carry_retreat(c_next, xk, uk, smem)
            for r in range(hooks.n_carry):
                carry_s[r] = c_k[r]
            lx, lu, lxx, luu, lux, cons = hooks.stage_quad(
                xk, uk, smem, k, c_k)
            assert len(cons) == nc, (len(cons), nc)
            _al_rows_stage(cons, lam, mu, lx, lu, lxx, luu, lux, nx, nu)
            A, Bm = hooks.dyn_jac(xk, uk, smem, k, c_k)
        else:
            lx, lu, lxx, luu, lux, cons = hooks.stage_quad(xk, uk, smem, k)
            assert len(cons) == nc, (len(cons), nc)
            _al_rows_stage(cons, lam, mu, lx, lu, lxx, luu, lux, nx, nu)
            A, Bm = hooks.dyn_jac(xk, uk, smem, k)

        Vx = [Vx_s[i_] for i_ in range(nx)]
        Vxx = [[Vxx_s[i_, j_] for j_ in range(nx)] for i_ in range(nx)]
        reg = reg_in[0]
        kff, K, Vx_n, Vxx_n = riccati_stage(
            lx, lu, lxx, luu, lux, A, Bm, Vx, Vxx, reg, nx, nu)

        for i_ in range(nx):
            Vx_s[i_] = Vx_n[i_]
            for j_ in range(nx):
                Vxx_s[i_, j_] = 0.5 * (Vxx_n[i_][j_] + Vxx_n[j_][i_])
        for i_ in range(nu):
            kff_out[0, i_, 0] = kff[i_]
            for j_ in range(nx):
                K_out[0, i_, j_, 0] = K[i_][j_]

    def smem_spec(shape):
        return pl.BlockSpec(shape, lambda b, g: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    def vspec(trail):
        blk = (1,) + trail + (1, SUB, LANE)

        def imap(b, g):
            return (N - 1 - g,) + (0,) * len(trail) + (b, 0, 0)

        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def vspec_term(lead):
        blk = lead + (1, SUB, LANE)

        def imap(b, g):
            return (0,) * len(lead) + (b, 0, 0)

        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def bwd(X_bm, U_bm, lam_bm, lamt_bm, lame_bm, mu, reg, params):
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
        ops += [tile(X_bm[:-1]), tile(U_bm)]
        in_specs += [vspec((nx,)), vspec((nu,))]
        if nc:
            ops.append(tile(lam_bm))
            in_specs.append(vspec((nc,)))
        ops.append(tile(X_bm[-1]))
        in_specs.append(vspec_term((nx,)))
        if nct:
            ops.append(tile(lamt_bm))
            in_specs.append(vspec_term((nct,)))
        if ne:
            ops.append(tile(lame_bm))
            in_specs.append(vspec_term((ne,)))
        reg_b = jnp.broadcast_to(jnp.asarray(reg, f32), (Bsz,))
        ops.append(tile(reg_b))
        in_specs.append(vspec_term(()))

        out_specs = [vspec((nu,)), vspec((nu, nx))]
        out_shape = [
            jax.ShapeDtypeStruct((N, nu, nb, SUB, LANE), f32),
            jax.ShapeDtypeStruct((N, nu, nx, nb, SUB, LANE), f32),
        ]

        kff_t, K_t = pl.pallas_call(
            kernel,
            grid=(nb, N),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=(
                [pltpu.VMEM((nx, SUB, LANE), f32),
                 pltpu.VMEM((nx, nx, SUB, LANE), f32)]
                + ([pltpu.VMEM((hooks.n_carry, SUB, LANE), f32)]
                   if hooks.n_carry else [])),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret or INTERPRET,
        )(*ops)

        return (kff_t.reshape(N, nu, Bsz), K_t.reshape(N, nu, nx, Bsz))

    return bwd
