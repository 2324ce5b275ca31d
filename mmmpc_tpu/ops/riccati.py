"""Pallas TPU kernel: batched Riccati backward sweep.

The iLQR backward pass is a sequential recursion over the horizon whose
per-step working set (Vx, Vxx and the stage expansion) is tiny.  Lowered
naively (lax.scan over jnp ops), every step round-trips Vxx and six small
batched matmuls through HBM and the whole sweep costs ~12 ms at batch 1024 —
the entire per-iteration budget of the solver.

This kernel restructures the computation for the VPU:

- **batch on lanes**: all stage quantities are laid out (..., 8, 128) so a
  scalar of the recursion is a full native f32 tile of 1024 scenarios; every
  multiply-add in the unrolled 5x5 Cholesky and the small matrix products
  runs 1024-wide;
- **VMEM-resident carry**: Vx/Vxx live in scratch across grid steps; the
  grid iterates the horizon *backward* (index_map k -> N-1-k) with stage
  blocks auto-pipelined HBM->VMEM by pallas while the previous step computes;
- contraction helpers express the 9x9 products as single broadcast-reduce
  jnp ops inside the kernel, so Mosaic sees a handful of tensor ops per
  stage instead of thousands of scalars.

Interface: standard (B, N, ...) batch-major arrays; B must be a multiple of
LANES (1024).  Equivalent to the pure-JAX backward pass in
solver/al_ilqr.py (asserted in tests/test_pallas_riccati.py, which runs the
kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
LANES = SUB * LANE  # scenarios per grid block

# Set True to run the kernel through the pallas interpreter (CPU testing).
INTERPRET = False


def _t(a):
    """(B, N, ...) -> (N, ..., nb, SUB, LANE): batch-minor tiled layout."""
    B = a.shape[0]
    nb = B // LANES
    perm = (1,) + tuple(range(2, a.ndim)) + (0,)
    a = jnp.transpose(a, perm)                      # (N, ..., B)
    return a.reshape(a.shape[:-1] + (nb, SUB, LANE))


def _t_term(a):
    """(B, ...) -> (..., nb, SUB, LANE)."""
    B = a.shape[0]
    nb = B // LANES
    perm = tuple(range(1, a.ndim)) + (0,)
    a = jnp.transpose(a, perm)
    return a.reshape(a.shape[:-1] + (nb, SUB, LANE))


def _back(a, B):
    """(N, ..., 1?, SUB, LANE)->... inverse of _t per-block handled outside;
    here (N, ..., B) -> (B, N, ...)."""
    nd = a.ndim
    perm = (nd - 1,) + tuple(range(0, nd - 1))
    return jnp.transpose(a, perm)


def _fma_sum(terms):
    """Accumulate a list of (8,128)-tile products as a chain of FMAs."""
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _mTv(M, v):
    """M^T v: out[i] = sum_j M[j, i] * v[j], unrolled per entry.

    Broadcast-reduce contractions (M * v[:, None] summed over axis 0)
    materialize (n, m, 8, 128) intermediates that Mosaic walks in extra
    passes; emitting the small contraction as explicit tile FMAs keeps every
    op a native (8, 128) multiply-add (measured ~3x on the nx=9 sweep)."""
    n, m = M.shape[0], M.shape[1]
    return jnp.stack(
        [_fma_sum([M[j, i] * v[j] for j in range(n)]) for i in range(m)])


def _mTM(A, W):
    """A^T W: out[i, j] = sum_p A[p, i] * W[p, j], unrolled per entry."""
    p, n = A.shape[0], A.shape[1]
    m = W.shape[1]
    return jnp.stack([
        jnp.stack([_fma_sum([A[k, i] * W[k, j] for k in range(p)])
                   for j in range(m)])
        for i in range(n)])


def _mm(M, X):
    """M X: out[i, j] = sum_p M[i, p] * X[p, j], unrolled per entry."""
    n, p = M.shape[0], M.shape[1]
    m = X.shape[1]
    return jnp.stack([
        jnp.stack([_fma_sum([M[i, k] * X[k, j] for k in range(p)])
                   for j in range(m)])
        for i in range(n)])


def _chol_solve_lanes(Amat, cols, reg=0.0):
    """Solve (A + reg*I) X = [cols] for SPD A given as (SUB,LANE) lanes.

    Amat: (n, n, SUB, LANE); cols: (n, m, SUB, LANE).  Unrolled Cholesky +
    substitutions, every op a full (8,128) tile.  ``reg`` is added on the
    diagonal here (a scatter-free way to regularize inside the kernel).
    """
    n = Amat.shape[0]
    m = cols.shape[1]
    # pivot reciprocals via rsqrt: substitution divides (the dominant VPU
    # divide cost of the sweep, ~7x an FMA slot each) become multiplies
    L = [[None] * n for _ in range(n)]
    Dinv = [None] * n
    for i in range(n):
        for j in range(i + 1):
            s = Amat[i, j]
            if i == j:
                s = s + reg
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                Dinv[i] = jax.lax.rsqrt(s)
                L[i][i] = s * Dinv[i]                    # = sqrt(s)
            else:
                L[i][j] = s * Dinv[j]
    Y = [[None] * m for _ in range(n)]
    for c in range(m):
        for i in range(n):
            s = cols[i, c]
            for k in range(i):
                s = s - L[i][k] * Y[k][c]
            Y[i][c] = s * Dinv[i]
    X = [[None] * m for _ in range(n)]
    for c in range(m):
        for i in reversed(range(n)):
            s = Y[i][c]
            for k in range(i + 1, n):
                s = s - L[k][i] * X[k][c]
            X[i][c] = s * Dinv[i]
    return jnp.stack([jnp.stack(X[i], axis=0) for i in range(n)], axis=0)


def _kernel(reg_ref, lx, lu, lxx, luu, lux, A, B, tg, tH,
            kff_out, K_out, Vx_s, Vxx_s, *, nx, nu, N):
    g = pl.program_id(1)

    def ld(ref):
        # block (1, trail..., 1, SUB, LANE) -> (trail..., SUB, LANE)
        return ref[0][..., 0, :, :]

    def ld_term(ref):
        # block (trail..., 1, SUB, LANE) -> (trail..., SUB, LANE)
        return ref[...][..., 0, :, :]

    @pl.when(g == 0)
    def _():
        Vx_s[...] = ld_term(tg)
        Vxx_s[...] = ld_term(tH)

    Vx = Vx_s[...]
    Vxx = Vxx_s[...]
    Ak = ld(A)
    Bk = ld(B)
    reg = reg_ref[0]                  # (SUB, LANE): per-scenario reg

    Qx = ld(lx) + _mTv(Ak, Vx)
    Qu = ld(lu) + _mTv(Bk, Vx)
    W = _mm(Vxx, Ak)                     # Vxx A
    WB = _mm(Vxx, Bk)                    # Vxx B
    Qxx = ld(lxx) + _mTM(Ak, W)
    Quu = ld(luu) + _mTM(Bk, WB)
    Qux = ld(lux) + _mTM(Bk, W)

    rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)   # (nu, 1+nx, 8, 128)
    sol = _chol_solve_lanes(Quu, rhs, reg=reg)
    kff = -sol[:, 0]
    K = -sol[:, 1:]

    Quu_kff = _mm(Quu, kff[:, None])[:, 0]
    Vx_n = (Qx + _mTv(K, Quu_kff) + _mTv(K, Qu)
            + _mTv(Qux, kff))
    KtQuu = _mTM(K, Quu)
    Vxx_n = Qxx + _mm(KtQuu, K) + _mTM(K, Qux) + _mTM(Qux, K)
    Vxx_n = 0.5 * (Vxx_n + jnp.swapaxes(Vxx_n, 0, 1))

    Vx_s[...] = Vx_n
    Vxx_s[...] = Vxx_n
    kff_out[0, :, 0] = kff
    K_out[0, :, :, 0] = K


def riccati_backward(lx, lu, lxx, luu, lux, A, B, term_g, term_H, reg):
    """Batched Riccati backward sweep on TPU.

    Inputs in batch-major layout: lx (B,N,nx), lu (B,N,nu), lxx (B,N,nx,nx),
    luu (B,N,nu,nu), lux (B,N,nu,nx), A (B,N,nx,nx), Bm (B,N,nx,nu),
    term_g (B,nx), term_H (B,nx,nx); reg scalar or per-scenario (B,).
    Returns kff (B,N,nu), K (B,N,nu,nx).
    Requires B % 1024 == 0 (pad the batch otherwise).
    """
    Bsz, N, nx = lx.shape
    nu = lu.shape[-1]
    assert Bsz % LANES == 0, f"batch {Bsz} must be a multiple of {LANES}"
    nb = Bsz // LANES
    f32 = jnp.float32

    args = [_t(a.astype(f32)) for a in (lx, lu, lxx, luu, lux, A, B)]
    tg = _t_term(term_g.astype(f32))
    tH = _t_term(term_H.astype(f32))
    reg_b = jnp.broadcast_to(jnp.asarray(reg, f32), (Bsz,))
    reg_arr = _t_term(reg_b)          # (nb, SUB, LANE)

    kff_t, K_t = _invoke(args, tg, tH, reg_arr, N=N, nx=nx, nu=nu, nb=nb)
    # back to batch-major
    kff = _back(kff_t.reshape(N, nu, Bsz), Bsz)
    K = _back(K_t.reshape(N, nu, nx, Bsz), Bsz)
    return kff.astype(lx.dtype), K.astype(lx.dtype)


def riccati_backward_bm(lx, lu, lxx, luu, lux, A, B, term_g, term_H, reg):
    """Batch-minor variant: the batch is the LAST axis everywhere — the
    kernel's native layout, so no data movement happens at all (reshapes
    only).  Inputs: lx (N,nx,B), lu (N,nu,B), lxx (N,nx,nx,B),
    luu (N,nu,nu,B), lux (N,nu,nx,B), A (N,nx,nx,B), Bm (N,nx,nu,B),
    term_g (nx,B), term_H (nx,nx,B), reg (B,) or scalar.
    Returns kff (N,nu,B), K (N,nu,nx,B)."""
    N, nx = lx.shape[0], lx.shape[1]
    nu = lu.shape[1]
    Bsz = lx.shape[-1]
    assert Bsz % LANES == 0, f"batch {Bsz} must be a multiple of {LANES}"
    nb = Bsz // LANES
    f32 = jnp.float32

    def tile(a):
        a = a.astype(f32)
        return a.reshape(a.shape[:-1] + (nb, SUB, LANE))

    args = [tile(a) for a in (lx, lu, lxx, luu, lux, A, B)]
    reg_b = jnp.broadcast_to(jnp.asarray(reg, f32), (Bsz,))
    kff_t, K_t = _invoke(args, tile(term_g), tile(term_H), tile(reg_b),
                         N=N, nx=nx, nu=nu, nb=nb)
    return (kff_t.reshape(N, nu, Bsz).astype(lx.dtype),
            K_t.reshape(N, nu, nx, Bsz).astype(lx.dtype))


def _invoke(args, tg, tH, reg_arr, *, N, nx, nu, nb):
    """Shared pallas_call on tiled (N, ..., nb, SUB, LANE) inputs."""
    f32 = jnp.float32

    def spec(trail, reversed_k=True):
        # block over (k, batch-tile); k iterated backward
        blk = (1,) + trail + (1, SUB, LANE)

        def imap(b, g):
            return (N - 1 - g,) + (0,) * len(trail) + (b, 0, 0)

        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def spec_term(trail):
        blk = trail + (1, SUB, LANE)

        def imap(b, g):
            return (0,) * len(trail) + (b, 0, 0)

        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    in_specs = [
        spec_term(()),                                # reg lanes
        spec((nx,)), spec((nu,)), spec((nx, nx)), spec((nu, nu)),
        spec((nu, nx)), spec((nx, nx)), spec((nx, nu)),
        spec_term((nx,)), spec_term((nx, nx)),
    ]
    out_specs = [spec((nu,)), spec((nu, nx))]
    out_shape = [
        jax.ShapeDtypeStruct((N, nu, nb, SUB, LANE), f32),
        jax.ShapeDtypeStruct((N, nu, nx, nb, SUB, LANE), f32),
    ]

    kernel = functools.partial(_kernel, nx=nx, nu=nu, N=N)
    return pl.pallas_call(
        kernel,
        grid=(nb, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nx, SUB, LANE), f32),
            pltpu.VMEM((nx, nx, SUB, LANE), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=INTERPRET,
    )(reg_arr, *args, tg, tH)
