"""Pallas Riccati kernel parity vs the pure-JAX backward pass.

Runs in interpreter mode on the CPU test mesh; the compiled path is
exercised on real TPU by bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mmmpc_tpu.ops.riccati as ric
from mmmpc_tpu.solver.linalg_small import chol_solve_unrolled


def reference_backward(lx, lu, lxx, luu, lux, A, Bm, tg, tH, reg):
    """Same recursion as solver/al_ilqr.py's bwd scan (batch-major)."""
    nu = lu.shape[-1]
    eye_u = jnp.eye(nu, dtype=lx.dtype)

    def single(lx, lu, lxx, luu, lux, A, Bm, tg, tH):
        def step(carry, inp):
            Vx, Vxx = carry
            lx_k, lu_k, lxx_k, luu_k, lux_k, A_k, B_k = inp
            Qx = lx_k + A_k.T @ Vx
            Qu = lu_k + B_k.T @ Vx
            Qxx = lxx_k + A_k.T @ Vxx @ A_k
            Quu = luu_k + B_k.T @ Vxx @ B_k
            Qux = lux_k + B_k.T @ Vxx @ A_k
            sol = chol_solve_unrolled(
                Quu + reg * eye_u,
                jnp.concatenate([Qu[:, None], Qux], axis=1))
            kff = -sol[:, 0]
            K = -sol[:, 1:]
            Vx_n = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
            Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
            return (Vx_n, Vxx_n), (kff, K)

        (_, _), (kffs, Ks) = jax.lax.scan(
            step, (tg, tH),
            jax.tree.map(lambda a: a[::-1], (lx, lu, lxx, luu, lux, A, Bm)))
        return kffs[::-1], Ks[::-1]

    return jax.vmap(single)(lx, lu, lxx, luu, lux, A, Bm, tg, tH)


@pytest.fixture()
def problem():
    rng = np.random.default_rng(3)
    B, N, nx, nu = 1024, 4, 9, 5

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s), jnp.float32)

    lx, lu = mk(B, N, nx), mk(B, N, nu)
    lxx = mk(B, N, nx, nx)
    lxx = lxx @ jnp.swapaxes(lxx, -1, -2) + 5 * jnp.eye(nx, dtype=jnp.float32)
    luu = mk(B, N, nu, nu)
    luu = luu @ jnp.swapaxes(luu, -1, -2) + 5 * jnp.eye(nu, dtype=jnp.float32)
    lux = mk(B, N, nu, nx)
    A = mk(B, N, nx, nx) * 0.1 + jnp.eye(nx, dtype=jnp.float32)
    Bm = mk(B, N, nx, nu) * 0.1
    tg = mk(B, nx)
    tH = mk(B, nx, nx)
    tH = tH @ jnp.swapaxes(tH, -1, -2) + 5 * jnp.eye(nx, dtype=jnp.float32)
    return lx, lu, lxx, luu, lux, A, Bm, tg, tH


def test_pallas_riccati_matches_reference(problem, monkeypatch):
    lx, lu, lxx, luu, lux, A, Bm, tg, tH = problem
    reg = 1e-6

    kff_ref, K_ref = reference_backward(lx, lu, lxx, luu, lux, A, Bm,
                                        tg, tH, reg)

    # interpreter mode: the kernel itself runs as traced jnp on CPU
    import jax.experimental.pallas as pl
    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(ric.pl, "pallas_call", interp_call)
    kff, K = ric.riccati_backward(lx, lu, lxx, luu, lux, A, Bm, tg, tH, reg)

    np.testing.assert_allclose(np.asarray(kff), np.asarray(kff_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                               rtol=2e-4, atol=2e-4)
