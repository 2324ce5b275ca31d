"""Small numeric helpers shared across the framework.

All functions are pure, jit/vmap-safe, and dtype-preserving.
"""

import jax.numpy as jnp


def wrap_to_pi(a):
    """Wrap an angle (any range) into [-pi, pi).

    Mirrors the reference's ``ca.fmod((a + pi), 2*pi) - pi`` normalization
    (/root/reference/controllers/mpc_wholebody_qref.py:97) but uses a
    floored modulo so negative inputs land in [-pi, pi) as well (CasADi's
    fmod is truncated; the reference compensates with the branch tree in
    ``angleDiff`` — we fold both steps into one formula, see angle_diff).
    """
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def angle_diff(a, b):
    """Closest signed difference a - b, in [-pi, pi).

    Semantics of the reference's branch-tree ``angleDiff``
    (/root/reference/controllers/mpc_wholebody_qref.py:92-117): inputs from
    any range, output is the wrap-closest a-b (e.g. a=-3.14, b=3.14 -> ~0.003).
    The branch tree is equivalent to wrapping the difference; we implement the
    wrap directly, which is smooth with derivative 1 almost everywhere —
    friendly to jax.grad, unlike nested conditionals.
    """
    return wrap_to_pi(a - b)


def safe_norm(x, axis=-1, eps=1e-9):
    """Euclidean norm with a well-defined gradient at 0.

    The reference uses exact ``ca.sqrt`` / ``ca.norm_2`` in obstacle and
    self-collision terms (mpc_wholebody_qref.py:53,222), whose derivative
    blows up at zero distance. We add a tiny epsilon under the root; the
    value shift is < sqrt(eps) and verified not to move solutions in tests.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def safe_dist(dx, dy, eps=1e-9):
    """2-D distance sqrt(dx^2 + dy^2) with safe gradient at 0."""
    return jnp.sqrt(dx * dx + dy * dy + eps)
