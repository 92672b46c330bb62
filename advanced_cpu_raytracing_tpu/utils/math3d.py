"""Batched 3-vector math used across the framework.

Semantics mirror the reference math helpers (src/helperMath.cpp) but are
expressed as vectorized jnp ops over ``(..., 3)`` arrays so every kernel is
jit/vmap/grad friendly.  All functions are pure.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def dot(a: Array, b: Array) -> Array:
    """Row-wise dot product over the trailing axis (src/helperMath.cpp:54-58)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def length(a: Array) -> Array:
    """Euclidean norm over the trailing axis (src/helperMath.cpp:112-115)."""
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a: Array, eps: float = 0.0) -> Array:
    """Unit vector; matches ``makeUnit`` (src/helperMath.cpp:116-124).

    With ``eps`` the zero-vector case returns 0 via a double-where so that
    reverse-mode AD stays finite (a bare ``a / max(|a|, eps)`` leaks huge
    cotangents through the untaken branch); the reference would produce
    inf/nan there anyway, so parity is unaffected.
    """
    if eps:
        # guard the sqrt OPERAND, not just the divide: sqrt'(0) = inf, and
        # reverse-mode turns (zero cotangent) * inf into NaN even when the
        # outer where discards the branch (seen on PT backscatter lanes
        # where w_i + w_o ~ 0 in the half-vector)
        n2 = jnp.sum(a * a, axis=-1)[..., None]
        ok = n2 > eps * eps
        l = jnp.sqrt(jnp.where(ok, n2, 1.0))
        return jnp.where(ok, a / l, 0.0)
    return a / length(a)[..., None]


def reflect(normal: Array, w_o: Array) -> Array:
    """Perfect mirror direction of ``w_o`` about ``normal``.

    Matches ``Raytracer::Reflect`` without roughness (src/raytracer.cpp:426):
    ``r = unit(2 n (n.w_o) - w_o)``.
    """
    return normalize(normal * (2.0 * dot(normal, w_o))[..., None] - w_o)


def orthonormal_basis(r: Array) -> tuple[Array, Array]:
    """Build (u, v) orthonormal to ``r`` via the axis-swap trick.

    Matches ``GetOrthonormalBasis`` (src/helperMath.cpp:59-85): set the
    smallest-|component| axis of a copy of r to 1, then
    u = unit(r' x r), v = unit(r x u).
    Batched over leading axes.
    """
    ax = jnp.abs(r[..., 0])
    ay = jnp.abs(r[..., 1])
    az = jnp.abs(r[..., 2])
    # index of the smallest absolute component, with the reference's exact
    # tie-breaking: x wins only if strictly smaller than y and z; else z wins
    # ties against y.
    use_x = (ax < ay) & (ax < az)
    use_y = (~(ax < ay)) & (ay < az)
    # use_z otherwise
    one = jnp.ones_like(ax)
    rp = jnp.stack(
        [
            jnp.where(use_x, one, r[..., 0]),
            jnp.where(use_y, one, r[..., 1]),
            jnp.where(~(use_x | use_y), one, r[..., 2]),
        ],
        axis=-1,
    )
    # eps guard: a degenerate r (zero vector on masked/miss lanes) makes
    # cross(rp, r) = 0; an unguarded 0/0 here poisons reverse-mode AD of
    # anything sharing the graph (PT GI sampling builds a basis on every
    # lane's normal, live or not) — forward values are unchanged for any
    # non-degenerate r
    u = normalize(cross(rp, r), eps=1e-20)
    v = normalize(cross(r, u), eps=1e-20)
    return u, v


def luminance(rgb: Array) -> Array:
    """Rec.709 luminance (src/tonemapper.h:42, 77)."""
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
