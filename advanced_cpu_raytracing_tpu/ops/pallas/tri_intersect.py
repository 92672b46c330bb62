"""Pallas TPU kernel: dense ray x triangle closest-hit (brute-force mode).

The wavefront inner loop for small scenes: every ray is tested against every
(entity, face) work item (Cramer's rule, semantics of Mesh::IntersectFace,
src/mesh.cpp:201-236) and the minimum-t winner is reduced per ray.

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * rays are laid out (rows, 128) and each grid step owns an (8, 128) block
    — 1024 rays — satisfying the TPU (8, 128) f32 tile constraint;
  * triangle SoA arrays are VMEM-resident and broadcast to every program
    (brute mode caps W at ~2k items = ~100 KB);
  * an inner fori_loop folds one triangle per step into the running per-ray
    minimum as (8, 128) VPU ops (TRI_CHUNK only pads the table; Mosaic has no
    3-D gather/argmin, so the triangle reduction is sequential);
  * all math in f32 on the VPU — no MXU involvement, so no bf16 truncation
    of ray geometry.

The jnp path in ops/traverse.py remains the autodiff and motion-blur route
(the kernel has no VJP and no per-item ray offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_ROWS = 8  # sublane dim of a ray block
RAY_LANES = 128  # lane dim
RAY_TILE = RAY_ROWS * RAY_LANES
TRI_CHUNK = 8

_INF = 3.0e38  # plain float: jnp scalars would be captured consts in pallas


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            v0_ref, v1_ref, v2_ref,
            t_ref, idx_ref, beta_ref, gamma_ref, *, n_tri: int):
    ox = ox_ref[:, :]  # (8,128)
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]

    def one_tri(ti, carry):
        """Fold triangle ti into the per-ray best (all ops (8,128) 2D —
        Mosaic supports neither 3D gathers nor argmin-pick, so the reduction
        over triangles is sequential with masked min-updates)."""
        t_best, i_best, b_best, g_best = carry
        v0 = v0_ref[pl.ds(ti, 1), :]  # (1, 3pad)
        v1 = v1_ref[pl.ds(ti, 1), :]
        v2 = v2_ref[pl.ds(ti, 1), :]

        e1x = v0[0, 0] - v1[0, 0]
        e1y = v0[0, 1] - v1[0, 1]
        e1z = v0[0, 2] - v1[0, 2]
        e2x = v0[0, 0] - v2[0, 0]
        e2y = v0[0, 1] - v2[0, 1]
        e2z = v0[0, 2] - v2[0, 2]
        bx = v0[0, 0] - ox
        by = v0[0, 1] - oy
        bz = v0[0, 2] - oz

        # det[e1|e2|d] with scalar e-columns and (8,128) ray columns
        m0 = e2y * dz - dy * e2z
        m1 = e2x * dz - dx * e2z
        m2 = e2x * dy - dx * e2y
        det_a = e1x * m0 - e1y * m1 + e1z * m2
        safe = jnp.where(det_a == 0.0, 1.0, det_a)

        beta = (bx * m0 - by * m1 + bz * m2) / safe
        n0 = by * dz - dy * bz
        n1 = bx * dz - dx * bz
        n2 = bx * dy - dx * by
        gamma = (e1x * n0 - e1y * n1 + e1z * n2) / safe
        q0 = e2y * bz - by * e2z
        q1 = e2x * bz - bx * e2z
        q2 = e2x * by - bx * e2y
        t = (e1x * q0 - e1y * q1 + e1z * q2) / safe

        valid = (
            (det_a != 0.0) & (beta >= 0.0) & (gamma >= 0.0)
            & (beta + gamma <= 1.0) & (t > 0.0)
        )
        better = valid & (t < t_best)
        return (
            jnp.where(better, t, t_best),
            jnp.where(better, ti, i_best),
            jnp.where(better, beta, b_best),
            jnp.where(better, gamma, g_best),
        )

    init = (
        jnp.full((RAY_ROWS, RAY_LANES), _INF),
        jnp.full((RAY_ROWS, RAY_LANES), -1, jnp.int32),
        jnp.zeros((RAY_ROWS, RAY_LANES), jnp.float32),
        jnp.zeros((RAY_ROWS, RAY_LANES), jnp.float32),
    )
    t_best, i_best, b_best, g_best = jax.lax.fori_loop(0, n_tri, one_tri, init)
    t_ref[:, :] = t_best
    idx_ref[:, :] = i_best
    beta_ref[:, :] = b_best
    gamma_ref[:, :] = g_best


def _pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def tri_closest_hit_pallas(o, d, v0, v1, v2, interpret: bool | None = None):
    """Dense closest hit: rays (R,3) x tris (W,3 each).

    Returns (t, idx, beta, gamma) with t = +inf, idx = -1 on miss.
    ``interpret=None`` auto-selects interpreter mode off-TPU (for tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = o.shape[0]
    w = v0.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    w_pad = ((w + TRI_CHUNK - 1) // TRI_CHUNK) * TRI_CHUNK

    o_p = _pad_to(o, r_pad)
    d_p = _pad_to(d, r_pad, value=1)  # nonzero dir for padded lanes
    v0_p = _pad_to(v0, w_pad)
    v1_p = _pad_to(v1, w_pad)
    v2_p = _pad_to(v2, w_pad)

    n_rows = r_pad // RAY_LANES
    n_tiles = n_rows // RAY_ROWS
    ray_cols = [
        x.reshape(n_rows, RAY_LANES)
        for arr in (o_p, d_p)
        for x in (arr[:, 0], arr[:, 1], arr[:, 2])
    ]

    grid = (n_tiles,)
    ray_spec = pl.BlockSpec((RAY_ROWS, RAY_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((RAY_ROWS, RAY_LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ] * 4
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, RAY_LANES), jnp.float32),
    ]

    t, idx, beta, gamma = pl.pallas_call(
        functools.partial(_kernel, n_tri=w),
        grid=grid,
        in_specs=[ray_spec] * 6 + [tri_spec] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ray_cols, v0_p, v1_p, v2_p)

    t = t.reshape(-1)[:r]
    idx = idx.reshape(-1)[:r]
    beta = beta.reshape(-1)[:r]
    gamma = gamma.reshape(-1)[:r]
    return jnp.where(t >= _INF, jnp.inf, t), idx, beta, gamma
