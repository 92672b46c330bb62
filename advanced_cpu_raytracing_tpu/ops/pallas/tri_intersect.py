"""Pallas TPU kernel: dense ray x triangle closest-hit (brute-force mode).

The wavefront inner loop for small scenes: every ray is tested against every
(entity, face) work item (Cramer's rule, semantics of Mesh::IntersectFace,
src/mesh.cpp:201-236) and the minimum-t winner is reduced per ray.

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * grid over ray tiles of 128 lanes; triangle SoA arrays are broadcast to
    every program (VMEM-resident — brute mode caps W at ~2k items = ~100 KB).
  * inner fori_loop walks triangle chunks of 8 (sublane dim); each step
    evaluates an (8, 128) tri x ray block of determinants on the VPU and
    folds it into the running per-ray minimum.
  * all math in f32 on the VPU — no MXU involvement, so no bf16 truncation
    of ray geometry.

The public wrapper pads shapes, falls back to pure-jnp outside TPU, and is
differentiated via the jnp path (the kernel is wrapped in custom_vjp whose
backward recomputes with jnp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 128
TRI_CHUNK = 8

_INF = 3.0e38  # plain float: jnp scalars would be captured consts in pallas


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            v0_ref, v1_ref, v2_ref,
            t_ref, idx_ref, beta_ref, gamma_ref, *, n_tri: int):
    ox = ox_ref[0, :]
    oy = oy_ref[0, :]
    oz = oz_ref[0, :]
    dx = dx_ref[0, :]
    dy = dy_ref[0, :]
    dz = dz_ref[0, :]

    n_chunks = pl.cdiv(n_tri, TRI_CHUNK)

    def chunk(ci, carry):
        t_best, i_best, b_best, g_best = carry
        base = ci * TRI_CHUNK
        v0 = v0_ref[pl.ds(base, TRI_CHUNK), :]  # (8, 3+pad)
        v1 = v1_ref[pl.ds(base, TRI_CHUNK), :]
        v2 = v2_ref[pl.ds(base, TRI_CHUNK), :]

        # columns of the Cramer matrix, broadcast (8 tris, 128 rays)
        def col(a, b):
            return a[:, None] - b[None, :]

        e1x = (v0[:, 0] - v1[:, 0])[:, None]
        e1y = (v0[:, 1] - v1[:, 1])[:, None]
        e1z = (v0[:, 2] - v1[:, 2])[:, None]
        e2x = (v0[:, 0] - v2[:, 0])[:, None]
        e2y = (v0[:, 1] - v2[:, 1])[:, None]
        e2z = (v0[:, 2] - v2[:, 2])[:, None]
        bx = col(v0[:, 0], ox)
        by = col(v0[:, 1], oy)
        bz = col(v0[:, 2], oz)
        rdx = dx[None, :]
        rdy = dy[None, :]
        rdz = dz[None, :]

        def det3(c0x, c0y, c0z, c1x, c1y, c1z, c2x, c2y, c2z):
            return (
                c0x * (c1y * c2z - c2y * c1z)
                - c1x * (c0y * c2z - c2y * c0z)
                + c2x * (c0y * c1z - c1y * c0z)
            )

        det_a = det3(e1x, e1y, e1z, e2x, e2y, e2z, rdx, rdy, rdz)
        safe = jnp.where(det_a == 0.0, 1.0, det_a)
        beta = det3(bx, by, bz, e2x, e2y, e2z, rdx, rdy, rdz) / safe
        gamma = det3(e1x, e1y, e1z, bx, by, bz, rdx, rdy, rdz) / safe
        t = det3(e1x, e1y, e1z, e2x, e2y, e2z, bx, by, bz) / safe

        tri_ids = base + jax.lax.broadcasted_iota(jnp.int32, (TRI_CHUNK, RAY_TILE), 0)
        valid = (
            (det_a != 0.0) & (beta >= 0.0) & (gamma >= 0.0)
            & (beta + gamma <= 1.0) & (t > 0.0) & (tri_ids < n_tri)
        )
        t = jnp.where(valid, t, _INF)

        # reduce over the 8-tri axis
        t_min = jnp.min(t, axis=0)
        win_row = jnp.argmin(t, axis=0)
        take = t_min < t_best

        def pick(arr):
            return jnp.take_along_axis(arr, win_row[None, :], axis=0)[0, :]

        return (
            jnp.where(take, t_min, t_best),
            jnp.where(take, pick(tri_ids), i_best),
            jnp.where(take, pick(beta), b_best),
            jnp.where(take, pick(gamma), g_best),
        )

    init = (
        jnp.full((RAY_TILE,), _INF),
        jnp.full((RAY_TILE,), -1, jnp.int32),
        jnp.zeros((RAY_TILE,), jnp.float32),
        jnp.zeros((RAY_TILE,), jnp.float32),
    )
    t_best, i_best, b_best, g_best = jax.lax.fori_loop(0, n_chunks, chunk, init)
    t_ref[0, :] = t_best
    idx_ref[0, :] = i_best
    beta_ref[0, :] = b_best
    gamma_ref[0, :] = g_best


def _pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def tri_closest_hit_pallas(o, d, v0, v1, v2, interpret: bool = False):
    """Dense closest hit: rays (R,3) x tris (W,3 each).

    Returns (t, idx, beta, gamma) with t = +inf, idx = -1 on miss.
    """
    r = o.shape[0]
    w = v0.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    w_pad = ((w + TRI_CHUNK - 1) // TRI_CHUNK) * TRI_CHUNK

    o_p = _pad_to(o, r_pad)
    d_p = _pad_to(d, r_pad, value=1)  # nonzero dir for padded lanes
    v0_p = _pad_to(v0, w_pad)
    v1_p = _pad_to(v1, w_pad)
    v2_p = _pad_to(v2, w_pad)

    n_tiles = r_pad // RAY_TILE
    ray_cols = [
        x.reshape(n_tiles, RAY_TILE)
        for arr in (o_p, d_p)
        for x in (arr[:, 0], arr[:, 1], arr[:, 2])
    ]

    grid = (n_tiles,)
    ray_spec = pl.BlockSpec((1, RAY_TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, RAY_TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] * 4
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, RAY_TILE), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, RAY_TILE), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, RAY_TILE), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, RAY_TILE), jnp.float32),
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
