"""Image rendering driver: pixel tiling, stratified multisampling, Gaussian
reconstruction, per-camera orchestration.

Replaces the reference's thread scheduler (renderThreadMain,
src/main.cpp:26-130): instead of 8 pthreads owning row blocks, pixels are
flattened and processed in fixed-size device tiles; samples accumulate with
the 2D Gaussian filter (sigma = pixelWidth/6, src/gaussian.h:3-21;
weights on the jitter offsets, main.cpp:79-100).

Sampling note: the reference computes n = floor(sqrt(spp)) stratified cells
but then traces ``spp`` samples, reading uninitialized jitter for the excess
when spp is not a perfect square (main.cpp:44-76).  We trace exactly n^2
samples (identical for perfect squares, well-defined otherwise).
"""

from __future__ import annotations

import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.render.camera import build_camera, generate_rays
from advanced_cpu_raytracing_tpu.render.integrator import (
    RenderOptions,
    trace_radiance,
)
from advanced_cpu_raytracing_tpu.scene.pack import ScenePack, pack_scene
from advanced_cpu_raytracing_tpu.scene.types import CameraCfg, SceneConfig

DEFAULT_TILE = 1 << 21  # upper bound; render_camera clamps by stack memory


def _auto_tile(total: int, opts: RenderOptions, pack: ScenePack,
               requested: int | None) -> int:
    """Pick the lane-tile size: as large as possible (host->device dispatch
    latency dominates small tiles) while keeping the per-lane ray stack
    within a fixed HBM budget."""
    if requested:
        return requested
    branches = 1 + (1 if opts.path_tracing else 0) + \
        (1 if pack.static.has_dielectric
         and not opts.stochastic_dielectric else 0)
    from advanced_cpu_raytracing_tpu.render.integrator import RR_DEPTH_FLOOR

    depth_total = opts.max_depth + (RR_DEPTH_FLOOR if opts.russian_roulette
                                    else 0)
    k = max(branches - 1, 1) * max(depth_total, 1) + 4
    bytes_per_lane = k * 64 + 256  # stack entries + working set
    budget = 4 << 30
    tile = min(DEFAULT_TILE, max(budget // bytes_per_lane, 1 << 14))
    return min(tile, max(total, 1))


def _gaussian_multisample(trace_fn, px, py, key, n_cells: int):
    """n_cells^2 stratified samples per pixel, Gaussian weighted (sigma = 1/6,
    src/gaussian.h; weights on the jitter offsets, main.cpp:79-100).

    The sample loop is a lax.scan so the integrator is traced exactly once
    regardless of spp (an unrolled loop would inline one integrator copy per
    sample and explode compile time).
    """
    if n_cells <= 1:
        return trace_fn(px, py, key)

    r = px.shape[0]
    sigma = 1.0 / 6.0
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    c1 = 1.0 / (2.0 * jnp.pi * sigma * sigma)

    def sample(carry, s):
        acc, wacc = carry
        k_jit, k_trace = jax.random.split(jax.random.fold_in(key, s))
        row = s // n_cells
        col = s % n_cells
        psi = jax.random.uniform(k_jit, (r, 2))
        sx = (col + psi[:, 0]) / n_cells
        sy = (row + psi[:, 1]) / n_cells
        colr = trace_fn(px + sx, py + sy, k_trace)
        dx = sx - 0.5
        dy = sy - 0.5
        wgt = c1 * jnp.exp(-(dx * dx + dy * dy) * inv_2s2)
        return (acc + colr * wgt[:, None], wacc + wgt), None

    (acc, wacc), _ = jax.lax.scan(
        sample, (jnp.zeros((r, 3)), jnp.zeros(r)),
        jnp.arange(n_cells * n_cells),
    )
    return acc / wacc[:, None]


@partial(jax.jit, static_argnames=("opts", "n_cells"))
def _render_tile(pack: ScenePack, cam, px, py, key, opts: RenderOptions,
                 n_cells: int):
    """One device tile via the jnp wavefront integrator.  px/py are integer
    pixel coords as float arrays (R,)."""
    return _gaussian_multisample(
        lambda px2, py2, k: trace_radiance(pack, cam, px2, py2, k, opts),
        px, py, key, n_cells)


@partial(jax.jit, static_argnames=("mc", "n_cells", "interpret", "w", "h",
                                   "as_ldr"))
def _render_image_mega(mc, tri_tab, chunk_tab, img_tab, cam, key, seed,
                       n_cells: int, interpret: bool, w: int, h: int,
                       as_ldr: bool):
    """Whole image via the fused Pallas megakernel (eligible Whitted scenes;
    see ops/pallas/megakernel.py) — ONE dispatch, zero host->device traffic:
    pixel coordinates come from an on-device iota and the kernel tiles
    internally over its grid.  Lens sampling for DoF happens outside the
    kernel, so DoF scenes stay eligible.

    ``as_ldr`` clamps to u8 on-device ((int)c clamp, src/helperMath.cpp:
    140-152), shrinking the device->host fetch 12x — the reference's timed
    render loop likewise materializes a host u8 buffer (main.cpp:108-125).
    """
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        mega_trace,
        mega_trace_flat,
    )

    # Ray -> block assignment.  Linear order hands each (8,128) kernel block
    # a 1024-pixel scanline strip that can cross the whole image, so ONE
    # deep-recursion object (e.g. the scienceTree diamond) forces deep
    # iteration on every block.  For divergent scenes, remap rays into 32x32
    # pixel tiles (both directions are analytic index arithmetic — no stored
    # permutation): only tiles containing the object iterate deep.
    tiled = mc.has_dielectric and mc.max_depth > 2 and n_cells <= 1
    if tiled:
        tw = 32
        ntx, nty = -(-w // tw), -(-h // tw)
        i = jnp.arange(ntx * nty * tw * tw, dtype=jnp.int32)
        tile, within = i // (tw * tw), i % (tw * tw)
        x = (tile % ntx) * tw + within % tw
        y = (tile // ntx) * tw + within // tw
        px = x.astype(jnp.float32)
        py = y.astype(jnp.float32)
        p = jnp.arange(w * h, dtype=jnp.int32)
        xx, yy = p % w, p // w
        unperm = ((yy // tw) * ntx + xx // tw) * (tw * tw) \
            + (yy % tw) * tw + (xx % tw)
    else:
        idx = jnp.arange(w * h, dtype=jnp.int32)
        px = (idx % w).astype(jnp.float32)
        py = (idx // w).astype(jnp.float32)

    def rays(px2, py2, k):
        r = px2.shape[0]
        if cam.use_dof and k is not None:
            lens = jax.random.uniform(k, (r, 2), minval=-1.0, maxval=1.0)
        else:
            lens = jnp.zeros((r, 2))
        return generate_rays(cam, px2, py2, lens, dof=cam.use_dof)

    def pixuv(px2, py2):
        # replace_background decal: u = px/width, v = py/height
        # (integrator.py miss_col; texture.h:49-52)
        if mc.bg_tex < 0:
            return None
        return (px2 * (1.0 / w), py2 * (1.0 / h))

    if n_cells <= 1:
        # single-sample fast path: keep per-channel arrays FLAT end to end
        # ((R,3) arrays pad the minor dim 3 -> 128 on TPU: 42x the memory
        # traffic for every elementwise op and for the host fetch)
        o, d = rays(px, py, key)
        comps = mega_trace_flat(mc, tri_tab, chunk_tab, o, d,
                                interpret=interpret, seed=seed,
                                rng_key=(key if mc.host_rng else None),
                                img_tab=img_tab, pix_uv=pixuv(px, py))
        if tiled:
            comps = [c[unperm] for c in comps]  # tile order -> scanline
        if as_ldr:
            comps = [
                jnp.clip(jnp.nan_to_num(c).astype(jnp.int32), 0, 255)
                .astype(jnp.uint8) for c in comps
            ]
        return jnp.stack(comps, axis=0)  # (3, R): host transposes

    def trace(px2, py2, k):
        o, d = rays(px2, py2, k)
        # per-sample stochastic stream: fold the sample key into the seed
        try:
            kd = jax.random.key_data(k)
        except TypeError:
            kd = k  # raw uint32 key arrays
        s_seed = seed + kd.reshape(-1)[-1].astype(jnp.int32)
        return mega_trace(mc, tri_tab, chunk_tab, o, d, interpret=interpret,
                          seed=s_seed, rng_key=(k if mc.host_rng else None),
                          img_tab=img_tab, pix_uv=pixuv(px2, py2))

    col = jnp.transpose(  # (3, R): uniform host-side contract
        _gaussian_multisample(trace, px, py, key, n_cells))
    if as_ldr:
        col = jnp.clip(jnp.nan_to_num(col).astype(jnp.int32), 0, 255)
        return col.astype(jnp.uint8)
    return col


import weakref  # noqa: E402

# build_mega pulls every table to host (one RPC per array on a tunneled
# device) — cache per (pack, depth).  Keyed by id() with a weakref guard
# (ScenePack is an unhashable dataclass); packs are immutable after
# pack_scene, so identity is the right cache key.
_MEGA_CACHE: dict = {}


_CAM_CACHE: dict = {}


def _camera_cached(cam_cfg: CameraCfg):
    """build_camera materializes ~9 device scalars — each an h2d round-trip
    on a tunneled TPU — so reuse the DeviceCamera per config object."""
    key = id(cam_cfg)
    ent = _CAM_CACHE.get(key)
    if ent is not None and ent[0]() is cam_cfg:
        return ent[1]
    cam = build_camera(cam_cfg)
    _CAM_CACHE[key] = (weakref.ref(cam_cfg), cam)
    return cam


def _mega_build_cached(pack: ScenePack, opts: RenderOptions):
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import build_mega

    key = id(pack)
    ent = _MEGA_CACHE.get(key)
    if ent is not None and ent[0]() is pack and ent[1] == opts:
        return ent[2], ent[3], ent[4], ent[5]
    mc, tab, ctab, img_tab = build_mega(pack, opts)
    _MEGA_CACHE[key] = (weakref.ref(pack), opts, mc, tab, ctab, img_tab)
    return mc, tab, ctab, img_tab


def _mega_route(pack: ScenePack, opts: RenderOptions) -> bool:
    """Route a render through the fused kernel?  Compiled Pallas needs a real
    TPU; ACRT_FORCE_MEGA=1 forces interpreter mode (tests), ACRT_NO_MEGA=1
    disables the route."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import mega_eligible

    if os.environ.get("ACRT_NO_MEGA") == "1":
        return False
    if not mega_eligible(pack.static, opts, pack):
        return False
    return (jax.default_backend() == "tpu"
            or os.environ.get("ACRT_FORCE_MEGA") == "1")


def options_for_camera(cfg: SceneConfig, cam_cfg: CameraCfg) -> RenderOptions:
    rp = cam_cfg.renderer_params
    return RenderOptions(
        path_tracing=rp.path_tracing,
        importance_sampling=rp.importance_sampling,
        next_event_estimation=rp.next_event_estimation,
        russian_roulette=rp.russian_roulette,
        max_depth=cfg.max_recursion_depth,
        # PT renders are Monte-Carlo anyway: sample one dielectric child per
        # hit (flat ray population) instead of splitting exponentially;
        # Whitted renders keep the reference's deterministic split
        stochastic_dielectric=rp.path_tracing,
    )


def render_camera(pack: ScenePack, cfg: SceneConfig, cam_cfg: CameraCfg,
                  seed: int = 0, tile_size: int | None = None,
                  spp: int | None = None, ldr: bool = False) -> np.ndarray:
    """Render one camera to an (H, W, 3) image.

    ``ldr=False`` (default) returns float32 radiance; ``ldr=True`` returns
    the clamped u8 image ((int)c clamp, src/helperMath.cpp:140-152) — on the
    fused-kernel route the clamp happens on-device so only 3 bytes/pixel
    cross the (slow, tunneled) device->host link.
    """
    cam = _camera_cached(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    w, h = cam_cfg.width, cam_cfg.height
    spp = cam_cfg.num_samples if spp is None else spp
    n_cells = max(int(math.isqrt(max(spp, 1))), 1)

    if _mega_route(pack, opts):
        mc, tri_tab, chunk_tab, img_tab = _mega_build_cached(pack, opts)
        interpret = jax.default_backend() != "tpu"
        # deterministic single-sample non-DoF Whitted renders need no RNG at
        # all — and merely *creating* a PRNG key costs a ~25 ms device
        # round-trip on a tunneled TPU
        needs_key = (cam.use_dof or n_cells > 1 or mc.host_rng)
        key = jax.random.PRNGKey(seed) if needs_key else None
        img = _render_image_mega(mc, tri_tab, chunk_tab, img_tab, cam, key,
                                 jnp.int32(seed), n_cells,
                                 interpret, w, h, ldr)  # (3, R)
        return np.ascontiguousarray(
            np.asarray(img).T.reshape(h, w, 3))

    key = jax.random.PRNGKey(seed)

    tile_size = _auto_tile(w * h, opts, pack, tile_size)
    total = w * h
    ys, xs = np.divmod(np.arange(total, dtype=np.int64), w)
    px_all = xs.astype(np.float32)
    py_all = ys.astype(np.float32)

    out = np.zeros((total, 3), np.float32)
    n_tiles = (total + tile_size - 1) // tile_size
    for ti in range(n_tiles):
        lo = ti * tile_size
        hi = min(lo + tile_size, total)
        pad = tile_size - (hi - lo)
        px = np.pad(px_all[lo:hi], (0, pad))
        py = np.pad(py_all[lo:hi], (0, pad))
        k_tile = jax.random.fold_in(key, ti)
        col = _render_tile(pack, cam, jnp.asarray(px), jnp.asarray(py),
                           k_tile, opts, n_cells)
        out[lo:hi] = np.asarray(col)[: hi - lo]
    img = out.reshape(h, w, 3)
    return ldr_from_radiance(img) if ldr else img


def ldr_from_radiance(img: np.ndarray) -> np.ndarray:
    """Clamp path for non-tonemapped cameras: (int)c clamped to [0,255]
    (clamp(), src/helperMath.cpp:140-152; applied at main.cpp:121)."""
    return np.clip(np.nan_to_num(img).astype(np.int32), 0, 255).astype(np.uint8)


def render_scene(path_or_cfg, seed: int = 0, spp: int | None = None):
    """Render every camera of a scene; returns list of
    (camera_cfg, radiance_image) tuples."""
    if isinstance(path_or_cfg, SceneConfig):
        cfg = path_or_cfg
    else:
        from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

        cfg = load_scene(path_or_cfg)
    pack = pack_scene(cfg)
    results = []
    for cam_cfg in cfg.cameras:
        img = render_camera(pack, cfg, cam_cfg, seed=seed, spp=spp)
        results.append((cam_cfg, img))
    return results
