"""Sharded rendering: pixels split across the device mesh, scene replicated.

Strategy (SURVEY.md section 2.3 / 7): data parallelism over pixels is the
reference's only axis (row blocks over 8 pthreads, main.cpp:38-39); here the
flattened pixel batch is sharded on the ``tiles`` mesh axis with
``jax.sharding`` annotations and jit — XLA partitions the whole integrator
SPMD and inserts any needed collectives (psum for scalar reductions and for
parameter gradients in the differentiable path) over ICI.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.parallel.mesh import (
    make_device_mesh,
    replicated,
    tile_sharding,
)
from advanced_cpu_raytracing_tpu.render.integrator import (
    RenderOptions,
    trace_radiance,
)


@partial(jax.jit, static_argnames=("opts",))
def _traced(pack, cam, px, py, key, opts):
    return trace_radiance(pack, cam, px, py, key, opts)


def render_camera_sharded_mega(pack, cfg, cam_cfg, mesh=None, seed: int = 0,
                               spp: int | None = None) -> np.ndarray:
    """Frame-level sharding of the PRODUCTION fused Pallas megakernel: each
    device runs the whole kernel on its pixel shard under ``shard_map``
    (pixels are embarrassingly parallel — the reference's row blocks,
    main.cpp:38-39, made SPMD).  At 1 spp with no RNG the image is
    bit-identical to the single-device megakernel; multisampled renders
    fold the device index into the sample key, so shards draw uncorrelated
    stratified jitter (statistically equivalent, not bit-equal).

    Returns the (H, W, 3) float radiance image.
    """
    import math

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega,
        mega_trace,
    )
    from advanced_cpu_raytracing_tpu.render import camera as cam_mod
    from advanced_cpu_raytracing_tpu.render.renderer import (
        _camera_cached,
        _gaussian_multisample,
        options_for_camera,
    )
    from advanced_cpu_raytracing_tpu.parallel.mesh import TILE_AXIS

    if mesh is None:
        mesh = make_device_mesh()
    cam = _camera_cached(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    w, h = cam_cfg.width, cam_cfg.height
    spp = cam_cfg.num_samples if spp is None else spp
    n_cells = max(int(math.isqrt(max(spp, 1))), 1)
    interpret = jax.default_backend() != "tpu"
    # host_rng on the interpret path: pltpu.prng has no interpreter lowering
    mc, tri_tab, chunk_tab, img_tab = build_mega(pack, opts,
                                                 host_rng=interpret)

    total = w * h
    pad = (-total) % (mesh.size * 8)  # shard evenly, sublane-friendly
    ys, xs = np.divmod(np.arange(total, dtype=np.int64), w)
    px = jnp.asarray(np.pad(xs.astype(np.float32), (0, pad)))
    py = jnp.asarray(np.pad(ys.astype(np.float32), (0, pad)))
    needs_key = cam.use_dof or n_cells > 1 or mc.host_rng
    key = jax.random.PRNGKey(seed) if needs_key else None

    def local(px_s, py_s):
        idx = jax.lax.axis_index(TILE_AXIS)
        k_dev = jax.random.fold_in(key, idx) if key is not None else None
        s_seed = jnp.int32(seed) + idx.astype(jnp.int32) * jnp.int32(9973)

        def trace(px2, py2, kk):
            r = px2.shape[0]
            if cam.use_dof and kk is not None:
                lens = jax.random.uniform(kk, (r, 2), minval=-1.0,
                                          maxval=1.0)
            else:
                lens = jnp.zeros((r, 2))
            o, d = cam_mod.generate_rays(cam, px2, py2, lens,
                                         dof=cam.use_dof)
            kseed = s_seed
            if kk is not None and n_cells > 1:
                kd = jax.random.key_data(kk)
                kseed = s_seed + kd.reshape(-1)[-1].astype(jnp.int32)
            uv = ((px2 * (1.0 / w), py2 * (1.0 / h)) if mc.bg_tex >= 0
                  else None)
            return mega_trace(mc, tri_tab, chunk_tab, o, d,
                              interpret=interpret, seed=kseed,
                              rng_key=(kk if mc.host_rng else None),
                              img_tab=img_tab, pix_uv=uv)

        return _gaussian_multisample(trace, px_s, py_s, k_dev, n_cells)

    # check_vma=False: pallas_call's out_shape ShapeDtypeStructs carry no
    # varying-mesh-axes annotation, which the checker (jax>=0.9) rejects
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(TILE_AXIS), P(TILE_AXIS)),
                   out_specs=P(TILE_AXIS), check_vma=False)
    col = jax.jit(fn)(px, py)
    return np.asarray(col)[:total].reshape(h, w, 3)


def render_camera_sharded(pack, cfg, cam_cfg, mesh=None, seed: int = 0,
                          spp: int | None = None) -> np.ndarray:
    """The PRODUCTION render — stratified multisampling + Gaussian
    reconstruction included — with pixels sharded across the device mesh.

    This is the same jitted tile function the single-device renderer uses
    (render/renderer.py::_render_tile); the only difference is the sharding
    annotations on the pixel batch (scene pack and camera replicated).  XLA
    partitions the whole integrator SPMD, so the result equals the
    single-device image up to fp reduction order.  The reference's analogue
    is its only parallel axis: row blocks over 8 pthreads (main.cpp:38-39).
    """
    import math

    from advanced_cpu_raytracing_tpu.render.renderer import (
        _mega_route,
        _render_tile,
        options_for_camera,
    )
    from advanced_cpu_raytracing_tpu.render.camera import build_camera

    if mesh is None:
        mesh = make_device_mesh()
    cam = build_camera(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    if _mega_route(pack, opts):
        # production engine: per-device fused megakernel over pixel shards
        return render_camera_sharded_mega(pack, cfg, cam_cfg, mesh=mesh,
                                          seed=seed, spp=spp)
    w, h = cam_cfg.width, cam_cfg.height
    spp = cam_cfg.num_samples if spp is None else spp
    n_cells = max(int(math.isqrt(max(spp, 1))), 1)

    total = w * h
    pad = (-total) % mesh.size
    ys, xs = np.divmod(np.arange(total, dtype=np.int64), w)
    px = np.pad(xs.astype(np.float32), (0, pad))
    py = np.pad(ys.astype(np.float32), (0, pad))

    shard = tile_sharding(mesh)
    repl = replicated(mesh)
    px = jax.device_put(jnp.asarray(px), shard)
    py = jax.device_put(jnp.asarray(py), shard)
    pack_r = jax.device_put(pack, repl)
    cam_r = jax.device_put(cam, repl)
    # fold_in(key, 0) mirrors the single-device driver's per-tile key for its
    # first (here: only) tile, so sharded and unsharded images use identical
    # sample jitter
    key = jax.device_put(
        jax.random.fold_in(jax.random.PRNGKey(seed), 0), repl)

    col = _render_tile(pack_r, cam_r, px, py, key, opts, n_cells)
    return np.asarray(col)[:total].reshape(h, w, 3)


def render_sharded(pack, cam, px, py, key, opts: RenderOptions, mesh=None):
    """Render a flat pixel batch sharded across devices.

    ``px``/``py`` length must divide by the mesh size (pad upstream).
    Returns the gathered (R,3) radiance.
    """
    if mesh is None:
        mesh = make_device_mesh()
    shard = tile_sharding(mesh)
    repl = replicated(mesh)
    px = jax.device_put(jnp.asarray(px), shard)
    py = jax.device_put(jnp.asarray(py), shard)
    pack = jax.device_put(pack, repl)
    cam = jax.device_put(cam, repl)
    key = jax.device_put(key, repl)
    out = _traced(pack, cam, px, py, key, opts)
    return np.asarray(out)


def loss_and_grads(pack, cam, px, py, key, opts: RenderOptions, target,
                   param_extract, param_inject, mesh=None):
    """Sharded differentiable render step: pixel-MSE loss against ``target``
    and gradients w.r.t. the extracted parameter pytree.

    Parameters are replicated, pixels sharded; XLA all-reduces the parameter
    gradients over ICI automatically (the gradient of a replicated array fed
    by sharded compute is a psum).
    """
    if mesh is None:
        mesh = make_device_mesh()
    shard = tile_sharding(mesh)
    repl = replicated(mesh)

    params = param_extract(pack)

    def loss_fn(params, pack, cam, px, py, key, target):
        pack = param_inject(pack, params)
        img = trace_radiance(pack, cam, px, py, key, opts)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn), static_argnames=())
    px = jax.device_put(jnp.asarray(px), shard)
    py = jax.device_put(jnp.asarray(py), shard)
    target = jax.device_put(jnp.asarray(target), shard)
    pack = jax.device_put(pack, repl)
    cam = jax.device_put(cam, repl)
    params = jax.device_put(params, repl)
    return grad_fn(params, pack, cam, px, py, key, target)


def make_sharded_diff_step(pack, opts, cam, mesh=None, interpret=None):
    """Sharded differentiable step through the PRODUCTION fused fwd+bwd
    kernel (ops/pallas/megabwd.py): each device runs the kernel on its
    pixel shard under ``shard_map``; parameters enter replicated, so
    shard_map's transpose psums their cotangents over ICI — a multi-chip
    training step whose per-device compute is the 13 Mrays/s fused kernel,
    not the 0.9 Mrays/s wavefront.

    Returns ``step(params, px, py, target, key=None) -> (loss, grads)``
    (jit-able; pixel counts must divide mesh.size * 8).  Loss/gradients
    equal the single-device kernel for deterministic scenes (tested on the
    virtual mesh, tests/test_sharding.py); stochastic scenes draw
    DIFFERENT (decorrelated, fold_in(key, device)) per-device streams than
    the single-device lane layout — same estimator, different sample.
    ``key=None`` defaults to PRNGKey(0) so the per-device fold_in still
    decorrelates shards rather than replaying identical draws.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from advanced_cpu_raytracing_tpu.ops.pallas.megabwd import (
        bwd_eligible,
        make_diff_render,
    )
    from advanced_cpu_raytracing_tpu.parallel.mesh import TILE_AXIS
    from advanced_cpu_raytracing_tpu.render.camera import generate_rays
    from advanced_cpu_raytracing_tpu.render.renderer import (
        options_for_camera as _ofc,  # noqa: F401  (callers often need it)
    )

    if mesh is None:
        mesh = make_device_mesh()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert bwd_eligible(pack.static, opts, pack)
    render = make_diff_render(pack, opts, interpret=interpret)

    def loss_fn(params, px, py, target, key):
        if key is None:
            # stochastic draws must still decorrelate across devices —
            # fold_in below needs a real key, never a shared None
            key = jax.random.PRNGKey(0)

        def local(params, px_s, py_s, tgt_s, key):
            r = px_s.shape[0]
            # per-device PRNG stream for the replayed stochastic draws
            # (area offsets / dielectric branches / GI directions)
            k_dev = jax.random.fold_in(key, jax.lax.axis_index(TILE_AXIS))
            o, d = generate_rays(cam, px_s, py_s, jnp.zeros((r, 2)),
                                 dof=False)
            img = render(params, o, d, key=k_dev)
            # per-shard partial sum; mean taken globally below
            return jnp.sum((img - tgt_s) ** 2).reshape(1)

        in_specs = (P(), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P())
        parts = shard_map(local, mesh=mesh, in_specs=in_specs,
                          out_specs=P(TILE_AXIS), check_vma=False)(
            params, px, py, target, key)
        return jnp.sum(parts) / (3.0 * px.shape[0])

    return jax.jit(jax.value_and_grad(loss_fn))
