"""Benchmark harness: renders the cornellbox golden scene on the available
accelerator and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference CPU binary renders
archive/hw1_inputs/cornellbox_recursive_conductors.xml (800x800, 1 spp,
depth 6) in 0.382 s on this host's 8 threads (BASELINE.md) ==
1.675 Mpaths/s.  "paths" = primary samples; each carries its full recursive
tree (shadow + mirror/conductor bounces), matching the reference's
wall-clock accounting (src/main.cpp:199-201).

Measurement: sustained throughput over a pipeline of N frames — every frame
is a full render whose clamped u8 image lands in host RAM (the reference's
timed section likewise fills a host u8 buffer, src/main.cpp:108-125).
Dispatches are issued back-to-back and images fetched asynchronously; on a
tunneled TPU the device->host link (~30 MB/s, ~50 ms latency) otherwise
dominates single-frame latency.  Per-frame latency and the device-only kernel
rate are recorded in BASELINE.md.

Headline metric (default): the SAME scene at 16 spp — the production
multisampling path (stratified 4x4 jitter + Gaussian filter accumulated
ON DEVICE, src/main.cpp:44-105 semantics, one u8 image fetched per frame).
The baseline is the reference binary timed on the IDENTICAL workload (same
XML + <NumSamples>16</NumSamples>, same host, Makefile -O3 build): best of
3 runs = 4.082 s -> 2.509 Mpaths/s (it gets FASTER per path at 16 spp than
its 1-spp 1.675 Mpaths/s, and the best run is used, so the comparison
favors the reference), while the TPU amortizes the fixed per-frame tunnel
fetch over 16x the paths.  Both sides count paths = width x height x spp.
`--spp1` runs the legacy 1-spp single-fetch-per-frame metric (recorded
through round 2).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_PATHS_PER_S = 800 * 800 / 0.382  # reference CPU, same scene, 1 spp
# reference CPU on the identical 16-spp workload, best of 3 (BASELINE.md
# round-3 table)
BASELINE_16SPP_PATHS_PER_S = 800 * 800 * 16 / 4.082

SCENE = "/root/reference/archive/hw1_inputs/cornellbox_recursive_conductors.xml"
PIPELINE = 8
PIPELINE_16 = 4


def main_bwd() -> None:
    """North-star metric (BASELINE.json): Mrays/s/chip fwd+bwd at 1080p for
    the differentiable path — value_and_grad of a pixel-MSE loss w.r.t.
    material colors, light intensities and vertex positions.  The reference
    has no backward pass at all, so vs_baseline compares against its FORWARD
    CPU rate (1.675 Mpaths/s) — the honest statement being "a full fwd+bwd
    step costs this much vs the reference's fwd-only render".

    Routes through the fused fwd+bwd Pallas kernel (ops/pallas/megabwd.py)
    when the scene is eligible; --bwd-jnp forces the jnp wavefront."""
    import jax
    import jax.numpy as jnp

    from advanced_cpu_raytracing_tpu.diff.params import (
        extract_params,
        inject_params,
    )
    from advanced_cpu_raytracing_tpu.ops.pallas.megabwd import (
        bwd_eligible,
        make_diff_render,
    )
    from advanced_cpu_raytracing_tpu.render.camera import generate_rays
    from advanced_cpu_raytracing_tpu.render.integrator import (
        RenderOptions,
        trace_radiance,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import (
        _camera_cached,
        options_for_camera,
    )
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    cfg = load_scene(SCENE)
    pack = pack_scene(cfg)
    cam = _camera_cached(cfg.cameras[0])
    # fixed-trip differentiable wavefront (reverse-mode AD cannot cross
    # lax.while_loop); 8 iterations covers the conductor chains at depth 6
    opts = RenderOptions(max_depth=cfg.max_recursion_depth,
                         differentiable=True, max_iters=8)

    w, h = 1920, 1080
    n = w * h
    # reverse-mode AD materializes every loop iteration's intermediates, so a
    # full 1080p frame is rendered as 8 gradient tiles whose grads sum (the
    # loss is a sum of per-tile sums)
    n_tiles = 8
    tile = n // n_tiles
    ys, xs = np.divmod(np.arange(n, dtype=np.int64), w)
    # map 1080p sample grid onto the 800x800 camera plane
    px_all = jnp.asarray(xs * (800.0 / w), jnp.float32)
    py_all = jnp.asarray(ys * (800.0 / h), jnp.float32)
    params = extract_params(pack, ("mat_diffuse", "pl_intensity", "verts"))

    r_opts = options_for_camera(cfg, cfg.cameras[0])
    use_fused = ("--bwd-jnp" not in sys.argv
                 and bwd_eligible(pack.static, r_opts, pack)
                 and jax.default_backend() == "tpu")
    if use_fused:
        render = make_diff_render(pack, r_opts)

        def loss_fn(params, px, py, key):
            o, d = generate_rays(cam, px, py, jnp.zeros((px.shape[0], 2)),
                                 dof=False)
            img = render(params, o, d)
            return jnp.sum(img ** 2) / float(n)
    else:
        def loss_fn(params, px, py, key):
            p = inject_params(pack, params)
            img = trace_radiance(p, cam, px, py, key, opts)
            return jnp.sum(img ** 2) / float(n)

    step = jax.jit(jax.value_and_grad(loss_fn))

    def full_frame(seed):
        total = 0.0
        grads = None
        for t in range(n_tiles):
            sl = slice(t * tile, (t + 1) * tile)
            loss, g = step(params, px_all[sl], py_all[sl],
                           jax.random.PRNGKey(seed * n_tiles + t))
            total += loss
            grads = g if grads is None else jax.tree_util.tree_map(
                jnp.add, grads, g)
        jax.block_until_ready((total, grads))
        return total, grads

    loss, grads = full_frame(0)
    assert np.isfinite(float(loss))

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        full_frame(1 + i)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    rate = n_tiles * tile / dt
    print(json.dumps({
        "metric": "cornellbox_1080p_fwd_bwd_rays_per_s",
        "value": round(rate / 1e6, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(rate / BASELINE_PATHS_PER_S, 3),
    }))


def main(spp1: bool = False) -> None:
    from advanced_cpu_raytracing_tpu.render.renderer import (
        _camera_cached,
        _mega_build_cached,
        _mega_route,
        _render_image_mega,
        options_for_camera,
        render_camera,
    )
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    cfg = load_scene(SCENE)
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    opts = options_for_camera(cfg, cam_cfg)
    w, h = cam_cfg.width, cam_cfg.height

    # warmup (compile)
    render_camera(pack, cfg, cam_cfg, seed=0, ldr=True)

    mega = _mega_route(pack, opts)
    spp = 1 if (spp1 or not mega) else 16
    n_cells = 4 if spp == 16 else 1
    paths = w * h * spp
    pipeline = PIPELINE if spp == 1 else PIPELINE_16

    if mega:
        import jax
        import jax.numpy as jnp

        cam = _camera_cached(cam_cfg)
        mc, tab, ctab, img_tab = _mega_build_cached(pack, opts)
        interpret = jax.default_backend() != "tpu"

        # PRNG keys and seed scalars are made on device BEFORE the timed
        # section (a PRNGKey costs a ~25 ms h2d round-trip on the tunnel;
        # the reference's own RNG seeding likewise sits outside its timer)
        keys = [jax.random.PRNGKey(i) if n_cells > 1 else None
                for i in range(pipeline)]
        seeds = [jnp.int32(i) for i in range(pipeline)]
        jax.block_until_ready([k for k in keys if k is not None] or seeds)

        def frame(i: int):
            return _render_image_mega(mc, tab, ctab, img_tab, cam, keys[i],
                                      seeds[i], n_cells, interpret,
                                      w, h, True)

        def run_pipeline() -> float:
            t0 = time.perf_counter()
            imgs = [frame(i) for i in range(pipeline)]
            for im in imgs:
                im.copy_to_host_async()
            for im in imgs:
                assert np.asarray(im).shape == (3, w * h)
            return (time.perf_counter() - t0) / pipeline

        run_pipeline()  # steady-state warmup
        dt = min(run_pipeline() for _ in range(3))
    else:
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            render_camera(pack, cfg, cam_cfg, seed=1 + i, spp=spp, ldr=True)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]

    rate = paths / dt
    baseline = BASELINE_PATHS_PER_S if spp == 1 else BASELINE_16SPP_PATHS_PER_S
    print(json.dumps({
        "metric": f"cornellbox_800x800_whitted_{spp}spp_paths_per_s",
        "value": round(rate / 1e6, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(rate / baseline, 3),
    }))


if __name__ == "__main__":
    if "--bwd" in sys.argv:
        main_bwd()
    else:
        main(spp1="--spp1" in sys.argv)
