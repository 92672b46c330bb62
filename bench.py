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
through round 2; re-measured every round in BASELINE.md so the two metric
eras stay bridged).

Reproducing the reference baseline: `python bench.py --ref16` rebuilds the
16-spp scene XML in /tmp, runs the reference binary 3x, and prints the raw
"Rendering took" timings (the recorded runs are in BASELINE.md).
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

BASELINE_PATHS_PER_S = 800 * 800 / 0.382  # reference CPU, same scene, 1 spp
# reference CPU on the identical 16-spp workload, best wall-clock ever
# observed (BASELINE.md "Round-3 reference re-baseline"; the round-4
# re-check measured 6.2-6.7 s, so this concedes the reference ~1.5x)
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
    when the scene is eligible; --bwd-jnp forces the jnp wavefront.
    --bwd-scene {conductors|alt2|spotareaml|pt|<path>} picks the scene
    (default conductors); alt2 = dielectric chains (stochastic single-path
    kernel), spotareaml = scenes/feat_spotareaml.xml (spot + area +
    emissive mesh light), pt = scenes/feat_pt.xml (path tracing: GI
    continuation + NEE + importance sampling, round 4)."""
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

    scenes = {
        "conductors": SCENE,
        "alt2": ("/root/reference/archive/hw1_inputs/"
                 "cornellbox_recursive_alt2.xml"),
        "spotareaml": "scenes/feat_spotareaml.xml",
        "pt": "scenes/feat_pt.xml",
        "ptrr": "scenes/feat_pt_rr.xml",
        "ptspec": "scenes/feat_pt_spec.xml",
    }
    name = "conductors"
    if "--bwd-scene" in sys.argv:
        name = sys.argv[sys.argv.index("--bwd-scene") + 1]
    scene_path = scenes.get(name, name)

    cfg = load_scene(scene_path)
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    cam = _camera_cached(cam_cfg)
    from advanced_cpu_raytracing_tpu.render.integrator import RR_DEPTH_FLOOR

    cam_opts = options_for_camera(cfg, cam_cfg)
    rr = cam_opts.path_tracing and cam_opts.russian_roulette
    # fixed-trip differentiable wavefront (reverse-mode AD cannot cross
    # lax.while_loop); depth+2 iterations covers the specular/GI chains
    # (+ the RR floor when roulette extends them)
    pt_spec = cam_opts.path_tracing and (
        pack.static.has_mirror or pack.static.has_conductor
        or pack.static.has_dielectric)
    opts = RenderOptions(max_depth=cfg.max_recursion_depth,
                         differentiable=True,
                         max_iters=cfg.max_recursion_depth + 2
                         + (RR_DEPTH_FLOOR if rr else 0),
                         stochastic_dielectric=pack.static.has_dielectric,
                         stochastic_spec_gi=pt_spec,
                         path_tracing=cam_opts.path_tracing,
                         next_event_estimation=cam_opts.next_event_estimation,
                         importance_sampling=cam_opts.importance_sampling,
                         russian_roulette=cam_opts.russian_roulette)

    w, h = 1920, 1080
    n = w * h
    # reverse-mode AD materializes every loop iteration's intermediates, so a
    # full 1080p frame is rendered as 8 gradient tiles whose grads sum (the
    # loss is a sum of per-tile sums)
    n_tiles = 8
    tile = n // n_tiles
    ys, xs = np.divmod(np.arange(n, dtype=np.int64), w)
    # map the 1080p sample grid onto the scene camera's pixel plane
    px_all = jnp.asarray(xs * (cam_cfg.width / w), jnp.float32)
    py_all = jnp.asarray(ys * (cam_cfg.height / h), jnp.float32)
    params = extract_params(pack, ("mat_diffuse", "pl_intensity", "verts"))

    use_fused = ("--bwd-jnp" not in sys.argv
                 and bwd_eligible(pack.static, cam_opts, pack)
                 and jax.default_backend() == "tpu")
    if use_fused:
        render = make_diff_render(pack, cam_opts)

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
        "metric": f"{name}_1080p_fwd_bwd_rays_per_s"
        if name != "conductors" else "cornellbox_1080p_fwd_bwd_rays_per_s",
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
    n_cells = math.isqrt(spp)
    assert n_cells * n_cells == spp, spp
    paths = w * h * spp
    pipeline = PIPELINE if spp == 1 else PIPELINE_16

    if mega:
        import jax
        import jax.numpy as jnp

        interpret = jax.default_backend() != "tpu"

        # PRNG keys and seed scalars are made on device BEFORE the timed
        # section (a PRNGKey costs a ~25 ms h2d round-trip on the tunnel;
        # the reference's own RNG seeding likewise sits outside its timer).
        # Key need mirrors render_camera: DoF / multisampling / host-RNG
        # scenes must not silently render a cheaper pinhole/no-RNG frame.
        cam = _camera_cached(cam_cfg)
        mc, tab, ctab, img_tab = _mega_build_cached(pack, opts)
        needs_key = cam.use_dof or n_cells > 1 or mc.host_rng
        keys = [jax.random.PRNGKey(i) if needs_key else None
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
        # best of 6: the tunneled device->host fetch bandwidth swings >2x
        # between ~0.3 s windows, and the 16-spp pipeline is fetch-bound;
        # the best window reflects device throughput (the reference
        # baseline is likewise best-of-3).  The median rides along in the
        # record so the headline isn't mistaken for a typical-run figure.
        samples = sorted(run_pipeline() for _ in range(6))
        dt = samples[0]
        dt_med = samples[len(samples) // 2]
    else:
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            render_camera(pack, cfg, cam_cfg, seed=1 + i, spp=spp, ldr=True)
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[0]
        dt_med = times[len(times) // 2]

    rate = paths / dt
    baseline = BASELINE_PATHS_PER_S if spp == 1 else BASELINE_16SPP_PATHS_PER_S
    print(json.dumps({
        "metric": f"cornellbox_800x800_whitted_{spp}spp_paths_per_s",
        "value": round(rate / 1e6, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(rate / baseline, 3),
        "median_value": round(paths / dt_med / 1e6, 4),
        "median_vs_baseline": round(paths / dt_med / baseline, 3),
    }))


def main_ref16() -> None:
    """Re-measure the reference CPU baseline on the identical 16-spp
    workload (methodology for BASELINE_16SPP_PATHS_PER_S): inject
    <NumSamples>16</NumSamples> into the scene XML, run the reference
    binary 3x, print each run's own "Rendering took" line."""
    import pathlib
    import re
    import subprocess
    import tempfile

    src = pathlib.Path(SCENE)
    xml = src.read_text()
    assert "<NumSamples>" not in xml
    xml = xml.replace("</ImageResolution>",
                      "</ImageResolution>\n<NumSamples>16</NumSamples>", 1)
    with tempfile.TemporaryDirectory() as td:
        scene = pathlib.Path(td) / src.name
        scene.write_text(xml)
        for i in range(3):
            out = subprocess.run(
                ["/root/reference/src/raytracer", str(scene)],
                cwd=td, capture_output=True, text=True, timeout=600)
            m = re.search(r"Rendering took: ([0-9.]+)s", out.stdout)
            print(f"run {i}: {m.group(1) if m else out.stdout!r} s")


if __name__ == "__main__":
    if "--bwd" in sys.argv:
        main_bwd()
    elif "--ref16" in sys.argv:
        main_ref16()
    else:
        main(spp1="--spp1" in sys.argv)
