"""Benchmark harness: renders the cornellbox golden scene on the available
accelerator and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference CPU binary renders
archive/hw1_inputs/cornellbox_recursive_conductors.xml (800x800, 1 spp,
depth 6) in 0.382 s on this host's 8 threads (BASELINE.md) ==
1.675 Mpaths/s.  "paths" = primary samples; each carries its full recursive
tree (shadow + mirror/conductor bounces), matching the reference's
wall-clock accounting (src/main.cpp:199-201).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PATHS_PER_S = 800 * 800 / 0.382  # reference CPU, same scene

SCENE = "/root/reference/archive/hw1_inputs/cornellbox_recursive_conductors.xml"


def main() -> None:
    import jax

    from advanced_cpu_raytracing_tpu.render.camera import build_camera
    from advanced_cpu_raytracing_tpu.render.integrator import RenderOptions
    from advanced_cpu_raytracing_tpu.render.renderer import (
        options_for_camera,
        render_camera,
    )
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    cfg = load_scene(SCENE)
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]

    # warmup (compile)
    render_camera(pack, cfg, cam_cfg, seed=0)

    t0 = time.perf_counter()
    img = render_camera(pack, cfg, cam_cfg, seed=1)
    dt = time.perf_counter() - t0

    paths = cam_cfg.width * cam_cfg.height * max(cam_cfg.num_samples, 1)
    rate = paths / dt
    print(json.dumps({
        "metric": "cornellbox_800x800_whitted_paths_per_s",
        "value": round(rate / 1e6, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(rate / BASELINE_PATHS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
