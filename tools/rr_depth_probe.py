"""VERDICT r4 item 8: measure the fused fwd+bwd kernel's Mosaic compile at
17 unrolled segments (depth 8 + RR_DEPTH_FLOOR 8 + primary) — the data the
12-segment eligibility cap was waiting on.  Run alone on the TPU:
    python tools/rr_depth_probe.py [--depth N]
Prints compile wall-clock, run wall-clock and peak RSS; the result is
recorded in BASELINE.md and decides the bwd_eligible RR budget."""

from __future__ import annotations

import dataclasses
import os
import pathlib
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.diff.params import extract_params
from advanced_cpu_raytracing_tpu.ops.pallas.megabwd import (
    bc_depth,
    build_bwd_consts,
    make_diff_render,
)
from advanced_cpu_raytracing_tpu.render.camera import build_camera, generate_rays
from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera
from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene


def main() -> int:
    depth = (int(sys.argv[sys.argv.index("--depth") + 1])
             if "--depth" in sys.argv else 8)
    repo = pathlib.Path(__file__).resolve().parents[1]
    cfg = load_scene(str(repo / "scenes" / "feat_pt_rr.xml"))
    pack = pack_scene(cfg)
    cam = build_camera(cfg.cameras[0])
    opts = dataclasses.replace(options_for_camera(cfg, cfg.cameras[0]),
                               max_depth=depth)
    assert opts.path_tracing and opts.russian_roulette
    segs = bc_depth(build_bwd_consts(pack, opts, with_bwd=True))
    print(f"depth={depth} -> {segs} unrolled segments", flush=True)
    n = 8192
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, cfg.cameras[0].width, n)
                     .astype(np.float32))
    py = jnp.asarray(rng.uniform(0, cfg.cameras[0].height, n)
                     .astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    params = extract_params(pack, ("mat_diffuse", "ml_radiance", "verts"))
    render = make_diff_render(pack, opts)

    def loss(p):
        return jnp.sum(jnp.log1p(render(p, o, d)))

    step = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    v, g = step(params)
    jax.block_until_ready(g)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    v, g = step(params)
    jax.block_until_ready(g)
    t_run = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    fin = bool(np.isfinite(float(v))
               and all(np.isfinite(np.asarray(x)).all() for x in g.values()))
    print(f"segments={segs} compile+first-run {t_compile:.1f}s "
          f"steady-run {t_run:.3f}s peak-rss {rss:.1f} GB finite={fin}",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
