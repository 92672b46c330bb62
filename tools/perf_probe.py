"""Stage-level TPU perf probe: times closest-hit, shading, one loop
iteration and the full render at a given lane count.

Usage: python tools/perf_probe.py [scene.xml] [lanes]
Run alone — only one TPU process at a time in this environment.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def bench_fn(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/archive/hw1_inputs/cornellbox_recursive_conductors.xml"
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 19

    from advanced_cpu_raytracing_tpu.ops.traverse import closest_hit, occluded
    from advanced_cpu_raytracing_tpu.render import integrator as I
    from advanced_cpu_raytracing_tpu.render.camera import build_camera, generate_rays
    from advanced_cpu_raytracing_tpu.render.shading import surface_at
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    print(f"backend={jax.default_backend()} lanes={lanes} scene={scene}")
    cfg = load_scene(scene)
    pack = pack_scene(cfg)
    cam = build_camera(cfg.cameras[0])
    opts = I.RenderOptions(max_depth=cfg.max_recursion_depth)

    w, h = cfg.cameras[0].width, cfg.cameras[0].height
    idx = np.arange(lanes) % (w * h)
    px = jnp.asarray((idx % w).astype(np.float32))
    py = jnp.asarray((idx // w).astype(np.float32))
    key = jax.random.PRNGKey(0)

    o, d = jax.jit(generate_rays)(cam, px, py)
    t = bench_fn(jax.jit(lambda o, d: closest_hit(pack, o, d)), o, d)
    print(f"closest_hit:     {t*1e3:8.2f} ms  {lanes/t/1e6:8.1f} Mrays/s")

    tocc = bench_fn(
        jax.jit(lambda o, d: occluded(pack, o, d, jnp.full(lanes, jnp.inf))),
        o, d)
    print(f"occluded:        {tocc*1e3:8.2f} ms  {lanes/tocc/1e6:8.1f} Mrays/s")

    hit = jax.jit(lambda o, d: closest_hit(pack, o, d))(o, d)
    tsurf = bench_fn(
        jax.jit(lambda o, d, hit: surface_at(pack, o, d, jnp.zeros(lanes), hit)),
        o, d, hit)
    print(f"surface_at:      {tsurf*1e3:8.2f} ms")

    @jax.jit
    def one_node(o, d, hit):
        L = jnp.zeros((lanes, 3))
        stack = I._make_stack(lanes, 8)
        return I._process_hit(
            pack, opts, o, d, jnp.ones((lanes, 3)), jnp.zeros((lanes, 3)),
            jnp.ones(lanes), jnp.full(lanes, opts.max_depth, jnp.int32),
            jnp.zeros(lanes), key, hit, L, stack,
        )[0]

    tnode = bench_fn(one_node, o, d, hit)
    print(f"process_hit:     {tnode*1e3:8.2f} ms")

    f = jax.jit(partial(I.trace_radiance, opts=opts))
    tfull = bench_fn(lambda: f(pack, cam, px, py, key), iters=5)
    print(f"trace_radiance:  {tfull*1e3:8.2f} ms  {lanes/tfull/1e6:8.1f} Mpaths/s")


if __name__ == "__main__":
    main()
