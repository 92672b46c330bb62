"""One-shot TPU verification sweep: render every runnable golden scene
through the production path (the fused megakernel routes automatically on
TPU), diff against the best available oracle, and print wall-clocks.

Usage: python tools/tpu_verify.py [--contrib] [--pt] [--perlin] [--bwd]
Run alone — one TPU process at a time in this environment (see
.claude/skills/verify/SKILL.md).

Oracles: freshly-rendered reference outputs under /tmp/acrt_ref/golden when
present (run the golden test suite once to populate), else the archived
hw1_outputs PNGs.  Note the ARCHIVED alt2 PNG predates the reference's
current camera (expect mean ~115 against it but ~0 against the fresh one)
and the finely-tessellated contributor scenes carry fp silhouette noise
(BASELINE.md).
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TOP = ["simple", "two_spheres", "spheres", "spheres_mirror",
       "cornellbox_recursive_conductors", "cornellbox_recursive_alt2",
       "scienceTree", "scienceTree_diamond"]
CONTRIB = ["akif_uslu/ton_Roosendaal_smooth", "akif_uslu/tower_smooth",
           "akif_uslu/windmill_smooth", "akif_uslu/berserker_smooth",
           "akif_uslu/car_smooth_fixed", "akif_uslu/low_poly_smooth"]
INPUTS = pathlib.Path("/root/reference/archive/hw1_inputs")
OUTPUTS = pathlib.Path("/root/reference/archive/hw1_outputs")
FRESH = pathlib.Path("/tmp/acrt_ref/golden")


def main() -> int:
    from PIL import Image

    from advanced_cpu_raytracing_tpu.render.renderer import (
        _mega_route,
        options_for_camera,
        render_camera,
    )
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    # dedicated modes skip the golden sweep (each runs as its own process;
    # re-sweeping 8 scenes per mode would triple the TPU time)
    modes = {"--bwd", "--env", "--stream", "--perlin", "--pt", "--bigtex"}
    names = [] if modes & set(sys.argv) else list(TOP)
    if "--contrib" in sys.argv:
        names += CONTRIB
    for name in names:
        scene = INPUTS / f"{name}.xml"
        if not scene.exists():
            print(f"{name}: scene missing")
            continue
        try:
            cfg = load_scene(str(scene))
            pack = pack_scene(cfg)
        except FileNotFoundError as e:
            print(f"{name}: assets missing ({e})")
            continue
        for cam_cfg in cfg.cameras:
            routed = _mega_route(pack, options_for_camera(cfg, cam_cfg))
            render_camera(pack, cfg, cam_cfg, seed=0, ldr=True)  # compile
            t0 = time.perf_counter()
            img = render_camera(pack, cfg, cam_cfg, seed=0, ldr=True)
            dt = time.perf_counter() - t0
            stem = cam_cfg.image_name.rsplit(".", 1)[0]
            oracle = FRESH / f"{stem}.png"
            tag = "fresh"
            if not oracle.exists():
                oracle = OUTPUTS / f"{name.rsplit('/', 1)[0]}" / f"{stem}.png" \
                    if "/" in name else OUTPUTS / f"{stem}.png"
                tag = "archived"
            if oracle.exists():
                gold = np.asarray(Image.open(oracle).convert("RGB"))
                d = np.abs(img.astype(int) - gold.astype(int))
                print(f"{stem}: mega={routed} {dt:.3f}s "
                      f"mean={d.mean():.3f} frac>2={(d > 2).mean():.4f} "
                      f"[{tag}]", flush=True)
            else:
                print(f"{stem}: mega={routed} {dt:.3f}s (no oracle)",
                      flush=True)

    if "--bwd" in sys.argv:
        # compiled fused fwd+bwd kernel (ops/pallas/megabwd.py) at FULL
        # depth vs jax.grad of the jnp wavefront (the CPU test tier stops at
        # depth 3: the interpret-mode module's XLA CPU compile blows up)
        import time as _time

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
        from advanced_cpu_raytracing_tpu.render.camera import (
            build_camera,
            generate_rays,
        )
        from advanced_cpu_raytracing_tpu.render.integrator import (
            RenderOptions,
            trace_radiance,
        )

        repo = pathlib.Path(__file__).resolve().parents[1]
        cases = [
            ("conductors", INPUTS / "cornellbox_recursive_conductors.xml"),
            ("alt2", INPUTS / "cornellbox_recursive_alt2.xml"),
            ("spotareaml", repo / "scenes" / "feat_spotareaml.xml"),
            ("pt", repo / "scenes" / "feat_pt.xml"),
            ("ptrr", repo / "scenes" / "feat_pt_rr.xml"),
            ("ptspec", repo / "scenes" / "feat_pt_spec.xml"),
        ]
        keys = ("mat_ambient", "mat_diffuse", "mat_specular", "mat_mirror",
                "mat_phong", "mat_radiance", "pl_intensity", "dl_radiance",
                "sl_intensity", "al_radiance", "ml_radiance", "bg_color",
                "verts")
        for cname, scene in cases:
            cfg = load_scene(str(scene))
            pack = pack_scene(cfg)
            cam = build_camera(cfg.cameras[0])
            opts = options_for_camera(cfg, cfg.cameras[0])
            assert bwd_eligible(pack.static, opts, pack), cname
            nrays = 8192
            rng = np.random.default_rng(0)
            cw, ch = cfg.cameras[0].width, cfg.cameras[0].height
            px = jnp.asarray(rng.uniform(0, cw, nrays).astype(np.float32))
            py = jnp.asarray(rng.uniform(0, ch, nrays).astype(np.float32))
            o, d = generate_rays(cam, px, py, jnp.zeros((nrays, 2)),
                                 dof=False)
            params = extract_params(pack, keys)
            render = make_diff_render(pack, opts)

            # RR scenes use a log1p loss: 1/prob fireflies reach ~1e4
            # radiance, where an img**2 cotangent amplifies benign 1e-6
            # lane diffs into apparent 1e-3 gradient gaps
            rr = bool(opts.russian_roulette and opts.path_tracing)

            def red(img, rr=rr):
                return (jnp.sum(jnp.log1p(img)) if rr
                        else jnp.sum(img ** 2))

            def loss_k(p, render=render, o=o, d=d, red=red):
                return red(jnp.asarray(render(p, o, d)))

            # dielectric scenes: the kernel is the stochastic single-path
            # estimator, so the oracle must run in the same mode (both
            # consume identical branch uniforms via wavefront_rng); PT
            # scenes likewise replay the same GI (and RR kill) draws
            from advanced_cpu_raytracing_tpu.render.integrator import (
                RR_DEPTH_FLOOR,
            )
            pt_spec = opts.path_tracing and (
                pack.static.has_mirror or pack.static.has_conductor
                or pack.static.has_dielectric)
            d_opts = RenderOptions(
                max_depth=opts.max_depth, differentiable=True,
                max_iters=opts.max_depth + 2 + (RR_DEPTH_FLOOR if rr else 0),
                stochastic_dielectric=pack.static.has_dielectric,
                stochastic_spec_gi=pt_spec,
                path_tracing=opts.path_tracing,
                next_event_estimation=opts.next_event_estimation,
                importance_sampling=opts.importance_sampling,
                russian_roulette=opts.russian_roulette)

            def loss_j(p, pack=pack, cam=cam, px=px, py=py, d_opts=d_opts,
                       red=red):
                img = trace_radiance(inject_params(pack, p), cam, px, py,
                                     jax.random.PRNGKey(0), d_opts)
                return red(img)

            t0 = _time.perf_counter()
            vk, gk = jax.jit(jax.value_and_grad(loss_k))(params)
            jax.block_until_ready(gk)
            print(f"megabwd[{cname}]: kernel compile+run "
                  f"{_time.perf_counter()-t0:.1f}s", flush=True)
            t0 = _time.perf_counter()
            vj, gj = jax.jit(jax.value_and_grad(loss_j))(params)
            jax.block_until_ready(gj)
            print(f"megabwd[{cname}]: jnp oracle compile+run "
                  f"{_time.perf_counter()-t0:.1f}s", flush=True)
            print(f"megabwd[{cname}]: value kernel={float(vk):.6g} "
                  f"jnp={float(vj):.6g}", flush=True)
            for k in keys:
                a = np.asarray(gj[k]).reshape(-1)
                b = np.asarray(gk[k]).reshape(-1)
                if a.size == 0:
                    continue
                scale = max(np.abs(a).max(), 1e-20)
                rel = np.abs(b - a).max() / scale
                print(f"megabwd[{cname}]: d{k}: max-rel-diff {rel:.2e}",
                      flush=True)
        return 0

    if "--env" in sys.argv:
        # env-lit scene through the fused kernel on TPU: wall-clock vs the
        # reference binary on the identical scene, plus image diff
        import subprocess
        import tempfile

        import jax

        from advanced_cpu_raytracing_tpu.scene.images import write_exr

        h, w = 32, 64
        ys, xs = np.mgrid[0:h, 0:w]
        env = np.stack([
            1.0 + 3.0 * xs / w,
            0.5 + 2.0 * ys / h,
            2.0 + np.where((ys > 8) & (ys < 14), 6.0, 0.0),
        ], axis=-1).astype(np.float32)
        td = pathlib.Path(tempfile.mkdtemp())
        write_exr(str(td / "env.exr"), env)
        # the reference's EXR loader resolves env images under inputs/
        # relative to its CWD (parser.cpp HDR path handling)
        (td / "inputs").mkdir()
        write_exr(str(td / "inputs" / "env.exr"), env)
        xml = """<Scene>
  <BackgroundColor>0 0 0</BackgroundColor>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 1 4</Position><Gaze>0 -0.1 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>800 600</ImageResolution>
    <ImageName>feat_env_tpu.png</ImageName>
  </Camera></Cameras>
  <Lights>
    <AmbientLight>5 5 5</AmbientLight>
    <SphericalDirectionalLight id="1"><ImageId>1</ImageId>
    </SphericalDirectionalLight>
  </Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.6 0.6 0.6</DiffuseReflectance>
      <SpecularReflectance>0.2 0.2 0.2</SpecularReflectance>
      <PhongExponent>20</PhongExponent></Material>
    <Material id="2" type="Mirror"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.1 0.1 0.1</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <MirrorReflectance>0.9 0.9 0.9</MirrorReflectance>
      <PhongExponent>1</PhongExponent></Material>
  </Materials>
  <Textures><Images><Image id="1">env.exr</Image></Images></Textures>
  <VertexData>
    -6 -1 4   6 -1 4   6 -1 -8   -6 -1 -8
    0 0 -2
  </VertexData>
  <Objects>
    <Mesh id="1"><Material>1</Material><Faces>1 2 3  1 3 4</Faces></Mesh>
    <Sphere id="1"><Material>2</Material><Center>5</Center>
      <Radius>1.0</Radius></Sphere>
  </Objects>
</Scene>"""
        scene = td / "feat_env_tpu.xml"
        scene.write_text(xml)

        ref_dt = None
        ref_png = None
        try:
            out = subprocess.run(["/root/reference/src/raytracer",
                                  str(scene)], cwd=td, capture_output=True,
                                 text=True, timeout=600)
            import re as _re
            m = _re.search(r"Rendering took: ([0-9.]+)s", out.stdout)
            ref_dt = float(m.group(1)) if m else None
            p = td / "feat_env_tpu.png"
            if p.exists():
                ref_png = p
        except Exception as e:  # noqa: BLE001
            print(f"env: reference run failed: {e}")

        cfg = load_scene(str(scene))
        pack = pack_scene(cfg)
        cam_cfg = cfg.cameras[0]
        opts = options_for_camera(cfg, cam_cfg)
        routed = _mega_route(pack, opts)
        img = np.asarray(render_camera(pack, cfg, cam_cfg, seed=0, ldr=True))
        t0 = time.perf_counter()
        img = np.asarray(render_camera(pack, cfg, cam_cfg, seed=1, ldr=True))
        dt = time.perf_counter() - t0
        print(f"env: mega={routed} tpu {dt:.3f}s "
              f"ref_cpu {ref_dt if ref_dt is not None else 'n/a'}s "
              f"({(ref_dt / dt):.1f}x)" if ref_dt else
              f"env: mega={routed} tpu {dt:.3f}s (no reference timing)",
              flush=True)
        if ref_png is not None:
            gold = np.asarray(Image.open(ref_png).convert("RGB")).astype(int)
            d = np.abs(img.astype(int) - gold)
            # surface shading is MC (independent streams): compare 8x8
            # block means; the deterministic env background dominates
            b = 8
            hh, ww = (d.shape[0] // b) * b, (d.shape[1] // b) * b
            blocks = np.abs(
                img[:hh, :ww].astype(np.float64).reshape(
                    hh // b, b, ww // b, b, 3).mean(axis=(1, 3))
                - gold[:hh, :ww].astype(np.float64).reshape(
                    hh // b, b, ww // b, b, 3).mean(axis=(1, 3)))
            print(f"env: vs reference mean={d.mean():.3f} "
                  f"blockmean={blocks.mean():.3f}", flush=True)
        return 0

    if "--stream" in sys.argv:
        # >500k-face synthetic terrain, TEXTURED since round 5 (textures
        # stream with the geometry): HBM-streamed megakernel (stream_geo)
        # vs the jnp per-entity BVH fallback on the same frame.
        # --stream-plain reproduces the round-4 untextured protocol.
        from advanced_cpu_raytracing_tpu.scene.synth import terrain_scene

        cfg = terrain_scene(n=513, width=640, height=480,
                            textured="--stream-plain" not in sys.argv)
        pack = pack_scene(cfg)
        cam_cfg = cfg.cameras[0]
        opts = options_for_camera(cfg, cam_cfg)
        assert _mega_route(pack, opts), "stream scene must route mega"
        from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
            build_mega,
        )

        mc = build_mega(pack, opts)[0]
        print(f"stream: faces={pack.static.n_work_items} "
              f"stream_geo={mc.stream_geo}", flush=True)
        img = np.asarray(render_camera(pack, cfg, cam_cfg, seed=0, ldr=True))
        t0 = time.perf_counter()
        img = np.asarray(render_camera(pack, cfg, cam_cfg, seed=1, ldr=True))
        dt = time.perf_counter() - t0
        rays = cam_cfg.width * cam_cfg.height
        mega_rate = rays / dt
        print(f"stream: mega {dt:.3f}s = {mega_rate / 1e6:.2f} Mrays/s "
              f"mean={img.mean():.2f}", flush=True)
        # The jnp fallback comparison runs at QUARTER resolution (160x120):
        # the full 640x480 fallback frame on 524k faces crashes the TPU
        # worker process outright (observed 2026-08-20: "TPU worker process
        # crashed", killing every later measurement in the battery).
        # Per-ray rates are what's compared, so a smaller frame is fair to
        # the fallback (same per-ray BVH work, smaller working set).
        import dataclasses

        small = dataclasses.replace(cam_cfg, width=160, height=120)
        small_rays = small.width * small.height
        img_m = np.asarray(render_camera(pack, cfg, small, seed=1, ldr=True))
        os.environ["ACRT_NO_MEGA"] = "1"
        try:
            img2 = np.asarray(render_camera(pack, cfg, small, seed=1,
                                            ldr=True))
            t0 = time.perf_counter()
            img2 = np.asarray(render_camera(pack, cfg, small, seed=1,
                                            ldr=True))
            dt2 = time.perf_counter() - t0
            fb_rate = small_rays / dt2
            print(f"stream: jnp BVH fallback {dt2:.3f}s @160x120 = "
                  f"{fb_rate / 1e6:.3f} Mrays/s "
                  f"({mega_rate / fb_rate:.1f}x slower per ray)", flush=True)
            d = np.abs(img_m.astype(int) - img2.astype(int))
            print(f"stream: mega vs fallback mean={d.mean():.4f}",
                  flush=True)
        finally:
            del os.environ["ACRT_NO_MEGA"]
        return 0

    if "--bigtex" in sys.argv:
        # round 5: MEGAPIXEL (1024x1024) texture through the HBM windowed
        # gather on real TPU — wall-clock vs the reference binary on the
        # identical scene + image diff, plus an HDR (EXR) texture variant
        # checked against the jnp fallback (imageTexture.h:60-133,
        # HDRImage.h:45-70 capabilities)
        import subprocess
        import tempfile

        from PIL import Image as PILImage

        from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
            build_mega,
        )
        from advanced_cpu_raytracing_tpu.scene.images import write_exr

        td = pathlib.Path(tempfile.mkdtemp())
        # smooth color field + soft checker: sub-texel fp differences
        # between implementations stay sub-LSB after quantization
        n = 1024
        ys, xs = np.mgrid[0:n, 0:n] / float(n)
        checker = ((np.floor(xs * 16) + np.floor(ys * 16)) % 2)
        tex = np.stack([
            120 + 100 * np.sin(6.28 * xs) * np.cos(3.14 * ys),
            60 + 60 * checker,
            200 * ys,
        ], axis=-1).clip(0, 255).astype(np.uint8)
        PILImage.fromarray(tex, "RGB").save(td / "mega.png")
        # the reference hardcodes an "inputs/" prefix on image paths
        # (parser.cpp:107-110); our parser searches <scene dir>/inputs too
        (td / "inputs").mkdir()
        PILImage.fromarray(tex, "RGB").save(td / "inputs" / "mega.png")

        xml = f"""<Scene>
  <BackgroundColor>10 10 20</BackgroundColor>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 1.2 4</Position><Gaze>0 -0.22 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>800 600</ImageResolution>
    <ImageName>feat_bigtex.png</ImageName>
  </Camera></Cameras>
  <Lights>
    <AmbientLight>25 25 25</AmbientLight>
    <PointLight id="1"><Position>2 4 2</Position>
      <Intensity>900 900 900</Intensity></PointLight>
  </Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.7 0.5 0.4</DiffuseReflectance>
      <SpecularReflectance>0.3 0.3 0.3</SpecularReflectance>
      <PhongExponent>25</PhongExponent></Material>
    <Material id="2" type="Mirror"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.1 0.1 0.1</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <MirrorReflectance>0.9 0.9 0.9</MirrorReflectance>
      <PhongExponent>1</PhongExponent></Material>
  </Materials>
  <Textures>
    <Images><Image id="1">mega.png</Image></Images>
    <TextureMap id="1" type="image">
      <DecalMode>replace_kd</DecalMode><ImageId>1</ImageId>
      <Interpolation>bilinear</Interpolation>
    </TextureMap>
  </Textures>
  <VertexData>
    -8 -1 4   8 -1 4   8 -1 -12   -8 -1 -12
    0 0.2 -2
  </VertexData>
  <TexCoordData>
    0 1   1 1   1 0   0 0
  </TexCoordData>
  <Objects>
    <Mesh id="1"><Material>1</Material><Textures>1</Textures>
      <Faces>1 2 3  1 3 4</Faces></Mesh>
    <Sphere id="1"><Material>2</Material><Center>5</Center>
      <Radius>1.0</Radius></Sphere>
  </Objects>
</Scene>"""
        scene = td / "feat_bigtex.xml"
        scene.write_text(xml)

        ref_dt = None
        ref_png = None
        try:
            out = subprocess.run(["/root/reference/src/raytracer",
                                  str(scene)], cwd=td, capture_output=True,
                                 text=True, timeout=600)
            import re as _re
            m = _re.search(r"Rendering took: ([0-9.]+)s", out.stdout)
            ref_dt = float(m.group(1)) if m else None
            p = td / "feat_bigtex.png"
            if p.exists():
                ref_png = p
        except Exception as e:  # noqa: BLE001
            print(f"bigtex: reference run failed: {e}")

        cfg = load_scene(str(scene))
        pack = pack_scene(cfg)
        cam_cfg = cfg.cameras[0]
        opts = options_for_camera(cfg, cam_cfg)
        assert _mega_route(pack, opts), "bigtex scene must route mega"
        mc = build_mega(pack, opts)[0]
        assert mc.big_textures and mc.big_textures[0], mc.big_textures
        img = np.asarray(render_camera(pack, cfg, cam_cfg, seed=0, ldr=True))
        t0 = time.perf_counter()
        img = np.asarray(render_camera(pack, cfg, cam_cfg, seed=1, ldr=True))
        dt = time.perf_counter() - t0
        if ref_dt:
            print(f"bigtex: mega tpu {dt:.3f}s ref_cpu {ref_dt}s "
                  f"({ref_dt / dt:.1f}x)", flush=True)
        else:
            print(f"bigtex: mega tpu {dt:.3f}s (no reference timing)",
                  flush=True)
        if ref_png is not None:
            gold = np.asarray(PILImage.open(ref_png).convert("RGB"))
            d = np.abs(img.astype(int) - gold.astype(int))
            print(f"bigtex: vs reference mean={d.mean():.3f} "
                  f"frac>2={(d > 2).mean():.4f}", flush=True)
        # compiled kernel vs jnp fallback, quarter res (deterministic)
        import dataclasses

        small = dataclasses.replace(cam_cfg, width=200, height=150)
        img_m = np.asarray(render_camera(pack, cfg, small, seed=1, ldr=True))
        os.environ["ACRT_NO_MEGA"] = "1"
        try:
            t0 = time.perf_counter()
            img_j = np.asarray(render_camera(pack, cfg, small, seed=1,
                                             ldr=True))
            dtj = time.perf_counter() - t0
        finally:
            del os.environ["ACRT_NO_MEGA"]
        d = np.abs(img_m.astype(int) - img_j.astype(int))
        print(f"bigtex: mega vs jnp fallback mean={d.mean():.4f} "
              f"max={d.max()} (fallback {dtj:.3f}s @200x150)", flush=True)

        # HDR variant: EXR texture (float texels) through the big table
        hdr = np.stack([
            0.4 + 2.5 * xs,
            0.2 + 1.5 * checker,
            3.0 * ys * ys,
        ], axis=-1).astype(np.float32)
        write_exr(str(td / "mega.exr"), hdr)
        write_exr(str(td / "inputs" / "mega.exr"), hdr)
        scene2 = td / "feat_bigtex_hdr.xml"
        scene2.write_text(xml.replace("mega.png", "mega.exr")
                          .replace("feat_bigtex.png", "feat_bigtex_hdr.png"))
        cfg2 = load_scene(str(scene2))
        pack2 = pack_scene(cfg2)
        opts2 = options_for_camera(cfg2, cfg2.cameras[0])
        assert _mega_route(pack2, opts2), "hdr scene must route mega"
        img = np.asarray(render_camera(pack2, cfg2, cfg2.cameras[0], seed=0,
                                       ldr=True))
        t0 = time.perf_counter()
        img = np.asarray(render_camera(pack2, cfg2, cfg2.cameras[0], seed=1,
                                       ldr=True))
        dt = time.perf_counter() - t0
        small2 = dataclasses.replace(cfg2.cameras[0], width=200, height=150)
        img_m = np.asarray(render_camera(pack2, cfg2, small2, seed=1,
                                         ldr=True))
        os.environ["ACRT_NO_MEGA"] = "1"
        try:
            img_j = np.asarray(render_camera(pack2, cfg2, small2, seed=1,
                                             ldr=True))
        finally:
            del os.environ["ACRT_NO_MEGA"]
        d = np.abs(img_m.astype(int) - img_j.astype(int))
        print(f"bigtex: HDR(exr) mega tpu {dt:.3f}s; vs jnp fallback "
              f"mean={d.mean():.4f} max={d.max()}", flush=True)
        return 0

    if "--perlin" in sys.argv:
        # authored mesh-perlin scene: compiled-mode perm-table gathers vs the
        # jnp fallback (bit-identical expected; tests only cover interpret)
        import re
        import tempfile

        src = pathlib.Path(__file__).resolve().parents[1] \
            / "tests" / "test_megakernel.py"
        m = re.search(r'PERLIN_SCENE = """(<Scene>.*?</Scene>)"""',
                      src.read_text(), re.S)
        with tempfile.NamedTemporaryFile("w", suffix=".xml",
                                         delete=False) as f:
            f.write(m.group(1))
            path = f.name
        cfg = load_scene(path)
        pack = pack_scene(cfg)
        cam_cfg = cfg.cameras[0]
        assert _mega_route(pack, options_for_camera(cfg, cam_cfg))
        img = np.asarray(render_camera(pack, cfg, cam_cfg, seed=0, ldr=True))
        os.environ["ACRT_NO_MEGA"] = "1"
        ref = np.asarray(render_camera(pack, cfg, cam_cfg, seed=0, ldr=True))
        del os.environ["ACRT_NO_MEGA"]
        d = np.abs(img.astype(int) - ref.astype(int))
        print(f"megaperlin: compiled-kernel vs jnp fallback "
              f"mean={d.mean():.4f} max={d.max()}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
