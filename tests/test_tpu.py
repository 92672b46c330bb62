"""TPU-asserting test tier (round 5, VERDICT r4 item 9).

The committed gradcheck/parity artifacts under tools/artifacts/ are
machine-checked claims here: every case runs the COMPILED kernels on real
hardware and asserts, instead of printing diffs like tools/tpu_verify.py.

Run ALONE (one TPU process at a time; tests/conftest.py keeps the real
backend only under this env var):

    ACRT_TPU_TESTS=1 python -m pytest tests/test_tpu.py -m tpu -q
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not os.environ.get("ACRT_TPU_TESTS")
        or jax.default_backend() != "tpu",
        reason="needs ACRT_TPU_TESTS=1 and real TPU hardware"),
]

HW1 = "/root/reference/archive/hw1_inputs/"


def _load(path):
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    cfg = load_scene(path)
    return cfg, pack_scene(cfg)


def test_tpu_megakernel_golden():
    """Compiled megakernel vs the archived golden PNG (conductors)."""
    from PIL import Image

    from advanced_cpu_raytracing_tpu.render.renderer import (
        _mega_route,
        options_for_camera,
        render_camera,
    )

    cfg, pack = _load(HW1 + "cornellbox_recursive_conductors.xml")
    cam_cfg = cfg.cameras[0]
    assert _mega_route(pack, options_for_camera(cfg, cam_cfg))
    img = render_camera(pack, cfg, cam_cfg, seed=0, ldr=True)
    gold = np.asarray(Image.open(
        "/root/reference/archive/hw1_outputs/"
        "cornellbox_recursive_conductors.png").convert("RGB"))
    d = np.abs(img.astype(int) - gold.astype(int))
    assert d.mean() < 0.5, d.mean()
    assert (d > 2).mean() < 0.01, (d > 2).mean()


def test_tpu_bigtex_compiled_matches_fallback(tmp_path):
    """Compiled HBM windowed texture gather == jnp fallback (max 1 LSB)
    on a megapixel bilinear texture scene."""
    import dataclasses

    from PIL import Image as PILImage

    from advanced_cpu_raytracing_tpu.render.renderer import (
        _mega_route,
        options_for_camera,
        render_camera,
    )
    from tests.test_megakernel import IMAGE_SCENE, _write_test_png

    img1 = tmp_path / "m1.png"
    img2 = tmp_path / "m2.png"
    n = 1024
    ys, xs = np.mgrid[0:n, 0:n] / float(n)
    tex = np.stack([
        120 + 100 * np.sin(6.28 * xs),
        60 + 60 * ((np.floor(xs * 16) + np.floor(ys * 16)) % 2),
        200 * ys,
    ], axis=-1).clip(0, 255).astype(np.uint8)
    PILImage.fromarray(tex, "RGB").save(img1)
    _write_test_png(img2, 33, 7, 4)
    p = tmp_path / "big.xml"
    p.write_text(IMAGE_SCENE.format(img1=img1, img2=img2))
    cfg, pack = _load(str(p))
    cam_cfg = dataclasses.replace(cfg.cameras[0], width=200, height=152)
    opts = options_for_camera(cfg, cam_cfg)
    assert _mega_route(pack, opts)
    img_m = np.asarray(render_camera(pack, cfg, cam_cfg, seed=1, ldr=True))
    os.environ["ACRT_NO_MEGA"] = "1"
    try:
        img_j = np.asarray(render_camera(pack, cfg, cam_cfg, seed=1,
                                         ldr=True))
    finally:
        del os.environ["ACRT_NO_MEGA"]
    d = np.abs(img_m.astype(int) - img_j.astype(int))
    assert d.max() <= 1, (d.max(), d.mean())


def test_tpu_stream_compiled_matches_fallback():
    """Compiled HBM-streamed textured terrain == jnp fallback (bit-equal
    after u8 clamp)."""
    import dataclasses

    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import build_mega
    from advanced_cpu_raytracing_tpu.render.renderer import (
        _mega_route,
        options_for_camera,
        render_camera,
    )
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.synth import terrain_scene

    cfg = terrain_scene(n=257, width=320, height=240, textured=True)
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    opts = options_for_camera(cfg, cam_cfg)
    assert _mega_route(pack, opts)
    assert build_mega(pack, opts)[0].stream_geo
    img_m = np.asarray(render_camera(pack, cfg, cam_cfg, seed=1, ldr=True))
    small = dataclasses.replace(cam_cfg, width=160, height=120)
    img_ms = np.asarray(render_camera(pack, cfg, small, seed=1, ldr=True))
    os.environ["ACRT_NO_MEGA"] = "1"
    try:
        img_j = np.asarray(render_camera(pack, cfg, small, seed=1,
                                         ldr=True))
    finally:
        del os.environ["ACRT_NO_MEGA"]
    d = np.abs(img_ms.astype(int) - img_j.astype(int))
    assert d.mean() < 1e-3, d.mean()
    assert img_m.mean() > 1.0  # the full frame rendered something


@pytest.mark.parametrize("name,scene,tol", [
    ("conductors", HW1 + "cornellbox_recursive_conductors.xml", 5e-5),
    ("pt", "scenes/feat_pt.xml", 1e-4),
    ("ptspec", "scenes/feat_pt_spec.xml", 1e-4),
])
def test_tpu_bwd_gradcheck(name, scene, tol):
    """Compiled fused fwd+bwd kernel vs jax.grad of the differentiable
    wavefront at FULL depth — the machine-checked version of the committed
    gradcheck artifacts."""
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
        RR_DEPTH_FLOOR,
        RenderOptions,
        trace_radiance,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import (
        options_for_camera,
    )

    cfg, pack = _load(scene)
    cam = build_camera(cfg.cameras[0])
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert bwd_eligible(pack.static, opts, pack), name
    rr = opts.path_tracing and opts.russian_roulette
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
    n = 8192
    rng = np.random.default_rng(0)
    cw, ch = cfg.cameras[0].width, cfg.cameras[0].height
    px = jnp.asarray(rng.uniform(0, cw, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, ch, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    keys = ("mat_diffuse", "mat_mirror", "pl_intensity", "ml_radiance",
            "verts")
    params = extract_params(pack, keys)
    render = make_diff_render(pack, opts)

    def loss_k(p):
        return jnp.sum(jnp.log1p(jnp.asarray(render(p, o, d))))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(jnp.log1p(img))

    vk, gk = jax.jit(jax.value_and_grad(loss_k))(params)
    vj, gj = jax.jit(jax.value_and_grad(loss_j))(params)
    np.testing.assert_allclose(float(vk), float(vj), rtol=1e-4)
    for k in keys:
        a, b = np.asarray(gj[k]).reshape(-1), np.asarray(gk[k]).reshape(-1)
        if a.size == 0:
            continue
        scale = max(np.abs(a).max(), 1e-20)
        rel = np.abs(b - a).max() / scale
        assert rel <= tol, (name, k, rel)


def test_tpu_bwd_rr_flipped_lane_margin():
    """VERDICT r4 weak #3 made a measurement: under Russian roulette a
    handful of lanes sit exactly on the kill threshold, where ~1e-7 fp
    drift between kernel and oracle throughput flips the replayed
    decision.  Count the flipped lanes directly (per-lane |radiance|
    disagreement > 10%) and assert both that they are rare (< 0.5%) and
    that the gradients agree to 1e-2 despite them."""
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
        RR_DEPTH_FLOOR,
        RenderOptions,
        trace_radiance,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import (
        options_for_camera,
    )

    cfg, pack = _load("scenes/feat_pt_rr.xml")
    cam = build_camera(cfg.cameras[0])
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert opts.russian_roulette and bwd_eligible(pack.static, opts, pack)
    d_opts = RenderOptions(
        max_depth=opts.max_depth, differentiable=True,
        max_iters=opts.max_depth + 2 + RR_DEPTH_FLOOR,
        path_tracing=True, next_event_estimation=True,
        importance_sampling=opts.importance_sampling,
        russian_roulette=True)
    n = 8192
    rng = np.random.default_rng(0)
    cw, ch = cfg.cameras[0].width, cfg.cameras[0].height
    px = jnp.asarray(rng.uniform(0, cw, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, ch, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    params = extract_params(pack, ("mat_diffuse", "ml_radiance", "verts"))
    render = make_diff_render(pack, opts)

    img_k = np.asarray(jax.jit(lambda p: render(p, o, d))(params))
    img_j = np.asarray(jax.jit(lambda p: trace_radiance(
        inject_params(pack, p), cam, px, py, jax.random.PRNGKey(0),
        d_opts))(params))
    per_lane = np.abs(img_k - img_j).max(axis=-1)
    scale = np.maximum(np.abs(img_j).max(axis=-1), 1.0)
    flipped = (per_lane / scale) > 0.1
    assert flipped.mean() < 0.005, flipped.sum()
    # agreeing lanes match to RELATIVE fp noise (radiance spans 1e3 here)
    ok = ~flipped
    assert (per_lane[ok] / scale[ok]).max() < 2e-3, \
        (per_lane[ok] / scale[ok]).max()

    def loss_k(p):
        return jnp.sum(jnp.log1p(jnp.asarray(render(p, o, d))))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(jnp.log1p(img))

    _, gk = jax.jit(jax.value_and_grad(loss_k))(params)
    _, gj = jax.jit(jax.value_and_grad(loss_j))(params)
    for k in gk:
        a, b = np.asarray(gj[k]).reshape(-1), np.asarray(gk[k]).reshape(-1)
        scale = max(np.abs(a).max(), 1e-20)
        assert np.abs(b - a).max() / scale <= 1e-2, k


def test_tpu_texture_gradients_compiled(tmp_path):
    """Round-5 texel-cotangent streams, compiled: d(img_atlas) through the
    fused kernel matches the wavefront oracle on hardware."""
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
    from advanced_cpu_raytracing_tpu.render.renderer import (
        options_for_camera,
    )
    from PIL import Image as PILImage

    from tests.test_megabwd import TEX_BWD_SCENE

    rng = np.random.default_rng(7)
    img1 = tmp_path / "t1.png"
    img2 = tmp_path / "t2.png"
    PILImage.fromarray(rng.integers(0, 256, (12, 16, 3), dtype=np.uint8),
                       "RGB").save(img1)
    PILImage.fromarray(rng.integers(0, 256, (9, 8, 3), dtype=np.uint8),
                       "RGB").save(img2)
    p = tmp_path / "texbwd.xml"
    p.write_text(TEX_BWD_SCENE.format(img1=img1, img2=img2))
    cfg, pack = _load(str(p))
    cam = build_camera(cfg.cameras[0])
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert bwd_eligible(pack.static, opts, pack)
    d_opts = RenderOptions(max_depth=opts.max_depth, differentiable=True,
                           max_iters=opts.max_depth + 2)
    n = 8192
    rng2 = np.random.default_rng(3)
    px = jnp.asarray(rng2.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng2.uniform(0, 240, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    params = extract_params(pack, ("mat_diffuse", "img_atlas", "verts"))
    render = make_diff_render(pack, opts)

    def loss_k(p):
        img = jnp.asarray(render(p, o, d))
        return jnp.sum(img * jnp.cos(0.01 * img))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(img * jnp.cos(0.01 * img))

    vk, gk = jax.jit(jax.value_and_grad(loss_k))(params)
    vj, gj = jax.jit(jax.value_and_grad(loss_j))(params)
    np.testing.assert_allclose(float(vk), float(vj), rtol=1e-4)
    for k in gk:
        a, b = np.asarray(gj[k]).reshape(-1), np.asarray(gk[k]).reshape(-1)
        scale = max(np.abs(a).max(), 1e-20)
        assert np.abs(b - a).max() / scale <= 1e-4, k
    assert np.abs(np.asarray(gk["img_atlas"])).sum() > 0
