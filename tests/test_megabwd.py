"""Fused fwd+bwd kernel (ops/pallas/megabwd.py) vs the jnp wavefront.

Oracle: jax.grad of trace_radiance(differentiable=True) — both paths share
the stop-gradient-on-topology stance, constant tri normals (pack.tri_normal)
and constant sphere geometry, so gradients must agree to fp tolerance.
Kernel runs in interpreter mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advanced_cpu_raytracing_tpu.diff.params import extract_params, inject_params
from advanced_cpu_raytracing_tpu.ops.pallas.megabwd import (
    bwd_eligible,
    make_diff_render,
)
from advanced_cpu_raytracing_tpu.render.camera import build_camera, generate_rays
from advanced_cpu_raytracing_tpu.render.integrator import (
    RenderOptions,
    trace_radiance,
)
from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera
from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene
from tests.conftest import HW1_INPUTS

PARAMS = ("mat_ambient", "mat_diffuse", "mat_specular", "mat_mirror",
          "mat_phong", "pl_intensity", "dl_radiance", "bg_color", "verts")


def _setup(name, n=512, seed=3, max_depth=3):
    """max_depth defaults to 3 on CPU: the interpret-mode bwd kernel is one
    giant XLA module whose CPU compile grows with the unrolled chain (~15 s
    at depth 3, tens of minutes at depth 6 on this 2-vCPU host).  Depth 3
    exercises multi-segment specular chains (sphere -> sphere -> wall);
    tools/tpu_verify.py --bwd covers the full-depth kernel on real TPU."""
    import dataclasses

    cfg = load_scene(str(HW1_INPUTS / f"{name}.xml"))
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    if max_depth is not None:
        opts = dataclasses.replace(
            opts, max_depth=min(opts.max_depth, max_depth))
    assert bwd_eligible(pack.static, opts, pack), name
    rng = np.random.default_rng(seed)
    px = jnp.asarray(rng.uniform(0, cam_cfg.width, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, cam_cfg.height, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    d_opts = RenderOptions(max_depth=opts.max_depth, differentiable=True,
                           max_iters=opts.max_depth + 2)
    return cfg, pack, cam, opts, d_opts, px, py, o, d


def _oracle_loss(pack, cam, d_opts, px, py):
    def loss(params):
        p = inject_params(pack, params)
        img = trace_radiance(p, cam, px, py, jax.random.PRNGKey(0), d_opts)
        return jnp.sum(img * jnp.cos(0.01 * img))  # non-trivial cotangent
    return loss


def _kernel_loss(pack, opts, o, d):
    f = make_diff_render(pack, opts, interpret=True)

    def loss(params):
        img = f(params, o, d)
        return jnp.sum(img * jnp.cos(0.01 * img))
    return loss


@pytest.mark.parametrize("scene", [
    "simple",
    "cornellbox_recursive_conductors",
    pytest.param(
        "spheres_mirror",
        marks=pytest.mark.skipif(
            not __import__("os").environ.get("ACRT_FULL_GOLDENS"),
            reason="5-sphere mirror chain: XLA CPU takes ~10 min to compile "
                   "the interpret-mode reverse sweep; ACRT_FULL_GOLDENS=1 "
                   "runs it (TPU Mosaic compiles the same kernel in "
                   "seconds — tools/tpu_verify.py --bwd)")),
])
def test_megabwd_value_and_grads_match_wavefront(scene):
    depth = 2 if scene == "spheres_mirror" else 3
    cfg, pack, cam, opts, d_opts, px, py, o, d = _setup(
        scene, n=256, max_depth=depth)
    params = extract_params(pack, PARAMS)

    l_oracle = _oracle_loss(pack, cam, d_opts, px, py)
    l_kernel = _kernel_loss(pack, opts, o, d)

    v0, g0 = jax.value_and_grad(l_oracle)(params)
    v1, g1 = jax.value_and_grad(l_kernel)(params)

    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-4)
    for k in PARAMS:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        if a.size == 0:
            continue
        assert np.all(np.isfinite(b)), k
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-4 * scale,
            err_msg=f"{scene}:{k}")


def test_megabwd_forward_matches_wavefront():
    """Primal (fwd-only kernel) equals the non-diff wavefront radiance."""
    _, pack, cam, opts, d_opts, px, py, o, d = _setup("cornellbox_recursive_conductors", n=1024)
    f = make_diff_render(pack, opts, interpret=True)
    img_k = f(extract_params(pack, PARAMS), o, d)
    img_j = trace_radiance(pack, cam, px, py, jax.random.PRNGKey(0), d_opts)
    np.testing.assert_allclose(np.asarray(img_k), np.asarray(img_j),
                               rtol=2e-4, atol=2e-3)


def test_megabwd_eligibility_gates():
    """Scenes outside the envelope must not route to the fused bwd kernel;
    dielectric scenes are INSIDE it since round 4 (stochastic single-path)."""
    cfg = load_scene(str(HW1_INPUTS / "cornellbox_recursive_alt2.xml"))
    pack = pack_scene(cfg)  # dielectric chain, now eligible
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert bwd_eligible(pack.static, opts, pack)

    cfg2 = load_scene(str(HW1_INPUTS / "simple.xml"))
    pack2 = pack_scene(cfg2)
    opts2 = options_for_camera(cfg2, cfg2.cameras[0])
    assert bwd_eligible(pack2.static, opts2, pack2)
    import dataclasses
    # PT on a diffuse-only scene is eligible since round 4, RR included;
    # round 5 lifted the 12-segment RR budget (17 segments measured on
    # hardware, tools/rr_depth_probe.py) and admitted specular+PT (the
    # stochastic single-child estimator)
    pt = dataclasses.replace(opts2, path_tracing=True)
    assert bwd_eligible(pack2.static, pt, pack2)
    pt_rr = dataclasses.replace(pt, russian_roulette=True)
    assert bwd_eligible(pack2.static, pt_rr, pack2)
    pt_rr_deep = dataclasses.replace(pt_rr, max_depth=8)
    assert bwd_eligible(pack2.static, pt_rr_deep, pack2)  # 17 segments
    assert not bwd_eligible(
        pack2.static, dataclasses.replace(pt_rr, max_depth=9), pack2)
    pt_spec = dataclasses.replace(
        options_for_camera(cfg, cfg.cameras[0]), path_tracing=True)
    assert bwd_eligible(pack.static, pt_spec, pack)  # dielectric + PT (r5)
    deep = dataclasses.replace(opts2, max_depth=9)
    assert not bwd_eligible(pack2.static, deep, pack2)
    # non-diffuse-decal textures stay on the wavefront (diffuse image
    # textures are differentiable leaves since round 5)
    st_tex = dataclasses.replace(pack2.static, n_textures=1)
    assert not bwd_eligible(st_tex, opts2, pack2)


def test_megabwd_dielectric_matches_stochastic_wavefront():
    """Dielectric chains (alt2 cornell: dielectric + conductor spheres,
    Beer absorption, TIR) through the fused kernel vs the stochastic
    single-path wavefront (integrator.py stochastic_dielectric).  Both
    consume the SAME branch uniforms — wavefront_rng replays the oracle's
    key-split schedule — so values and grads match lane-for-lane."""
    import dataclasses

    cfg = load_scene(str(HW1_INPUTS / "cornellbox_recursive_alt2.xml"))
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = dataclasses.replace(options_for_camera(cfg, cam_cfg), max_depth=3)
    assert bwd_eligible(pack.static, opts, pack)
    n = 256
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.uniform(0, cam_cfg.width, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, cam_cfg.height, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    d_opts = RenderOptions(max_depth=3, differentiable=True, max_iters=5,
                           stochastic_dielectric=True)
    params = extract_params(pack, PARAMS)
    f = make_diff_render(pack, opts, interpret=True)

    def loss_k(p):
        img = f(p, o, d)
        return jnp.sum(img * jnp.cos(0.01 * img))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(img * jnp.cos(0.01 * img))

    v0, g0 = jax.value_and_grad(loss_j)(params)
    v1, g1 = jax.value_and_grad(loss_k)(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-4)
    for k in PARAMS:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        if a.size == 0:
            continue
        assert np.all(np.isfinite(b)), k
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-4 * scale,
                                   err_msg=k)
    # the dielectric actually contributes: vertex grads exist on its mesh
    assert np.abs(np.asarray(g1["verts"])).sum() > 0


SPOT_AREA_ML_SCENE = str(
    __import__("pathlib").Path(__file__).resolve().parents[1]
    / "scenes" / "feat_spotareaml.xml")

ALL_PARAMS = PARAMS + ("mat_radiance", "sl_intensity", "al_radiance",
                       "ml_radiance")


def test_megabwd_spot_area_meshlight_emissive():
    """Spot + area + emissive mesh light (Whitted NEE of all three) through
    the fused kernel: the area offsets and mesh-light face/barycentric
    draws are replayed from the wavefront's key schedule, the emissive hit
    (raytracer.cpp:81-84) and mesh-light NEE (778-803) gradients flow to
    mat_radiance / ml_radiance / the light mesh's vertices."""
    cfg = load_scene(SPOT_AREA_ML_SCENE)
    pack = pack_scene(cfg)
    st = pack.static
    assert (st.n_spot, st.n_area, st.n_mesh_lights) == (1, 1, 1)
    assert st.has_emissive_mat
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    assert bwd_eligible(pack.static, opts, pack)
    n = 256
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.uniform(0, cam_cfg.width, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, cam_cfg.height, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    d_opts = RenderOptions(max_depth=opts.max_depth, differentiable=True,
                           max_iters=opts.max_depth + 2)
    params = extract_params(pack, ALL_PARAMS)
    f = make_diff_render(pack, opts, interpret=True)

    def loss_k(p):
        img = f(p, o, d)
        return jnp.sum(img * jnp.cos(0.01 * img))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(img * jnp.cos(0.01 * img))

    v0, g0 = jax.value_and_grad(loss_j)(params)
    v1, g1 = jax.value_and_grad(loss_k)(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-4)
    for k in ALL_PARAMS:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        if a.size == 0:
            continue
        assert np.all(np.isfinite(b)), k
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-4 * scale,
                                   err_msg=k)
    for k in ("sl_intensity", "al_radiance", "ml_radiance", "mat_radiance"):
        assert np.abs(np.asarray(g1[k])).sum() > 0, k


def test_megabwd_optimize_routing():
    """diff/optimize.py routes through the fused kernel (use_fused=True,
    interpret mode here) and still reduces the loss — the traced-parameter
    tables make every Adam step reuse one executable."""
    import dataclasses

    from advanced_cpu_raytracing_tpu.diff.optimize import optimize

    cfg = load_scene(str(HW1_INPUTS / "simple.xml"))
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = dataclasses.replace(
        options_for_camera(cfg, cam_cfg), max_depth=1)
    px = jnp.asarray(np.linspace(350, 450, 16, dtype=np.float32))
    py = jnp.asarray(np.full(16, 420, np.float32))
    f = make_diff_render(pack, opts, interpret=True)
    o, d = generate_rays(cam, px, py, jnp.zeros((16, 2)), dof=False)
    target = f(extract_params(pack, ("mat_diffuse",)), o, d)

    wrong = __import__("dataclasses").replace(
        pack, mat_diffuse=pack.mat_diffuse * 0.4)
    _, hist = optimize(wrong, cam, px, py, opts, target,
                       ("mat_diffuse",), steps=10, lr=0.08, use_fused=True)
    assert hist[-1] < hist[0] * 0.35, hist


PT_PARAMS = ("mat_ambient", "mat_diffuse", "mat_specular", "mat_phong",
             "mat_radiance", "ml_radiance", "bg_color", "verts")


@pytest.mark.parametrize("renderer_params", [
    "NextEventEstimation ImportanceSampling",
    "NextEventEstimation",
    "",
])
def test_megabwd_path_tracing_matches_wavefront(tmp_path, renderer_params):
    """Path tracing through the fused fwd+bwd kernel (round 4): the GI
    continuation consumes the oracle's replayed k_gi uniforms
    (wavefront_rng need_gi), the GI trace doubles as the next segment's
    scene trace, and NEE skips the mesh light each lane's GI ray hit —
    so values AND gradients match the differentiable wavefront
    lane-for-lane in all three RendererParams modes
    (raytracer.cpp:135-191)."""
    from tests.scene_builders import cornell_pt_xml

    (tmp_path / "pt.xml").write_text(
        cornell_pt_xml(depth=2, res=32, spp=1, params=renderer_params))
    cfg = load_scene(str(tmp_path / "pt.xml"))
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    assert opts.path_tracing
    assert bwd_eligible(pack.static, opts, pack)
    n = 256
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.uniform(0, cam_cfg.width, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, cam_cfg.height, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    d_opts = RenderOptions(
        max_depth=opts.max_depth, differentiable=True,
        max_iters=opts.max_depth + 2, path_tracing=True,
        next_event_estimation=opts.next_event_estimation,
        importance_sampling=opts.importance_sampling)
    params = extract_params(pack, PT_PARAMS)
    f = make_diff_render(pack, opts, interpret=True)

    def loss_k(p):
        img = f(p, o, d)
        return jnp.sum(img * jnp.cos(0.01 * img))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(img * jnp.cos(0.01 * img))

    v0, g0 = jax.value_and_grad(loss_j)(params)
    v1, g1 = jax.value_and_grad(loss_k)(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-4)
    for k in PT_PARAMS:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        if a.size == 0:
            continue
        assert np.all(np.isfinite(a)), f"oracle NaN: {k}"
        assert np.all(np.isfinite(b)), k
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-4 * scale,
                                   err_msg=k)
    # GI bounces actually carry gradient: the light's radiance reaches the
    # camera only through the sampled chain in the non-NEE mode
    assert np.abs(np.asarray(g1["mat_diffuse"])).sum() > 0
    assert (np.abs(np.asarray(g1["mat_radiance"])).sum()
            + np.abs(np.asarray(g1["ml_radiance"])).sum()) > 0
    if renderer_params.startswith("NextEventEstimation Importance"):
        # finite-difference check of the KERNEL's own forward on the wall
        # diffuse (estimator is deterministic given the replayed draws, so
        # central differences are exact up to fp noise)
        kd = np.asarray(params["mat_diffuse"]).copy()
        h = 1e-3
        vals = []
        for s in (+h, -h):
            kd2 = kd.copy()
            kd2[0, 0] += s
            p2 = dict(params)
            p2["mat_diffuse"] = jnp.asarray(kd2)
            vals.append(float(loss_k(p2)))
        fd = (vals[0] - vals[1]) / (2 * h)
        ad = float(np.asarray(g1["mat_diffuse"])[0, 0])
        np.testing.assert_allclose(ad, fd, rtol=2e-3)


def test_megabwd_path_tracing_russian_roulette(tmp_path):
    """RR in the fused kernel (late round 4): replayed kill draws
    (wavefront_rng need_rr), differentiable 1/prob reweight on the same
    throughput the kill used, RR_DEPTH_FLOOR extra unrolled segments
    (integrator.py:252-258).  depth 1 keeps the 10-segment interpret-mode
    compile ~1.5 min on this host.  The loss is log1p: RR fireflies
    (1/prob up to 1e4) make oscillatory losses chaotic in fp32, hiding
    the true lane-for-lane agreement."""
    from tests.scene_builders import cornell_pt_xml
    from advanced_cpu_raytracing_tpu.render.integrator import RR_DEPTH_FLOOR

    (tmp_path / "pt.xml").write_text(cornell_pt_xml(
        depth=1, res=32, spp=1,
        params="NextEventEstimation ImportanceSampling RussianRoulette"))
    cfg = load_scene(str(tmp_path / "pt.xml"))
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    assert opts.russian_roulette
    assert bwd_eligible(pack.static, opts, pack)
    n = 128
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.uniform(0, cam_cfg.width, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, cam_cfg.height, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    d_opts = RenderOptions(
        max_depth=opts.max_depth, differentiable=True,
        max_iters=opts.max_depth + RR_DEPTH_FLOOR + 2, path_tracing=True,
        next_event_estimation=True, importance_sampling=True,
        russian_roulette=True)
    params = extract_params(pack, PT_PARAMS)
    f = make_diff_render(pack, opts, interpret=True)

    def loss_k(p):
        return jnp.sum(jnp.log1p(f(p, o, d)))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(jnp.log1p(img))

    v0, g0 = jax.value_and_grad(loss_j)(params)
    v1, g1 = jax.value_and_grad(loss_k)(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-4)
    for k in PT_PARAMS:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        if a.size == 0:
            continue
        assert np.all(np.isfinite(a)), f"oracle NaN: {k}"
        assert np.all(np.isfinite(b)), k
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=1e-3 * scale,
                                   err_msg=k)
    # the RR tail actually fires: some lane survives past depth 0 (the
    # chain would otherwise stop at 2 segments and this test proves
    # nothing about the floor)
    assert float(jnp.sum(jnp.abs(g1["mat_radiance"]))) > 0


@pytest.mark.parametrize("dielectric", [False, True])
def test_megabwd_path_tracing_specular(tmp_path, dielectric):
    """PT + specular mixtures through the fused kernel (round 5): mirror
    and conductor walls (and optionally a glass sphere) in the PT cornell
    box.  Where a hit spawns both a GI child and a specular child, the
    replayed coin (wavefront_rng need_sg) picks one and doubles its
    weight — the stochastic_spec_gi estimator the oracle replays — so
    values and gradients match the wavefront lane-for-lane
    (raytracer.cpp:135-191 + 261-472)."""
    from tests.scene_builders import cornell_pt_spec_xml

    (tmp_path / "pts.xml").write_text(cornell_pt_spec_xml(
        depth=2, res=32, spp=1, params="NextEventEstimation",
        dielectric=dielectric))
    cfg = load_scene(str(tmp_path / "pts.xml"))
    pack = pack_scene(cfg)
    assert pack.static.has_mirror and pack.static.has_conductor
    assert pack.static.has_dielectric == dielectric
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    assert opts.path_tracing
    assert bwd_eligible(pack.static, opts, pack)
    n = 256
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.uniform(0, cam_cfg.width, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, cam_cfg.height, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    d_opts = RenderOptions(
        max_depth=opts.max_depth, differentiable=True,
        max_iters=opts.max_depth + 2, path_tracing=True,
        next_event_estimation=True,
        stochastic_dielectric=dielectric, stochastic_spec_gi=True)
    keys = PT_PARAMS + ("mat_mirror", "pl_intensity")
    params = extract_params(pack, keys)
    f = make_diff_render(pack, opts, interpret=True)

    def loss_k(p):
        img = f(p, o, d)
        return jnp.sum(img * jnp.cos(0.01 * img))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(img * jnp.cos(0.01 * img))

    v0, g0 = jax.value_and_grad(loss_j)(params)
    v1, g1 = jax.value_and_grad(loss_k)(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-4)
    for k in keys:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        if a.size == 0:
            continue
        assert np.all(np.isfinite(a)), f"oracle NaN: {k}"
        assert np.all(np.isfinite(b)), k
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-4 * scale,
                                   err_msg=k)
    # mirror gradients actually flow (a specular chain was taken by some
    # lane, otherwise this test proves nothing about the mixture)
    assert np.abs(np.asarray(g1["mat_mirror"])).sum() > 0
    # finite-difference check of the kernel's own forward on the mirror
    # reflectance (deterministic given the replayed draws)
    h = 1e-3
    mir = np.asarray(params["mat_mirror"]).copy()
    row = int(np.argmax(np.abs(np.asarray(g1["mat_mirror"])).sum(axis=1)))
    vals = []
    for s in (+h, -h):
        m2 = mir.copy()
        m2[row, 0] += s
        p2 = dict(params)
        p2["mat_mirror"] = jnp.asarray(m2)
        vals.append(float(loss_k(p2)))
    fd = (vals[0] - vals[1]) / (2 * h)
    ad = float(np.asarray(g1["mat_mirror"])[row, 0])
    np.testing.assert_allclose(ad, fd, rtol=5e-3, atol=1e-4)


TEX_BWD_SCENE = """<Scene>
  <BackgroundColor>2 2 2</BackgroundColor>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 0.6 3.5</Position><Gaze>0 -0.1 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>320 240</ImageResolution>
    <ImageName>texbwd.png</ImageName>
  </Camera></Cameras>
  <Lights>
    <AmbientLight>15 15 15</AmbientLight>
    <PointLight id="1"><Position>1 3 3</Position>
      <Intensity>400 400 400</Intensity></PointLight>
  </Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.5 0.4 0.3</DiffuseReflectance>
      <SpecularReflectance>0.2 0.2 0.2</SpecularReflectance>
      <PhongExponent>12</PhongExponent></Material>
    <Material id="2" type="mirror"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.05 0.05 0.05</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <MirrorReflectance>0.8 0.8 0.8</MirrorReflectance></Material>
  </Materials>
  <Textures>
    <Images>
      <Image id="1">{img1}</Image>
      <Image id="2">{img2}</Image>
    </Images>
    <TextureMap id="1" type="image">
      <DecalMode>replace_kd</DecalMode><ImageId>1</ImageId>
      <Interpolation>nearest</Interpolation>
    </TextureMap>
    <TextureMap id="2" type="image">
      <DecalMode>blend_kd</DecalMode><ImageId>2</ImageId>
      <Interpolation>bilinear</Interpolation>
    </TextureMap>
  </Textures>
  <VertexData>
    -4 -1 3   4 -1 3   4 -1 -6   -4 -1 -6
    -2.5 -1 -2   2.5 -1 -2   2.5 2 -2   -2.5 2 -2
  </VertexData>
  <TexCoordData>
    0 2   2 2   2 0   0 0
    0 1   1 1   1 0   0 0
  </TexCoordData>
  <Objects>
    <Mesh id="1"><Material>1</Material><Textures>1</Textures>
      <Faces>1 2 3  1 3 4</Faces></Mesh>
    <Mesh id="2"><Material>1</Material><Textures>2</Textures>
      <Faces vertexOffset="4" textureOffset="4">1 2 3  1 3 4</Faces></Mesh>
    <Sphere id="1"><Material>2</Material><Center>1</Center>
      <Radius>0.5</Radius></Sphere>
  </Objects>
</Scene>"""


def test_megabwd_texture_gradients(tmp_path):
    """Round 5: image textures are differentiable leaves of the fused
    kernel — the texel table is a traced input, per-tap cotangents stream
    back keyed by global texel index and reduce on the MXU, and bilinear
    weights/uv stay differentiable through the winner's barycentrics.
    d(img_atlas) (and everything else) must match the wavefront oracle,
    plus a finite-difference check on single texels."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(7)
    img1 = tmp_path / "t1.png"
    img2 = tmp_path / "t2.png"
    PILImage.fromarray(rng.integers(0, 256, (12, 16, 3), dtype=np.uint8),
                       "RGB").save(img1)
    PILImage.fromarray(rng.integers(0, 256, (9, 8, 3), dtype=np.uint8),
                       "RGB").save(img2)
    p = tmp_path / "texbwd.xml"
    p.write_text(TEX_BWD_SCENE.format(img1=img1, img2=img2))
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.n_textures == 2
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = options_for_camera(cfg, cam_cfg)
    assert bwd_eligible(pack.static, opts, pack)
    n = 512
    rng2 = np.random.default_rng(3)
    px = jnp.asarray(rng2.uniform(0, cam_cfg.width, n).astype(np.float32))
    py = jnp.asarray(rng2.uniform(0, cam_cfg.height, n).astype(np.float32))
    o, d = generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    d_opts = RenderOptions(max_depth=opts.max_depth, differentiable=True,
                           max_iters=opts.max_depth + 2)
    keys = ("mat_diffuse", "mat_mirror", "pl_intensity", "verts",
            "img_atlas")
    params = extract_params(pack, keys)
    f = make_diff_render(pack, opts, interpret=True)

    def loss_k(p):
        img = f(p, o, d)
        return jnp.sum(img * jnp.cos(0.01 * img))

    def loss_j(p):
        img = trace_radiance(inject_params(pack, p), cam, px, py,
                             jax.random.PRNGKey(0), d_opts)
        return jnp.sum(img * jnp.cos(0.01 * img))

    v0, g0 = jax.value_and_grad(loss_j)(params)
    v1, g1 = jax.value_and_grad(loss_k)(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-4)
    for k in keys:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        assert np.all(np.isfinite(a)), f"oracle NaN: {k}"
        assert np.all(np.isfinite(b)), k
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-4 * scale,
                                   err_msg=k)
    # texel gradients actually flow, on BOTH textures
    ga = np.asarray(g1["img_atlas"])
    assert np.abs(ga[0]).sum() > 0 and np.abs(ga[1]).sum() > 0
    # finite differences on the two most-visible texels (one per texture)
    atlas = np.asarray(params["img_atlas"]).copy()
    for img_i in (0, 1):
        flat = np.abs(ga[img_i]).sum(-1).reshape(-1)
        j_i = int(np.argmax(flat))
        jj, ii = divmod(j_i, atlas.shape[2])
        # h = 4 texel units: the f32 loss (~1e5) only resolves deltas to
        # ~1e-2, so the FD probe needs a large step; the modulation is
        # linear in the texel value, so no truncation error is added
        h = 4.0
        vals = []
        for s in (+h, -h):
            a2 = atlas.copy()
            a2[img_i, jj, ii, 1] += s
            p2 = dict(params)
            p2["img_atlas"] = jnp.asarray(a2)
            vals.append(float(loss_k(p2)))
        fd = (vals[0] - vals[1]) / (2 * h)
        ad = float(ga[img_i, jj, ii, 1])
        np.testing.assert_allclose(ad, fd, rtol=2e-2, atol=1e-5)
