"""Cross-check the fused Pallas integrator (ops/pallas/megakernel.py) against
the jnp wavefront integrator on eligible golden scenes.

Runs the kernel in interpreter mode at small ray counts — the two paths must
agree to fp tolerance because they implement the same shading tree (the
megakernel is a transcription of render/integrator.py::_process_hit).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
    build_mega,
    mega_eligible,
    mega_trace,
)
from advanced_cpu_raytracing_tpu.render import camera as cam_mod
from advanced_cpu_raytracing_tpu.render.camera import build_camera
from advanced_cpu_raytracing_tpu.render.integrator import (
    RenderOptions,
    trace_radiance,
)
from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

SCENES = [
    "simple.xml",  # depth 0, diffuse only
    "two_spheres.xml",  # sphere-only scene, no triangle table
    "spheres_mirror.xml",  # mirror chains, 2 point lights
    "cornellbox_recursive_conductors.xml",  # conductor Fresnel
    "cornellbox_recursive_alt2.xml",  # dielectric split + stack + Beer
]

REF = "/root/reference/archive/hw1_inputs/"


@pytest.mark.parametrize("scene", SCENES)
def test_megakernel_matches_wavefront(scene):
    cfg = load_scene(REF + scene)
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = RenderOptions(max_depth=cfg.max_recursion_depth)
    assert mega_eligible(pack.static, opts), "golden scene must be eligible"

    mc, tab, ctab, img_tab = build_mega(pack, opts)
    r = 1024
    rng = np.random.default_rng(7)
    px = jnp.asarray(rng.uniform(0, cam_cfg.width, r).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, cam_cfg.height, r).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((r, 2)),
                                 dof=cam.use_dof)

    l_ref = np.asarray(
        trace_radiance(pack, cam, px, py, jax.random.PRNGKey(0), opts))
    l_mega = np.asarray(mega_trace(mc, tab, ctab, o, d, interpret=True))

    diff = np.abs(l_ref - l_mega)
    # colors are in the reference's 0..255-ish radiance range; the only
    # allowed divergence is fp reassociation at silhouette edges
    assert np.mean(diff) < 0.01
    assert np.quantile(diff, 0.999) < 0.5


def test_ineligible_scenes_fall_back():
    """Differentiable renders must not route through the kernel (no VJP);
    PT on specular scenes IS eligible since round 2."""
    cfg = load_scene(REF + "cornellbox_recursive_conductors.xml")
    pack = pack_scene(cfg)
    assert mega_eligible(
        pack.static, RenderOptions(max_depth=6, path_tracing=True))
    assert not mega_eligible(
        pack.static, RenderOptions(max_depth=6, differentiable=True))


def test_renderer_tiled_mega_route_matches_wavefront(monkeypatch):
    """render_camera through the forced (interpreted) mega route — including
    the 32x32 tile permutation used for divergent dielectric scenes — must
    match the jnp wavefront render of the same small scene."""
    import re
    import tempfile

    import __graft_entry__ as ge
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import mega_eligible
    from advanced_cpu_raytracing_tpu.render.renderer import (
        options_for_camera,
        render_camera,
    )

    # demo scene minus its AreaLight (area lights are not mega-eligible)
    xml = re.sub(r"<AreaLight.*?</AreaLight>", "", ge._demo_scene_xml(),
                 flags=re.S)
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        path = f.name
    cfg = load_scene(path)
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]  # 64x64, mesh+mirror+dielectric, depth 4
    assert mega_eligible(pack.static, options_for_camera(cfg, cam_cfg))

    monkeypatch.setenv("ACRT_NO_MEGA", "1")
    ref = render_camera(pack, cfg, cam_cfg, seed=0)
    monkeypatch.delenv("ACRT_NO_MEGA")
    monkeypatch.setenv("ACRT_FORCE_MEGA", "1")
    got = render_camera(pack, cfg, cam_cfg, seed=0)

    diff = np.abs(ref - got)
    assert np.mean(diff) < 0.05
    assert np.quantile(diff, 0.999) < 1.0


def _pt_box_scene(tmp_path, renderer: str, pt: bool = True):
    """Small closed box with an emissive LightMesh ceiling panel.

    kd is darkened to ~0.35 and depth capped at 3 so the replicated
    reference estimator (per-bounce gain ~kd*(2/3)*2pi, divergent for
    kd > ~0.24 — see PARITY.md) stays tame enough for statistical
    comparison; the machinery exercised is identical."""
    from tests.test_golden_features import PT_BOX

    xml = PT_BOX.format(name="megapt", spp=1, params=renderer)
    xml = (xml.replace("0.7 0.7 0.7", "0.35 0.35 0.35")
              .replace("0.7 0.12 0.12", "0.35 0.1 0.1")
              .replace("0.12 0.7 0.12", "0.1 0.35 0.1")
              .replace("<MaxRecursionDepth>4</MaxRecursionDepth>",
                       "<MaxRecursionDepth>3</MaxRecursionDepth>"))
    if not pt:
        # strip the PathTracing renderer for the Whitted variant
        xml = xml.replace("<Renderer>PathTracing</Renderer>", "")
        xml = xml.replace("<RendererParams></RendererParams>", "")
    p = tmp_path / "megapt.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    return cfg, pack_scene(cfg)


def _mc_compare(pack, cfg, opts, n_seeds=24):
    """The two MC estimators (mega kernel with host-RNG table in interpret
    mode vs the jnp wavefront) must agree in expectation.  The estimator is
    heavy-tailed (rare light hits carry radiance*(2pi)^2 weights), so the
    check is a Welch z-test over per-seed GLOBAL means — per-lane stderr
    wildly understates tail variance (verified empirically: K=100 gives
    z=0.05 on the depth-1 box)."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_trace as _mt,
        mega_eligible as _me,
    )

    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts, host_rng=True)
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(9)
    n = 1024
    px = jnp.asarray(rng.uniform(0, 128, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 128, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)

    f = jax.jit(lambda k: trace_radiance(pack, cam, px, py, k, opts))
    m_means, j_means = [], []
    for s in range(n_seeds):
        m_means.append(float(np.asarray(
            _mt(mc, tab, ctab, o, d, interpret=True, seed=s,
                rng_key=jax.random.PRNGKey(50 + s))).mean()))
        j_means.append(float(np.asarray(f(jax.random.PRNGKey(200 + s))).mean()))
    m_arr, j_arr = np.array(m_means), np.array(j_means)
    z = abs(m_arr.mean() - j_arr.mean()) / np.sqrt(
        m_arr.var() / n_seeds + j_arr.var() / n_seeds + 1e-12)
    assert z < 4.0, (m_arr.mean(), j_arr.mean(), z)


@pytest.mark.parametrize("params", [
    "NextEventEstimation ImportanceSampling",
    "NextEventEstimation ImportanceSampling RussianRoulette",
    "",
])
def test_megakernel_path_tracing(tmp_path, params):
    """PT inside the fused kernel (GI continuation + NEE mesh-light loop +
    RR) vs the jnp wavefront estimator, in expectation over seeds."""
    cfg, pack = _pt_box_scene(tmp_path, params)
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    opts = options_for_camera(cfg, cfg.cameras[0])
    assert opts.path_tracing
    _mc_compare(pack, cfg, opts)


def test_megakernel_whitted_meshlight(tmp_path):
    """Whitted + LightMesh (emissive hit radiance + MC mesh-light NEE)
    through the kernel vs the jnp wavefront."""
    cfg, pack = _pt_box_scene(tmp_path, "", pt=False)
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    opts = options_for_camera(cfg, cfg.cameras[0])
    assert not opts.path_tracing
    _mc_compare(pack, cfg, opts)


def test_megakernel_spot_and_directional(tmp_path):
    """Spot + directional lights in-kernel (deterministic, exact compare)."""
    from tests.test_golden_features import (  # reuse the authored scene
        CAM,
        test_spot_and_directional_lights as _src,
    )
    import inspect
    import re

    src = inspect.getsource(_src)
    m = re.search(r'xml = f"""(<Scene>.*?</Scene>)"""', src, re.S)
    name = "megaspot"
    xml = eval(f'f"""{m.group(1)}"""')  # noqa: S307 — our own test template
    p = tmp_path / "megaspot.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_trace as _mt,
        mega_eligible as _me,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(3)
    n = 1024
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.01
    assert np.quantile(diff, 0.999) < 0.5


def test_megakernel_area_light(tmp_path):
    """Area light in-kernel (MC rectangle sampling) vs the jnp wavefront,
    in expectation over seeds."""
    import re

    import __graft_entry__ as ge
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    # demo scene: mesh floor + mirror + dielectric spheres + point&area light
    xml = ge._demo_scene_xml()
    p = tmp_path / "megaarea.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.n_area == 1
    opts = options_for_camera(cfg, cfg.cameras[0])
    _mc_compare(pack, cfg, opts, n_seeds=16)


def test_megakernel_motion_and_roughness(tmp_path):
    """Motion blur (per-face/per-sphere offsets + per-primary time draw) and
    glossy roughness in-kernel vs the jnp wavefront, in expectation."""
    xml = """<Scene>
  <MaxRecursionDepth>3</MaxRecursionDepth>
  <BackgroundColor>4 4 8</BackgroundColor>
  <Cameras><Camera id="1">
    <Position>0 1 4</Position><Gaze>0 -0.1 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>64 64</ImageResolution><ImageName>m.png</ImageName>
  </Camera></Cameras>
  <Lights>
    <AmbientLight>10 10 10</AmbientLight>
    <PointLight id="1"><Position>2 4 2</Position>
      <Intensity>600 600 600</Intensity></PointLight>
  </Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.6 0.6 0.6</DiffuseReflectance>
      <SpecularReflectance>0.2 0.2 0.2</SpecularReflectance>
      <PhongExponent>20</PhongExponent></Material>
    <Material id="2" type="mirror"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.1 0.1 0.1</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <MirrorReflectance>0.9 0.9 0.9</MirrorReflectance>
      <Roughness>0.15</Roughness></Material>
  </Materials>
  <VertexData>
    -5 0 -5   5 0 -5   5 0 5   -5 0 5   -0.9 0.7 0   0.9 0.7 0
  </VertexData>
  <Objects>
    <Mesh id="1"><Material>1</Material><Faces>1 3 2 1 4 3</Faces>
      <MotionBlur>0.6 0 0</MotionBlur></Mesh>
    <Sphere id="1"><Material>2</Material><Center>5</Center>
      <Radius>0.7</Radius></Sphere>
    <Sphere id="2"><Material>1</Material><Center>6</Center>
      <Radius>0.7</Radius><MotionBlur>0 0.8 0</MotionBlur></Sphere>
  </Objects>
</Scene>"""
    p = tmp_path / "m.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.has_motion and pack.static.has_rough
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    opts = options_for_camera(cfg, cfg.cameras[0])
    _mc_compare(pack, cfg, opts, n_seeds=16)


@pytest.mark.parametrize("extra_mat,extra_obj", [
    # mirror sphere in the PT box: specular chain + pushed GI children
    ("""<Material id="5" type="mirror"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.05 0.05 0.05</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <MirrorReflectance>0.85 0.85 0.85</MirrorReflectance></Material>""",
     """<Sphere id="1"><Material>5</Material><Center>13</Center>
      <Radius>0.4</Radius></Sphere>"""),
    # dielectric sphere: 3-way branching (reflect cont + refract & GI pushes)
    ("""<Material id="5" type="dielectric"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0 0 0</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <RefractionIndex>1.5</RefractionIndex>
      <AbsorptionCoefficient>0.05 0.02 0.01</AbsorptionCoefficient></Material>""",
     """<Sphere id="1"><Material>5</Material><Center>13</Center>
      <Radius>0.4</Radius></Sphere>"""),
])
def test_megakernel_specular_path_tracing(tmp_path, extra_mat, extra_obj):
    """PT with specular materials in-kernel: the specular chain continues
    in-register while GI children (and dielectric refraction legs) push onto
    the per-lane stack."""
    cfg, pack = _pt_box_scene(tmp_path, "NextEventEstimation ImportanceSampling")
    # rebuild the scene with an extra specular sphere + vertex
    from tests.test_golden_features import PT_BOX

    xml = PT_BOX.format(name="megaptspec", spp=1,
                        params="NextEventEstimation ImportanceSampling")
    xml = (xml.replace("0.7 0.7 0.7", "0.35 0.35 0.35")
              .replace("0.7 0.12 0.12", "0.35 0.1 0.1")
              .replace("0.12 0.7 0.12", "0.1 0.35 0.1")
              .replace("<MaxRecursionDepth>4</MaxRecursionDepth>",
                       "<MaxRecursionDepth>3</MaxRecursionDepth>")
              .replace("</Materials>", extra_mat + "</Materials>")
              .replace("-0.35 0.999 -0.25", "-0.35 0.999 -0.25   0 -0.5 0")
              .replace("</Objects>", extra_obj + "</Objects>"))
    p = tmp_path / "megaptspec.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.has_mirror or pack.static.has_dielectric
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    opts = options_for_camera(cfg, cfg.cameras[0])
    assert opts.path_tracing
    # the jnp wavefront's PT default is the stochastic single-path dielectric
    # estimator; the kernel's deterministic split has the same expectation
    _mc_compare(pack, cfg, opts, n_seeds=24)


def test_megakernel_brdf_zoo(tmp_path):
    """All five pluggable BRDF models in-kernel (static per-material params)
    vs the jnp wavefront — deterministic scene, exact compare."""
    import inspect
    import re

    from tests.test_golden_features import test_brdf_models_vs_reference as _src
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_trace as _mt,
        mega_eligible as _me,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    src = inspect.getsource(_src)
    m = re.search(r'xml = f"""(<Scene>.*?</Scene>)"""', src, re.S)
    name = "megabrdf"
    from tests.test_golden_features import CAM  # noqa: F401 — used in eval

    xml = eval(f'f"""{m.group(1)}"""')  # noqa: S307 — our own test template
    p = tmp_path / "megabrdf.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.n_brdfs == 5
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(4)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.01, np.mean(diff)
    assert np.quantile(diff, 0.999) < 0.5


PERLIN_SCENE = """<Scene>
  <BackgroundColor>4 4 8</BackgroundColor>
  <MaxRecursionDepth>3</MaxRecursionDepth>
  <ShadowRayEpsilon>1e-3</ShadowRayEpsilon>
  <Cameras><Camera id="1">
    <Position>0 1.2 4</Position><Gaze>0 -0.25 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>320 240</ImageResolution>
    <ImageName>megaperlin.png</ImageName>
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
    <Material id="2"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.2 0.4 0.8</DiffuseReflectance>
      <SpecularReflectance>0.5 0.5 0.5</SpecularReflectance>
      <PhongExponent>60</PhongExponent></Material>
    <Material id="3" type="mirror"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.1 0.1 0.1</DiffuseReflectance>
      <SpecularReflectance>0.1 0.1 0.1</SpecularReflectance>
      <MirrorReflectance>0.9 0.9 0.9</MirrorReflectance>
      <PhongExponent>5</PhongExponent></Material>
  </Materials>
  <Textures>
    <TextureMap id="1" type="perlin">
      <DecalMode>replace_kd</DecalMode>
      <NoiseConversion>absval</NoiseConversion>
      <NoiseScale>3</NoiseScale>
    </TextureMap>
    <TextureMap id="2" type="perlin">
      <DecalMode>blend_kd</DecalMode>
      <NoiseConversion>linear</NoiseConversion>
      <NoiseScale>1.5</NoiseScale>
    </TextureMap>
    <TextureMap id="3" type="perlin">
      <DecalMode>bump_normal</DecalMode>
      <NoiseConversion>linear</NoiseConversion>
      <NoiseScale>2.2</NoiseScale>
      <BumpFactor>3</BumpFactor>
    </TextureMap>
    <TextureMap id="4" type="perlin">
      <DecalMode>replace_ks</DecalMode>
      <NoiseConversion>absval</NoiseConversion>
      <NoiseScale>4</NoiseScale>
    </TextureMap>
  </Textures>
  <VertexData>
    -8 -1 4   8 -1 4   8 -1 -12   -8 -1 -12
    -8 -1 -6   8 -1 -6   8 7 -6   -8 7 -6
    -3 -1 1   -1 -1 1   -1 1 1    -3 1 1
    1 -1 0.5   3 -1 0.5   3 1 0.5   1 1 0.5
  </VertexData>
  <TexCoordData>
    0 1   1 1   1 0   0 0
    0 1   1 1   1 0   0 0
    0 1   1 1   1 0   0 0
    0 1   1 1   1 0   0 0
  </TexCoordData>
  <Objects>
    <Mesh id="1"><Material>1</Material><Textures>1 3</Textures>
      <Faces>1 2 3  1 3 4</Faces></Mesh>
    <Mesh id="2"><Material>2</Material><Textures>2 4</Textures>
      <Faces>5 6 7  5 7 8</Faces></Mesh>
    <Mesh id="3"><Material>3</Material>
      <Faces>9 10 11  9 11 12</Faces></Mesh>
    <Mesh id="4"><Material>2</Material><Textures>2</Textures>
      <Faces>13 14 15  13 15 16</Faces></Mesh>
  </Objects>
</Scene>"""


def test_megakernel_perlin_textures(tmp_path):
    """Procedural Perlin textures in-kernel — replace_kd (absval), blend_kd
    (linear), replace_ks, and bump_normal, with a mirror bouncing onto the
    textured floor — vs the jnp wavefront; deterministic, exact compare.
    The perm lookup is the lane-wise take_along_axis gather (megakernel.py
    perm_gather) and must match ops/texture.py::perlin_sample bit-for-bit."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_trace as _mt,
        mega_eligible as _me,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    p = tmp_path / "megaperlin.xml"
    p.write_text(PERLIN_SCENE)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.n_textures == 4
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert mc.perlin_diff and mc.perlin_spec and mc.perlin_bump
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(11)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.01, np.mean(diff)
    assert np.quantile(diff, 0.999) < 0.5


def test_megakernel_perlin_eligibility(tmp_path):
    """Bump-textured spheres and transformed bump meshes stay on the jnp
    fallback; diffuse-textured spheres route in-kernel since round 5, and
    the all-perlin mesh scene routes to the kernel."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        mega_eligible as _me,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    # diffuse-textured sphere -> in-kernel since round 5 (spherical UV)
    from tests.test_golden_features import CAM  # noqa: F401

    sphere_xml = PERLIN_SCENE.replace(
        "<Mesh id=\"4\"><Material>2</Material><Textures>2</Textures>\n"
        "      <Faces>13 14 15  13 15 16</Faces></Mesh>",
        "<Sphere id=\"1\"><Material>2</Material><Textures>2</Textures>\n"
        "      <Center>13</Center><Radius>1.0</Radius></Sphere>")
    assert sphere_xml != PERLIN_SCENE
    p = tmp_path / "sph.xml"
    p.write_text(sphere_xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert _me(pack.static, options_for_camera(cfg, cfg.cameras[0]), pack)

    # BUMP-textured sphere routes in-kernel too since late round 5
    # (analytic tangents at intersect time, sphere.cpp:116-137)
    bump_xml = sphere_xml.replace(
        "<Sphere id=\"1\"><Material>2</Material><Textures>2</Textures>",
        "<Sphere id=\"1\"><Material>2</Material><Textures>3</Textures>")
    p.write_text(bump_xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert _me(pack.static, options_for_camera(cfg, cfg.cameras[0]), pack)

    # transformed bump mesh -> fallback (kernel bump needs identity normals)
    rot_xml = PERLIN_SCENE.replace(
        "</Textures>",
        "</Textures>\n  <Transformations>"
        "<Rotation id=\"1\">30 0 1 0</Rotation></Transformations>"
    ).replace(
        "<Mesh id=\"1\"><Material>1</Material><Textures>1 3</Textures>",
        "<Mesh id=\"1\"><Material>1</Material><Textures>1 3</Textures>"
        "<Transformations>r1</Transformations>")
    assert rot_xml != PERLIN_SCENE
    p2 = tmp_path / "rot.xml"
    p2.write_text(rot_xml)
    cfg2 = load_scene(str(p2))
    pack2 = pack_scene(cfg2)
    assert not _me(pack2.static,
                   options_for_camera(cfg2, cfg2.cameras[0]), pack2)


def test_mesh_bump_requires_texcoords(tmp_path):
    """The reference's whole mesh normal/bump block is gated on the mesh
    having UV data (mesh.cpp:245) — perlin bump on a UV-less mesh silently
    no-ops.  The pack replicates that quirk by clearing the normal/bump
    slots (scene/pack.py::tex_slots), so both the kernel and the fallback
    agree with the reference."""
    import re

    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera
    from advanced_cpu_raytracing_tpu.scene.pack import SLOT_BUMP, SLOT_DIFFUSE

    xml = re.sub(r"<TexCoordData>.*?</TexCoordData>", "", PERLIN_SCENE,
                 flags=re.S)
    assert xml != PERLIN_SCENE
    p = tmp_path / "nouv.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    et = np.asarray(pack.ent_tex)
    assert (et[:, SLOT_BUMP] == -1).all()  # bump gated off
    assert (et[:, SLOT_DIFFUSE] >= 0).any()  # kd texture unaffected
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, _, _, _ = _bm(pack, opts)
    assert mc.perlin_bump == () and mc.perlin_diff


IMAGE_SCENE = """<Scene>
  <BackgroundColor>6 6 10</BackgroundColor>
  <MaxRecursionDepth>3</MaxRecursionDepth>
  <ShadowRayEpsilon>1e-3</ShadowRayEpsilon>
  <Cameras><Camera id="1">
    <Position>0 1.2 4</Position><Gaze>0 -0.25 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>320 240</ImageResolution>
    <ImageName>megaimage.png</ImageName>
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
    <Material id="2"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.2 0.4 0.8</DiffuseReflectance>
      <SpecularReflectance>0.5 0.5 0.5</SpecularReflectance>
      <PhongExponent>60</PhongExponent></Material>
    <Material id="3" type="mirror"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.1 0.1 0.1</DiffuseReflectance>
      <SpecularReflectance>0.1 0.1 0.1</SpecularReflectance>
      <MirrorReflectance>0.9 0.9 0.9</MirrorReflectance>
      <PhongExponent>5</PhongExponent></Material>
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
    <TextureMap id="3" type="image">
      <DecalMode>replace_ks</DecalMode><ImageId>2</ImageId>
      <Interpolation>bilinear</Interpolation>
    </TextureMap>
    <TextureMap id="4" type="perlin">
      <DecalMode>replace_kd</DecalMode>
      <NoiseConversion>absval</NoiseConversion>
      <NoiseScale>3</NoiseScale>
    </TextureMap>
  </Textures>
  <VertexData>
    -8 -1 4   8 -1 4   8 -1 -12   -8 -1 -12
    -8 -1 -6   8 -1 -6   8 7 -6   -8 7 -6
    -3 -1 1   -1 -1 1   -1 1 1    -3 1 1
    1 -1 0.5   3 -1 0.5   3 1 0.5   1 1 0.5
  </VertexData>
  <TexCoordData>
    0 3   3 3   3 0   0 0
    0 1   1 1   1 0   0 0
    0 1   1 1   1 0   0 0
    -0.25 1.3   1.3 1.3   1.3 -0.25   -0.25 -0.25
  </TexCoordData>
  <Objects>
    <Mesh id="1"><Material>1</Material><Textures>1</Textures>
      <Faces>1 2 3  1 3 4</Faces></Mesh>
    <Mesh id="2"><Material>2</Material><Textures>2 3</Textures>
      <Faces>5 6 7  5 7 8</Faces></Mesh>
    <Mesh id="3"><Material>3</Material>
      <Faces>9 10 11  9 11 12</Faces></Mesh>
    <Mesh id="4"><Material>2</Material><Textures>3 4</Textures>
      <Faces>13 14 15  13 15 16</Faces></Mesh>
  </Objects>
</Scene>"""


def _write_test_png(path, w, h, seed):
    from PIL import Image as PILImage

    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    PILImage.fromarray(data, "RGB").save(path)


def test_megakernel_image_textures(tmp_path):
    """LDR image textures in-kernel — nearest replace_kd with UV tiling
    (0..3 range), bilinear blend_kd, bilinear replace_ks mixed with a perlin
    replace_kd on the same entity, negative-UV clamping, plus a mirror
    bouncing onto the textured floor — vs the jnp wavefront.  The texel
    fetch is the packed-RGB row-masked lane gather (megakernel.py
    img_sample) against ops/texture.py::sample_image."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_trace as _mt,
        mega_eligible as _me,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    img1 = tmp_path / "t1.png"
    img2 = tmp_path / "t2.png"
    _write_test_png(img1, 16, 16, 3)
    _write_test_png(img2, 33, 7, 4)  # odd sizes: row masking + edge clamps
    p = tmp_path / "megaimage.xml"
    p.write_text(IMAGE_SCENE.format(img1=img1, img2=img2))
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.n_textures == 4
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert mc.img_diff and mc.img_spec and mc.perlin_diff
    assert img_tab.shape[0] == 2 + 2  # 16*16 -> 2 rows, 33*7=231 -> 2 rows
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(12)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.01, np.mean(diff)
    assert np.quantile(diff, 0.999) < 0.5


def test_megakernel_image_texture_eligibility(tmp_path):
    """HDR (float-texel) and oversized images stay on the jnp fallback;
    image normal-map decals do too."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        mega_eligible as _me,
        _IMG_MAX_TEXELS,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    def check(img1_path, xml_mut=None):
        img2 = tmp_path / "el2.png"
        _write_test_png(img2, 8, 8, 5)
        xml = IMAGE_SCENE.format(img1=img1_path, img2=img2)
        if xml_mut:
            xml = xml_mut(xml)
        p = tmp_path / "elig.xml"
        p.write_text(xml)
        cfg = load_scene(str(p))
        pack = pack_scene(cfg)
        return _me(pack.static, options_for_camera(cfg, cfg.cameras[0]),
                   pack)

    ok_png = tmp_path / "el1.png"
    _write_test_png(ok_png, 16, 16, 6)
    assert check(ok_png)

    # oversized image -> routes via the HBM windowed gather since round 5
    side = int(np.sqrt(_IMG_MAX_TEXELS)) + 9
    big_png = tmp_path / "big.png"
    _write_test_png(big_png, side, side, 7)
    assert check(big_png)

    # float texels (EXR) -> the big table too (f32 channel rows)
    from advanced_cpu_raytracing_tpu.scene.images import write_exr

    exr = tmp_path / "grad.exr"
    rng = np.random.default_rng(8)
    write_exr(str(exr), rng.uniform(0.0, 2.0, (8, 16, 3)).astype(np.float32))
    assert check(exr)

    # normal-map decal routes in-kernel since round 4
    assert check(ok_png, lambda x: x.replace(
        "<DecalMode>replace_ks</DecalMode>",
        "<DecalMode>replace_normal</DecalMode>"))

    # background-replace decal routes in-kernel since round 5 (pixel-uv
    # input planes)
    assert check(ok_png, lambda x: x.replace(
        "<DecalMode>replace_ks</DecalMode>",
        "<DecalMode>replace_background</DecalMode>"))


def _env_scene(tmp_path, mirror: bool = True, w: int = 64, h: int = 32):
    """Env-lit scene: lat-long EXR (default 64x32) + floor mesh + mirror
    sphere (mirror children sample the env on miss)."""
    from advanced_cpu_raytracing_tpu.scene.images import write_exr
    ys, xs = np.mgrid[0:h, 0:w]
    env = np.stack([
        1.0 + 3.0 * xs / w,
        0.5 + 2.0 * ys / h,
        2.0 + np.where((ys > 8) & (ys < 14), 6.0, 0.0),
    ], axis=-1).astype(np.float32)
    write_exr(str(tmp_path / "env.exr"), env)
    sphere = """<Sphere id="1"><Material>2</Material><Center>5</Center>
      <Radius>1.0</Radius></Sphere>""" if mirror else ""
    xml = f"""<Scene>
  <BackgroundColor>0 0 0</BackgroundColor>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 1 4</Position><Gaze>0 -0.1 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>320 240</ImageResolution>
    <ImageName>t.png</ImageName>
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
    {sphere}
  </Objects>
</Scene>"""
    p = tmp_path / "env_scene.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    return cfg, pack_scene(cfg)


def test_megakernel_env_light(tmp_path):
    """Spherical env light inside the fused kernel (round 4): lat-long
    lookup via in-kernel polynomial atan2/acos + row-masked gathers.  The
    env BACKGROUND (primary + mirror-child misses) is deterministic and
    must match the wavefront exactly; the surface direct term uses
    rejection-sampled directions (different RNG streams), so expectations
    compare over seeds."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.ops.traverse import closest_hit
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    cfg, pack = _env_scene(tmp_path)
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts, host_rng=True)
    assert mc.env[0] == 64 and mc.env[1] == 32
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(0)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    w_opts = RenderOptions(max_depth=cfg.max_recursion_depth)

    img_k = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True, seed=0,
                           rng_key=jax.random.PRNGKey(0), img_tab=img_tab))
    img_j = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), w_opts))
    hit = np.asarray(closest_hit(pack, o, d, jnp.zeros(n)).valid)
    assert (~hit).sum() > 200
    np.testing.assert_allclose(img_k[~hit], img_j[~hit], rtol=1e-5,
                               atol=1e-5)

    f = jax.jit(lambda k: trace_radiance(pack, cam, px, py, k, w_opts))
    ks, js = [], []
    n_seeds = 12
    for s in range(n_seeds):
        ks.append(float(np.asarray(
            _mt(mc, tab, ctab, o, d, interpret=True, seed=s,
                rng_key=jax.random.PRNGKey(50 + s),
                img_tab=img_tab))[hit].mean()))
        js.append(float(np.asarray(f(jax.random.PRNGKey(200 + s)))[hit]
                        .mean()))
    ka, ja = np.array(ks), np.array(js)
    z = abs(ka.mean() - ja.mean()) / np.sqrt(
        ka.var() / n_seeds + ja.var() / n_seeds + 1e-12)
    assert z < 4.0, (ka.mean(), ja.mean(), z)


def test_megakernel_env_eligibility(tmp_path):
    """Env maps of any committed size route in-kernel: small ones via the
    VMEM row-masked gather, megapixel ones (round 5) via the HBM windowed
    gather (env_big)."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        _IMG_MAX_TEXELS,
        build_mega as _bm,
        mega_eligible as _me,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera
    from advanced_cpu_raytracing_tpu.scene.images import write_exr

    cfg, pack = _env_scene(tmp_path, mirror=False)
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    assert not _bm(pack, opts)[0].env_big

    side = int(np.sqrt(_IMG_MAX_TEXELS)) + 9
    big = np.ones((side, side, 3), np.float32)
    write_exr(str(tmp_path / "env.exr"), big)
    cfg2 = load_scene(str(tmp_path / "env_scene.xml"))
    pack2 = pack_scene(cfg2)
    opts2 = options_for_camera(cfg2, cfg2.cameras[0])
    assert _me(pack2.static, opts2, pack2)
    mc2, _, _, img2 = _bm(pack2, opts2)
    assert mc2.env_big and isinstance(img2, tuple)


MAPS_SCENE = """<Scene>
  <BackgroundColor>6 6 10</BackgroundColor>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <ShadowRayEpsilon>1e-3</ShadowRayEpsilon>
  <Cameras><Camera id="1">
    <Position>0 1.2 4</Position><Gaze>0 -0.25 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>320 240</ImageResolution>
    <ImageName>megamaps.png</ImageName>
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
    <Material id="2"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.2 0.4 0.8</DiffuseReflectance>
      <SpecularReflectance>0.5 0.5 0.5</SpecularReflectance>
      <PhongExponent>60</PhongExponent></Material>
  </Materials>
  <Textures>
    <Images>
      <Image id="1">{img1}</Image>
      <Image id="2">{img2}</Image>
    </Images>
    <TextureMap id="1" type="image">
      <DecalMode>replace_normal</DecalMode><ImageId>1</ImageId>
      <Interpolation>nearest</Interpolation>
    </TextureMap>
    <TextureMap id="2" type="image">
      <DecalMode>bump_normal</DecalMode><ImageId>2</ImageId>
      <Interpolation>nearest</Interpolation>
      <BumpFactor>2.5</BumpFactor>
    </TextureMap>
    <TextureMap id="3" type="image">
      <DecalMode>replace_all</DecalMode><ImageId>2</ImageId>
      <Interpolation>bilinear</Interpolation>
    </TextureMap>
  </Textures>
  <VertexData>
    -8 -1 4   8 -1 4   8 -1 -12   -8 -1 -12
    -3 -1 1   -1 -1 1   -1 1 1    -3 1 1
    1 -1 0.5   3 -1 0.5   3 1 0.5   1 1 0.5
  </VertexData>
  <TexCoordData>
    0 3   3 3   3 0   0 0
    0 1   1 1   1 0   0 0
    0 1   1 1   1 0   0 0
  </TexCoordData>
  <Objects>
    <Mesh id="1"><Material>1</Material>
      <Textures>2</Textures>
      <Faces>1 2 3  1 3 4</Faces></Mesh>
    <Mesh id="2"><Material>2</Material>
      <Textures>1</Textures>
      <Faces vertexOffset="4" textureOffset="4">1 2 3  1 3 4</Faces></Mesh>
    <Mesh id="3"><Material>2</Material>
      <Textures>3</Textures>
      <Faces vertexOffset="8" textureOffset="8">1 2 3  1 3 4</Faces></Mesh>
  </Objects>
</Scene>"""


def test_megakernel_normal_bump_replaceall(tmp_path):
    """Round 4: tangent-space normal maps, image height-field bump, and
    replace_all decals run in-kernel (TBN columns 30:36 of the tri table,
    raw-sample short circuit) — deterministic, so kernel == wavefront."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    img1 = tmp_path / "nm.png"
    img2 = tmp_path / "bump.png"
    _write_test_png(img1, 16, 16, 5)
    _write_test_png(img2, 33, 7, 6)
    p = tmp_path / "megamaps.xml"
    p.write_text(MAPS_SCENE.format(img1=img1, img2=img2))
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.n_textures == 3
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert mc.img_normal and mc.img_bump and mc.img_ra and mc.has_tbn
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(13)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.02, np.mean(diff)
    assert np.quantile(diff, 0.995) < 1.0, np.quantile(diff, 0.995)


def test_megakernel_streamed_geometry(monkeypatch):
    """HBM-streamed chunk sweep (round 4): with the VMEM ceiling lowered,
    a terrain scene streams its tri table chunk-by-chunk behind the AABB
    culls and must match both the resident kernel and the jnp wavefront."""
    import advanced_cpu_raytracing_tpu.ops.pallas.megakernel as mk
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera
    from advanced_cpu_raytracing_tpu.scene.synth import terrain_scene

    cfg = terrain_scene(n=33, width=64, height=48)  # 2048 faces
    pack = pack_scene(cfg)
    opts = options_for_camera(cfg, cfg.cameras[0])
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(2)
    n = 1024
    px = jnp.asarray(rng.uniform(0, 64, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 48, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)

    mc_r, tab_r, ctab_r, img_r = mk.build_mega(pack, opts)
    assert not mc_r.stream_geo
    l_res = np.asarray(mk.mega_trace(mc_r, tab_r, ctab_r, o, d,
                                     interpret=True))

    monkeypatch.setattr(mk, "_VMEM_MAX_FACES", 512)
    assert mk.mega_eligible(pack.static, opts, pack)
    mc_s, tab_s, ctab_s, img_s = mk.build_mega(pack, opts)
    assert mc_s.stream_geo and tab_s.shape[0] % mk.CHUNK == 0
    l_str = np.asarray(mk.mega_trace(mc_s, tab_s, ctab_s, o, d,
                                     interpret=True))

    np.testing.assert_allclose(l_str, l_res, rtol=1e-6, atol=1e-5)
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_str - l_jnp)
    assert np.mean(diff) < 0.01, np.mean(diff)


def test_megakernel_six_textures(tmp_path):
    """More than 4 textures route in-kernel since late round 4 (the gate is
    the shared total-texel VMEM budget, not the count): IMAGE_SCENE grown
    to 6 maps (3 image decals + perlin replace_kd + perlin bump + image
    blend on the mirror) still matches the jnp wavefront."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_trace as _mt,
        mega_eligible as _me,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    img1 = tmp_path / "t1.png"
    img2 = tmp_path / "t2.png"
    _write_test_png(img1, 16, 16, 3)
    _write_test_png(img2, 33, 7, 4)
    xml = IMAGE_SCENE.format(img1=img1, img2=img2)
    xml = xml.replace(
        """    <TextureMap id="4" type="perlin">""",
        """    <TextureMap id="5" type="perlin">
      <DecalMode>bump_normal</DecalMode>
      <NoiseConversion>linear</NoiseConversion>
      <NoiseScale>2</NoiseScale>
      <BumpFactor>0.5</BumpFactor>
    </TextureMap>
    <TextureMap id="6" type="image">
      <DecalMode>blend_kd</DecalMode><ImageId>1</ImageId>
      <Interpolation>nearest</Interpolation>
    </TextureMap>
    <TextureMap id="4" type="perlin">""")
    xml = xml.replace(
        '<Mesh id="3"><Material>3</Material>\n      <Faces>9 10 11  9 11 12</Faces></Mesh>',
        '<Mesh id="3"><Material>3</Material><Textures>6</Textures>\n'
        '      <Faces>9 10 11  9 11 12</Faces></Mesh>')
    xml = xml.replace("<Textures>1</Textures>", "<Textures>1 5</Textures>")
    p = tmp_path / "sixtex.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.n_textures == 6
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(13)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.01, np.mean(diff)
    assert np.quantile(diff, 0.999) < 0.5


def _compare_big(tmp_path, img1_path, img2_path, expect_big):
    """Shared harness: IMAGE_SCENE with the given texture images must route
    in-kernel with the expected big-table entries and match the wavefront."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    p = tmp_path / "bigimage.xml"
    p.write_text(IMAGE_SCENE.format(img1=img1_path, img2=img2_path))
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert [bool(e) for e in mc.big_textures] == expect_big, mc.big_textures
    assert isinstance(img_tab, tuple) and img_tab[1].ndim == 2
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(21)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.01, np.mean(diff)
    assert np.quantile(diff, 0.999) < 0.5, np.quantile(diff, 0.999)


def test_megakernel_big_texture_nearest(tmp_path):
    """Round 5: an image past the VMEM texel budget routes through the HBM
    windowed gather (tiled big table) — nearest + UV tiling on the floor,
    mixed with small VMEM textures and perlin; kernel == wavefront."""
    img1 = tmp_path / "big1.png"
    img2 = tmp_path / "small2.png"
    _write_test_png(img1, 164, 127, 3)  # 20828 texels > 16384, odd tiles
    _write_test_png(img2, 33, 7, 4)
    # textures 1 (img1: nearest replace_kd) big; 2+3 (img2) small; 4 perlin
    _compare_big(tmp_path, img1, img2, [True, False, False, False])


def test_megakernel_big_texture_bilinear(tmp_path):
    """Round 5: big-table bilinear (4-tap windowed gather) through the
    blend_kd and replace_ks decals; kernel == wavefront."""
    img1 = tmp_path / "small1.png"
    img2 = tmp_path / "big2.png"
    _write_test_png(img1, 16, 16, 3)
    _write_test_png(img2, 150, 110, 4)  # 16500 texels > 16384
    _compare_big(tmp_path, img1, img2, [False, True, True, False])


def test_megakernel_hdr_texture(tmp_path):
    """Round 5: float-texel (EXR/HDR) images route through the big table
    regardless of size (the VMEM path's packed-RGB f32 trick is
    integer-only); kernel == wavefront (HDRImage.h:45-70 capability)."""
    from advanced_cpu_raytracing_tpu.scene.images import write_exr

    img1 = tmp_path / "hdr1.exr"
    img2 = tmp_path / "small2.png"
    rng = np.random.default_rng(9)
    write_exr(str(img1),
              rng.uniform(0.0, 400.0, (30, 40, 3)).astype(np.float32))
    _write_test_png(img2, 33, 7, 4)
    _compare_big(tmp_path, img1, img2, [True, False, False, False])


def test_megakernel_big_normal_bump_replaceall(tmp_path):
    """Round 5: big-table textures through the normal-map, image-bump and
    replace_all decal paths (grey taps served in one windowed loop)."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    img1 = tmp_path / "bignm.png"
    img2 = tmp_path / "bigbump.png"
    _write_test_png(img1, 160, 120, 5)  # 19200 texels
    _write_test_png(img2, 140, 123, 6)  # 17220 texels
    p = tmp_path / "bigmaps.xml"
    p.write_text(MAPS_SCENE.format(img1=img1, img2=img2))
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert mc.img_normal and mc.img_bump and mc.img_ra
    assert all(bool(e) for e in mc.big_textures)
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(13)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.02, np.mean(diff)
    assert np.quantile(diff, 0.995) < 1.0, np.quantile(diff, 0.995)


def test_megakernel_big_env(tmp_path):
    """Round 5: a lat-long env map past the VMEM budget samples through the
    HBM windowed gather; the deterministic env background (primary + mirror
    misses) must match the wavefront exactly."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.ops.traverse import closest_hit
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    cfg, pack = _env_scene(tmp_path, mirror=True, w=200, h=100)
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts, host_rng=True)
    assert mc.env_big and mc.env[0] == 200 and mc.env[1] == 100
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(0)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    w_opts = RenderOptions(max_depth=cfg.max_recursion_depth)
    img_k = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True, seed=0,
                           rng_key=jax.random.PRNGKey(0), img_tab=img_tab))
    img_j = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), w_opts))
    hit = np.asarray(closest_hit(pack, o, d, jnp.zeros(n)).valid)
    assert (~hit).sum() > 200
    np.testing.assert_allclose(img_k[~hit], img_j[~hit], rtol=1e-5,
                               atol=1e-5)


BG_SCENE = """<Scene>
  <BackgroundColor>9 9 9</BackgroundColor>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 0 3</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>320 240</ImageResolution>
    <ImageName>bg.png</ImageName>
  </Camera></Cameras>
  <Lights>
    <AmbientLight>20 20 20</AmbientLight>
    <PointLight id="1"><Position>0 2 3</Position>
      <Intensity>300 300 300</Intensity></PointLight>
  </Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.5 0.4 0.3</DiffuseReflectance>
      <SpecularReflectance>0.2 0.2 0.2</SpecularReflectance>
      <PhongExponent>12</PhongExponent></Material>
  </Materials>
  <Textures>
    <Images><Image id="1">{img}</Image></Images>
    <TextureMap id="1" type="image">
      <DecalMode>replace_background</DecalMode><ImageId>1</ImageId>
      <Interpolation>{interp}</Interpolation>
    </TextureMap>
  </Textures>
  <VertexData>
    -0.6 -0.6 0   0.6 -0.6 0   0.6 0.6 0   -0.6 0.6 0
  </VertexData>
  <Objects>
    <Mesh id="1"><Material>1</Material><Faces>1 2 3  1 3 4</Faces></Mesh>
  </Objects>
</Scene>"""


@pytest.mark.parametrize("interp", ["nearest", "bilinear"])
def test_megakernel_bg_texture(tmp_path, interp):
    """Round 5: the replace_background decal samples in-kernel at the
    pixel-uv input planes on primary miss (texture.h:49-52) — a centered
    quad leaves visible background all around; kernel == wavefront."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    img = tmp_path / "bg.png"
    _write_test_png(img, 37, 23, 8)
    p = tmp_path / "bgscene.xml"
    p.write_text(BG_SCENE.format(img=img, interp=interp))
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    assert pack.static.bg_tex >= 0
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert mc.bg_tex == int(pack.static.bg_tex)
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(2)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab,
                            pix_uv=(px / 320.0, py / 240.0)))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.01, np.mean(diff)
    assert np.quantile(diff, 0.999) < 0.5, np.quantile(diff, 0.999)
    # the background is actually textured (misses vary, not flat 9s)
    assert np.std(l_mega, axis=0).max() > 1.0


SPHERE_TEX_SCENE = """<Scene>
  <BackgroundColor>2 2 2</BackgroundColor>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 0 3</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -0.75 0.75</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>320 240</ImageResolution>
    <ImageName>stex.png</ImageName>
  </Camera></Cameras>
  <Lights>
    <AmbientLight>20 20 20</AmbientLight>
    <PointLight id="1"><Position>2 3 3</Position>
      <Intensity>500 500 500</Intensity></PointLight>
  </Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.5 0.4 0.3</DiffuseReflectance>
      <SpecularReflectance>0.3 0.3 0.3</SpecularReflectance>
      <PhongExponent>15</PhongExponent></Material>
  </Materials>
  <Textures>
    <Images><Image id="1">{img}</Image></Images>
    <TextureMap id="1" type="image">
      <DecalMode>{decal}</DecalMode><ImageId>1</ImageId>
      <Interpolation>{interp}</Interpolation>
    </TextureMap>
    <TextureMap id="2" type="perlin">
      <DecalMode>replace_ks</DecalMode>
      <NoiseScale>4</NoiseScale>
      <NoiseConversion>absval</NoiseConversion>
    </TextureMap>
  </Textures>
  <VertexData>
    0 0 0   -2 -1.2 -1   2 -1.2 -1   0 1.4 -1
  </VertexData>
  <Objects>
    <Mesh id="1"><Material>1</Material>
      <Faces>2 3 4</Faces></Mesh>
    <Sphere id="1"><Material>1</Material><Textures>{tex}</Textures>
      <Center>1</Center><Radius>0.8</Radius></Sphere>
  </Objects>
</Scene>"""


@pytest.mark.parametrize("decal,interp,tex", [
    ("replace_kd", "nearest", "1 2"),
    ("blend_kd", "bilinear", "1"),
    ("replace_all", "bilinear", "1"),
    ("bump_normal", "nearest", "1"),  # round 5: image bump on spheres
])
def test_megakernel_sphere_textures(tmp_path, decal, interp, tex):
    """Round 5: sphere textures in-kernel — spherical UV from the local
    hit point via the atan2/acos polynomials (sphere.cpp:138-167;
    surface_at's formula), the winning sphere's static texture slots, and
    perlin replace_ks on the same sphere; kernel == wavefront."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    img = tmp_path / "stex.png"
    _write_test_png(img, 48, 31, 9)
    p = tmp_path / "spherescene.xml"
    p.write_text(SPHERE_TEX_SCENE.format(img=img, decal=decal,
                                         interp=interp, tex=tex))
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert any(s >= 0 for t in mc.sph_tex for s in t)
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(4)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    # the polynomial atan2/acos UV differs from libm by ~1e-7 rad; a
    # nearest-texel flip at a cell boundary can move one lane a full
    # texel, so compare means + a generous tail quantile
    assert np.mean(diff) < 0.05, np.mean(diff)
    assert np.quantile(diff, 0.99) < 1.0, np.quantile(diff, 0.99)
    # the sphere is actually textured (its pixels vary)
    assert np.std(l_mega, axis=0).max() > 1.0


def test_megakernel_transformed_normal_bump(tmp_path):
    """Round 5: normal/bump-mapped meshes with NON-identity transforms run
    in-kernel — object-space TBN columns + per-entity M^-T columns
    (tbn_obj), matching the reference's object-space mapping
    (mesh.cpp:264-357) as implemented by the wavefront."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    img1 = tmp_path / "nm.png"
    img2 = tmp_path / "bump.png"
    _write_test_png(img1, 16, 16, 5)
    _write_test_png(img2, 33, 7, 6)
    xml = MAPS_SCENE.format(img1=img1, img2=img2)
    # non-uniform scale + axis-aligned rotation on the bump floor and the
    # normal-mapped wall (the parser supports axis-aligned rotations only)
    xml = xml.replace(
        "<Objects>",
        """<Transformations>
    <Scaling id="1">1.4 0.8 1.1</Scaling>
    <Rotation id="1">25 0 1 0</Rotation>
  </Transformations>
  <Objects>""")
    xml = xml.replace(
        '<Mesh id="1"><Material>1</Material>',
        '<Mesh id="1"><Material>1</Material>'
        '<Transformations>s1</Transformations>')
    xml = xml.replace(
        '<Mesh id="2"><Material>2</Material>',
        '<Mesh id="2"><Material>2</Material>'
        '<Transformations>r1</Transformations>')
    p = tmp_path / "tbnobj.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert mc.has_tbn and mc.tbn_obj and tab.shape[1] >= 48
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(14)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.02, np.mean(diff)
    assert np.quantile(diff, 0.995) < 1.0, np.quantile(diff, 0.995)


def test_megakernel_streamed_textured(monkeypatch):
    """Round 5: textures stream with the geometry — the texture tables are
    separate VMEM inputs and the tri-table texture/uv columns read through
    the rebindable accessor, so the streamed textured terrain must match
    the jnp wavefront."""
    import advanced_cpu_raytracing_tpu.ops.pallas.megakernel as mk
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera
    from advanced_cpu_raytracing_tpu.scene.synth import terrain_scene

    cfg = terrain_scene(n=33, width=64, height=48, textured=True)
    pack = pack_scene(cfg)
    assert pack.static.n_textures == 1
    opts = options_for_camera(cfg, cfg.cameras[0])
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(5)
    n = 1024
    px = jnp.asarray(rng.uniform(0, 64, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 48, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)

    monkeypatch.setattr(mk, "_VMEM_MAX_FACES", 512)
    assert mk.mega_eligible(pack.static, opts, pack)
    mc, tab, ctab, img_tab = mk.build_mega(pack, opts)
    assert mc.stream_geo and (mc.img_diff or any(mc.big_textures))
    l_str = np.asarray(mk.mega_trace(mc, tab, ctab, o, d, interpret=True,
                                     img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_str - l_jnp)
    assert np.mean(diff) < 0.02, np.mean(diff)
    assert np.quantile(diff, 0.995) < 1.0, np.quantile(diff, 0.995)


def test_megakernel_streamed_meshlight(tmp_path, monkeypatch):
    """Round 5: mesh lights stream too — their sampled-face corners are
    baked constants, not tri-table reads.  With the same host-RNG table,
    the streamed kernel must equal the resident kernel bit-for-bit."""
    import advanced_cpu_raytracing_tpu.ops.pallas.megakernel as mk
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera
    from tests.scene_builders import cornell_pt_xml

    (tmp_path / "pt.xml").write_text(
        cornell_pt_xml(depth=2, res=32, spp=1, params="NextEventEstimation"))
    cfg = load_scene(str(tmp_path / "pt.xml"))
    pack = pack_scene(cfg)
    assert pack.static.n_mesh_lights == 1
    opts = options_for_camera(cfg, cfg.cameras[0])
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(6)
    n = 512
    px = jnp.asarray(rng.uniform(0, 32, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 32, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)

    mc_r, tab_r, ctab_r, img_r = mk.build_mega(pack, opts, host_rng=True)
    assert not mc_r.stream_geo
    l_res = np.asarray(mk.mega_trace(
        mc_r, tab_r, ctab_r, o, d, interpret=True, seed=0,
        rng_key=jax.random.PRNGKey(3), img_tab=img_r))

    monkeypatch.setattr(mk, "_VMEM_MAX_FACES", 8)
    assert mk.mega_eligible(pack.static, opts, pack)
    mc_s, tab_s, ctab_s, img_s = mk.build_mega(pack, opts, host_rng=True)
    assert mc_s.stream_geo and mc_s.mesh_lights
    l_str = np.asarray(mk.mega_trace(
        mc_s, tab_s, ctab_s, o, d, interpret=True, seed=0,
        rng_key=jax.random.PRNGKey(3), img_tab=img_s))
    np.testing.assert_allclose(l_str, l_res, rtol=1e-6, atol=1e-5)


def test_megakernel_sphere_perlin_bump(tmp_path):
    """Round 5: PERLIN bump on spheres in-kernel — local-frame gradient
    against the analytic tangent basis (sphere.cpp:116-137), no
    bumpFactor, M^-T back to world; kernel == wavefront."""
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import (
        build_mega as _bm,
        mega_eligible as _me,
        mega_trace as _mt,
    )
    from advanced_cpu_raytracing_tpu.render.renderer import options_for_camera

    img = tmp_path / "stex.png"
    _write_test_png(img, 16, 16, 9)
    xml = SPHERE_TEX_SCENE.format(img=img, decal="replace_kd",
                                  interp="nearest", tex="1 2")
    xml = xml.replace(
        "<DecalMode>replace_ks</DecalMode>",
        "<DecalMode>bump_normal</DecalMode>")
    p = tmp_path / "sphperlinbump.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    opts = options_for_camera(cfg, cfg.cameras[0])
    assert _me(pack.static, opts, pack)
    mc, tab, ctab, img_tab = _bm(pack, opts)
    assert mc.sph_tex[0][3] >= 0  # the sphere's bump slot
    cam = build_camera(cfg.cameras[0])
    rng = np.random.default_rng(4)
    n = 2048
    px = jnp.asarray(rng.uniform(0, 320, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 240, n).astype(np.float32))
    o, d = cam_mod.generate_rays(cam, px, py, jnp.zeros((n, 2)), dof=False)
    l_mega = np.asarray(_mt(mc, tab, ctab, o, d, interpret=True,
                            img_tab=img_tab))
    l_jnp = np.asarray(trace_radiance(pack, cam, px, py,
                                      jax.random.PRNGKey(0), opts))
    diff = np.abs(l_mega - l_jnp)
    assert np.mean(diff) < 0.05, np.mean(diff)
    assert np.quantile(diff, 0.99) < 1.0, np.quantile(diff, 0.99)
