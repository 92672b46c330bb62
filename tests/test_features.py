"""Feature tests for capabilities with no committed reference scene:
path tracing (NEE/RR/importance), textures (image + Perlin, decal modes),
environment lights, DoF, transforms/instancing, motion blur, tonemap CLI.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests import scene_builders as SB


def _load(xml_text, tmp_path, name="scene.xml"):
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    p = tmp_path / name
    p.write_text(xml_text)
    cfg = load_scene(str(p))
    return cfg, pack_scene(cfg)


def _render(cfg, pack, spp=None, cam_idx=0):
    from advanced_cpu_raytracing_tpu.render.renderer import render_camera

    return render_camera(pack, cfg, cfg.cameras[cam_idx], seed=0, spp=spp,
                         tile_size=4096)


# ---------------------------------------------------------------------------
# Path tracing
# ---------------------------------------------------------------------------

class TestPathTracing:
    def test_mesh_light_illuminates(self, tmp_path):
        cfg, pack = _load(SB.cornell_pt_xml(res=16, spp=4), tmp_path)
        img = _render(cfg, pack)
        assert np.isfinite(img).all()
        assert img.mean() > 1.0  # light actually reaches the walls

    # Note: the reference's PT estimators are *not* mutually consistent —
    # bounce weights are Shade*2pi with no pdf division
    # (raytracer.cpp:151-169, 188), and NEE irradiance has no distance or
    # pdf terms (raytracer.cpp:800) — so NEE-on vs NEE-off and importance vs
    # uniform converge to *different* values by design.  Parity means
    # replicating that; the testable properties are per-estimator stability
    # and linearity.

    @pytest.mark.parametrize("params,spp,tol", [
        ("NextEventEstimation ImportanceSampling", 49, 0.25),
        # the no-NEE estimator only collects light when the sampled GI chain
        # happens to hit the emitter — much higher variance
        ("ImportanceSampling", 144, 0.45),
        ("NextEventEstimation", 49, 0.25),
    ])
    def test_estimator_seed_stability(self, tmp_path, params, spp, tol):
        cfg, pack = _load(SB.cornell_pt_xml(
            res=10, spp=spp, params=params, depth=3), tmp_path,
            f"s{abs(hash(params)) % 97}.xml")
        from advanced_cpu_raytracing_tpu.render.renderer import render_camera

        m = [render_camera(pack, cfg, cfg.cameras[0], seed=s,
                           tile_size=4096)[5:, :, :].mean() for s in (0, 1)]
        assert m[0] > 0.3
        assert abs(m[0] - m[1]) / max(m) < tol

    def test_radiance_linearity(self, tmp_path):
        # doubling the mesh light's radiance doubles the indirect image
        cfg1, pack1 = _load(SB.cornell_pt_xml(
            res=10, spp=25, params="NextEventEstimation ImportanceSampling",
            depth=2, radiance=8.0), tmp_path, "r1.xml")
        cfg2, pack2 = _load(SB.cornell_pt_xml(
            res=10, spp=25, params="NextEventEstimation ImportanceSampling",
            depth=2, radiance=16.0), tmp_path, "r2.xml")
        m1 = _render(cfg1, pack1).mean()
        m2 = _render(cfg2, pack2).mean()
        assert abs(m2 / m1 - 2.0) < 0.1

    def test_russian_roulette_runs(self, tmp_path):
        cfg, pack = _load(SB.cornell_pt_xml(
            res=8, spp=4,
            params="NextEventEstimation RussianRoulette ImportanceSampling",
            depth=2), tmp_path)
        img = _render(cfg, pack)
        assert np.isfinite(img).all() and img.mean() > 0.5


# ---------------------------------------------------------------------------
# Textures
# ---------------------------------------------------------------------------

class TestTextures:
    def test_replace_kd_checkerboard(self, tmp_path):
        png = tmp_path / "check.png"
        SB.checkerboard_png(str(png))
        cfg, pack = _load(SB.textured_xml(str(png)), tmp_path)
        img = _render(cfg, pack)
        # checker pattern visible: dark vs light cells differ strongly
        red = img[..., 0]
        assert red.max() > 4 * max(red.min(), 1e-3)

    def test_blend_kd_halves_contrast(self, tmp_path):
        png = tmp_path / "check.png"
        SB.checkerboard_png(str(png))
        cfg_r, pack_r = _load(SB.textured_xml(str(png), decal="replace_kd"),
                              tmp_path, "r.xml")
        cfg_b, pack_b = _load(SB.textured_xml(str(png), decal="blend_kd"),
                              tmp_path, "b.xml")
        img_r = _render(cfg_r, pack_r)
        img_b = _render(cfg_b, pack_b)
        # blend = (tex + kd)/2 (raytracer.cpp:497-505): the checker amplitude
        # (bright-cell minus dark-cell mean, same mask for both renders)
        # halves while lighting variation stays identical
        red_r = img_r[..., 0]
        red_b = img_b[..., 0]
        on_quad = (red_r + red_b) > 1.0  # restrict to the textured quad
        bright = on_quad & (red_r > np.median(red_r[on_quad]))
        dark = on_quad & ~bright
        amp_r = red_r[bright].mean() - red_r[dark].mean()
        amp_b = red_b[bright].mean() - red_b[dark].mean()
        assert 0.35 < amp_b / amp_r < 0.65

    def test_replace_all_ignores_lighting(self, tmp_path):
        png = tmp_path / "check.png"
        SB.checkerboard_png(str(png))
        cfg, pack = _load(SB.textured_xml(str(png), decal="replace_all"),
                          tmp_path)
        img = _render(cfg, pack)
        # replace_all returns the raw texture sample (raytracer.cpp:87-89):
        # values are exactly 0/255/128 per channel on the quad
        vals = np.unique(np.round(img[..., 2]))
        assert set(vals.tolist()) <= {0.0, 128.0}

    def test_perlin_diffuse(self, tmp_path):
        png = tmp_path / "check.png"
        SB.checkerboard_png(str(png))
        cfg, pack = _load(SB.textured_xml(str(png), tex_ids="2"), tmp_path)
        img = _render(cfg, pack)
        grey = img[..., 0]
        assert np.isfinite(img).all()
        assert grey.std() > 0.5  # noise pattern present
        # greyscale: all channels equal before lighting color
        np.testing.assert_allclose(img[..., 0] - img[..., 1], 0, atol=2.0)

    def test_bilinear_smoother_than_nearest(self, tmp_path):
        png = tmp_path / "check.png"
        SB.checkerboard_png(str(png), n=4, cell=2)
        cfg_n, pack_n = _load(SB.textured_xml(str(png), interp="nearest",
                                              res=32), tmp_path, "n.xml")
        cfg_b, pack_b = _load(SB.textured_xml(str(png), interp="bilinear",
                                              res=32), tmp_path, "bl.xml")
        img_n = _render(cfg_n, pack_n)
        img_b = _render(cfg_b, pack_b)
        # bilinear reduces the gradient magnitude between adjacent pixels
        g_n = np.abs(np.diff(img_n[..., 0], axis=1)).mean()
        g_b = np.abs(np.diff(img_b[..., 0], axis=1)).mean()
        assert g_b < g_n

    def test_sphere_uv_texture(self, tmp_path):
        png = tmp_path / "check.png"
        SB.checkerboard_png(str(png))
        cfg, pack = _load(SB.textured_xml(str(png), obj="sphere"), tmp_path)
        img = _render(cfg, pack)
        assert np.isfinite(img).all()
        assert img[..., 0].std() > 5  # pattern wraps the sphere


# ---------------------------------------------------------------------------
# Transforms / instancing / motion blur
# ---------------------------------------------------------------------------

TRANSFORM_SCENE = """
<Scene>
  <MaxRecursionDepth>1</MaxRecursionDepth>
  <BackgroundColor>0 0 0</BackgroundColor>
  <Cameras><Camera id="1">
    <Position>0 0 6</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-2 2 -2 2</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>24 24</ImageResolution><ImageName>t.png</ImageName>
  </Camera></Cameras>
  <Lights><AmbientLight>50 50 50</AmbientLight>
    <PointLight id="1"><Position>0 3 6</Position>
    <Intensity>500 500 500</Intensity></PointLight></Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.8 0.2 0.2</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance></Material>
    <Material id="2"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.2 0.8 0.2</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance></Material>
  </Materials>
  <Transformations>
    <Translation id="1">2 0 0</Translation>
    <Translation id="2">-2 0 0</Translation>
    <Scaling id="1">0.5 0.5 0.5</Scaling>
    <Scaling id="2">0.9 0.9 0.9</Scaling>
    <Rotation id="1">45 0 0 1</Rotation>
  </Transformations>
  <VertexData>
    -1 -1 0   1 -1 0   1 1 0   -1 1 0
  </VertexData>
  <Objects>
    <Mesh id="1"><Material>1</Material>
      <Transformations>s1 t2</Transformations>
      <Faces>1 2 3  1 3 4</Faces></Mesh>
    <MeshInstance id="2" baseMeshId="1" resetTransform="true">
      <Material>2</Material>
      <Transformations>s2 r1 t1</Transformations>
    </MeshInstance>
  </Objects>
</Scene>
"""


class TestTransforms:
    def test_transformed_mesh_and_instance(self, tmp_path):
        cfg, pack = _load(TRANSFORM_SCENE, tmp_path)
        img = _render(cfg, pack)
        h, w, _ = img.shape
        left = img[:, : w // 2]
        right = img[:, w // 2:]
        # red scaled quad on the left, green rotated instance on the right
        assert left[..., 0].max() > left[..., 1].max()
        assert right[..., 1].max() > right[..., 0].max()
        # instance shares base geometry: both quads visible (each spans only
        # a couple of pixels at this resolution)
        assert (left[..., 0] > 20).sum() >= 2
        assert (right[..., 1] > 20).sum() >= 2

    def test_motion_blur_spreads(self, tmp_path):
        xml = TRANSFORM_SCENE.replace(
            '<Transformations>s1 t2</Transformations>',
            '<Transformations>s1 t2</Transformations><MotionBlur>0 3 0</MotionBlur>')
        cfg_m, pack_m = _load(xml, tmp_path, "m.xml")
        cfg_s, pack_s = _load(TRANSFORM_SCENE, tmp_path, "s.xml")
        img_m = _render(cfg_m, pack_m, spp=16)
        img_s = _render(cfg_s, pack_s, spp=16)
        # the object shifts by -motion*time in its local frame
        # (mesh.cpp:167-170), smearing downward: the red-mass centroid of the
        # motion render sits strictly below the static one's
        rows = np.arange(img_m.shape[0])[:, None]
        cen_m = (img_m[..., 0] * rows).sum() / max(img_m[..., 0].sum(), 1e-6)
        cen_s = (img_s[..., 0] * rows).sum() / max(img_s[..., 0].sum(), 1e-6)
        assert cen_m > cen_s + 0.1


# ---------------------------------------------------------------------------
# Environment light + DoF + tonemap end-to-end
# ---------------------------------------------------------------------------

ENV_SCENE = """
<Scene>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 0 4</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>16 16</ImageResolution><ImageName>env.png</ImageName>
    {extra}
  </Camera></Cameras>
  <Lights>
    <SphericalDirectionalLight id="1"><ImageId>1</ImageId>
    </SphericalDirectionalLight>
  </Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.7 0.7 0.7</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance></Material>
  </Materials>
  <Textures><Images><Image id="1">{hdr}</Image></Images></Textures>
  <VertexData>0 0 0</VertexData>
  <Objects>
    <Sphere id="1"><Material>1</Material><Center>1</Center>
      <Radius>1</Radius></Sphere>
  </Objects>
</Scene>
"""


class TestEnvAndTonemap:
    def test_env_light_background_and_shading(self, tmp_path):
        hdr = tmp_path / "env.hdr"
        SB.gradient_hdr(str(hdr))
        cfg, pack = _load(ENV_SCENE.format(hdr=str(hdr), extra=""), tmp_path)
        img = _render(cfg, pack)
        assert np.isfinite(img).all()
        # background = env sample * 2pi: nonzero everywhere
        assert img.min() >= 0 and (img[0, 0] > 0.1).all()
        # sphere lit by env irradiance
        c = img[8, 8]
        assert c.sum() > 0.1

    def test_tonemap_cli_end_to_end(self, tmp_path):
        hdr = tmp_path / "env.hdr"
        SB.gradient_hdr(str(hdr))
        extra = ("<Tonemap><TMO>Photographic</TMO>"
                 "<TMOOptions>0.18 1</TMOOptions>"
                 "<Saturation>1</Saturation><Gamma>2.2</Gamma></Tonemap>")
        xml = ENV_SCENE.format(hdr=str(hdr), extra=extra)
        p = tmp_path / "tm.xml"
        p.write_text(xml)
        from advanced_cpu_raytracing_tpu.cli.render import main

        out = tmp_path / "out"
        out.mkdir()
        assert main([str(p), "--out-dir", str(out), "--tile", "4096"]) == 0
        assert (out / "env.png").exists()
        assert (out / "env.hdr").exists()
        from advanced_cpu_raytracing_tpu.scene.images import read_hdr

        back = read_hdr(str(out / "env.hdr"))
        assert back.shape == (16, 16, 3) and np.isfinite(back).all()

    def test_dof_blurs_off_focus(self, tmp_path):
        base = """
<Scene><MaxRecursionDepth>1</MaxRecursionDepth>
  <BackgroundColor>0 0 0</BackgroundColor>
  <Cameras><Camera id="1">
    <Position>0 0 4</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>32 32</ImageResolution><ImageName>d.png</ImageName>
    <NumSamples>25</NumSamples>
    <FocusDistance>{fd}</FocusDistance><ApertureSize>0.5</ApertureSize>
  </Camera></Cameras>
  <Lights><AmbientLight>200 200 200</AmbientLight></Lights>
  <Materials><Material id="1">
    <AmbientReflectance>1 1 1</AmbientReflectance>
    <DiffuseReflectance>0 0 0</DiffuseReflectance>
    <SpecularReflectance>0 0 0</SpecularReflectance></Material></Materials>
  <VertexData>-0.5 -0.5 0  0.5 -0.5 0  0.5 0.5 0  -0.5 0.5 0</VertexData>
  <Objects><Mesh id="1"><Material>1</Material>
    <Faces>1 2 3  1 3 4</Faces></Mesh></Objects></Scene>
"""
        cfg_f, pack_f = _load(base.format(fd=4.0), tmp_path, "f.xml")
        cfg_o, pack_o = _load(base.format(fd=1.5), tmp_path, "o.xml")
        img_f = _render(cfg_f, pack_f)
        img_o = _render(cfg_o, pack_o)
        edge_f = np.abs(np.diff((img_f[..., 0] > 100).astype(float), axis=1)).sum()
        # out-of-focus: the quad edge smears over more pixels -> more partial
        # coverage, fewer hard transitions at high threshold
        cover_f = (img_f[16, :, 0] > 10).sum()
        cover_o = (img_o[16, :, 0] > 10).sum()
        assert cover_o > cover_f  # blur expands apparent size
