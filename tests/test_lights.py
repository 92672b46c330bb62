"""Analytic light tests: point falloff, directional, spot cone/falloff,
area-light scaling — each against hand-computed irradiance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _scene(lights_xml, tmp_path, name="l.xml", extra_mat=""):
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    xml = f"""
<Scene><MaxRecursionDepth>1</MaxRecursionDepth>
  <BackgroundColor>0 0 0</BackgroundColor>
  <Cameras><Camera id="1">
    <Position>0 0 2</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>8 8</ImageResolution><ImageName>l.png</ImageName>
  </Camera></Cameras>
  <Lights>{lights_xml}</Lights>
  <Materials><Material id="1">
    <AmbientReflectance>0 0 0</AmbientReflectance>
    <DiffuseReflectance>1 1 1</DiffuseReflectance>
    <SpecularReflectance>0 0 0</SpecularReflectance></Material>
    {extra_mat}</Materials>
  <VertexData>-4 -4 0  4 -4 0  4 4 0  -4 4 0</VertexData>
  <Objects><Mesh id="1"><Material>1</Material>
    <Faces>1 2 3  1 3 4</Faces></Mesh></Objects></Scene>
"""
    p = tmp_path / name
    p.write_text(xml)
    cfg = load_scene(str(p))
    return cfg, pack_scene(cfg)


def _shade_point(cfg, pack, world_xy=(0.0, 0.0), key=0):
    """Radiance of the wall point hit by the ray through it."""
    from advanced_cpu_raytracing_tpu.render.camera import build_camera
    from advanced_cpu_raytracing_tpu.render.integrator import (
        RenderOptions,
        trace_radiance,
    )

    cam = build_camera(cfg.cameras[0])
    # pixel whose center ray passes through world (x, y, 0) from (0,0,2):
    # plane at z=1 distance: x_plane = x/2 -> px = (x/2 + 1) * 4 - 0.5
    px = jnp.array([(world_xy[0] / 2.0 + 1.0) * 4.0 - 0.5], jnp.float32)
    py = jnp.array([(-world_xy[1] / 2.0 + 1.0) * 4.0 - 0.5], jnp.float32)
    opts = RenderOptions(max_depth=cfg.max_recursion_depth)
    out = trace_radiance(pack, cam, px, py, jax.random.PRNGKey(key), opts)
    return np.asarray(out)[0]


def test_point_light_inverse_square(tmp_path):
    lights = """<PointLight id="1"><Position>0 0 3</Position>
      <Intensity>900 900 900</Intensity></PointLight>"""
    cfg, pack = _scene(lights, tmp_path)
    c = _shade_point(cfg, pack, (0.0, 0.0))
    # E = I/d^2 * cos(0) = 900/9 = 100 (raytracer.cpp:713-715)
    np.testing.assert_allclose(c, 100.0, rtol=1e-3)


def test_directional_light(tmp_path):
    lights = """<DirectionalLight id="1"><Direction>0 0 -1</Direction>
      <Radiance>7 5 3</Radiance></DirectionalLight>"""
    cfg, pack = _scene(lights, tmp_path)
    c = _shade_point(cfg, pack, (0.4, -0.4))
    # w_i = -dir = +z, cos = 1, irradiance = radiance (raytracer.cpp:757-765)
    np.testing.assert_allclose(c, [7, 5, 3], rtol=1e-3)


def test_spot_light_cone(tmp_path):
    lights = """<SpotLight id="1"><Position>0 0 3</Position>
      <Direction>0 0 -1</Direction><Intensity>900 900 900</Intensity>
      <CoverageAngle>40</CoverageAngle><FalloffAngle>20</FalloffAngle>
      </SpotLight>"""
    cfg, pack = _scene(lights, tmp_path)
    # on-axis point: alpha == 0 -> the reference returns 0 (spotLight.h:40-43
    # `alpha <= 0` guard) — replicate that quirk
    c_axis = _shade_point(cfg, pack, (0.0, 0.0))
    np.testing.assert_allclose(c_axis, 0.0, atol=1e-5)
    # inside the falloff-free cone (alpha < 10 deg): full inverse-square
    x = 3.0 * np.tan(np.deg2rad(5.0))
    c_in = _shade_point(cfg, pack, (x, 0.0))
    d2 = 9.0 + x * x
    cos_t = 3.0 / np.sqrt(d2)
    np.testing.assert_allclose(c_in, 900.0 / d2 * cos_t, rtol=1e-3)
    # in the falloff zone (alpha = 15 deg): scaled by the quartic smooth
    x15 = 3.0 * np.tan(np.deg2rad(15.0))
    c_f = _shade_point(cfg, pack, (x15, 0.0))
    cos_a = np.cos(np.deg2rad(15.0))
    cos_hc = np.cos(np.deg2rad(20.0))
    cos_hf = np.cos(np.deg2rad(10.0))
    s = ((cos_a - cos_hc) / (cos_hf - cos_hc)) ** 4
    d2f = 9.0 + x15 * x15
    cos_tf = 3.0 / np.sqrt(d2f)
    np.testing.assert_allclose(c_f, 900.0 / d2f * s * cos_tf, rtol=2e-3)
    # outside the cone: zero
    x25 = 3.0 * np.tan(np.deg2rad(25.0))
    c_out = _shade_point(cfg, pack, (x25, 0.0))
    np.testing.assert_allclose(c_out, 0.0, atol=1e-5)


def test_area_light_scaling(tmp_path):
    lights = """<AreaLight id="1"><Position>0 0 5</Position>
      <Normal>0 0 -1</Normal><Radiance>50 50 50</Radiance>
      <Size>0.2</Size></AreaLight>"""
    cfg, pack = _scene(lights, tmp_path)
    # tiny area light approximates a point: E ~= L*A*cos/d^2
    # (raytracer.cpp:733-737); cos factors ~1 on-axis
    vals = [np.mean(_shade_point(cfg, pack, (0.0, 0.0), key=k))
            for k in range(16)]
    est = float(np.mean(vals))
    expected = 50.0 * 0.04 / 25.0
    np.testing.assert_allclose(est, expected, rtol=0.1)


def test_shadowing_blocks_light(tmp_path):
    # blocker quad between light and wall
    lights = """<PointLight id="1"><Position>0 0 3</Position>
      <Intensity>900 900 900</Intensity></PointLight>"""
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    xml = f"""
<Scene><MaxRecursionDepth>1</MaxRecursionDepth>
  <BackgroundColor>0 0 0</BackgroundColor>
  <Cameras><Camera id="1">
    <Position>0 0 2</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>8 8</ImageResolution><ImageName>s.png</ImageName>
  </Camera></Cameras>
  <Lights>{lights}</Lights>
  <Materials><Material id="1">
    <AmbientReflectance>0 0 0</AmbientReflectance>
    <DiffuseReflectance>1 1 1</DiffuseReflectance>
    <SpecularReflectance>0 0 0</SpecularReflectance></Material></Materials>
  <VertexData>-4 -4 0  4 -4 0  4 4 0  -4 4 0
    -0.2 2 2.5  0.2 2 2.5  0.2 2.2 2.5  -0.2 2.2 2.5</VertexData>
  <Objects><Mesh id="1"><Material>1</Material>
    <Faces>1 2 3  1 3 4</Faces></Mesh>
  </Objects></Scene>
"""
    p = tmp_path / "shadow.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    lit = _shade_point(cfg, pack, (0.0, 0.0))
    assert lit.mean() > 50  # sanity: unblocked
