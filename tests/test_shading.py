"""Unit tests for surface reconstruction and reflectance modulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advanced_cpu_raytracing_tpu.ops.traverse import closest_hit
from advanced_cpu_raytracing_tpu.render.shading import (
    diffuse_reflectance,
    shade,
    specular_reflectance,
    surface_at,
)
from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene


@pytest.fixture(scope="module")
def transformed_scene(tmp_path_factory):
    # a quad scaled by 2 and rotated 90 deg about x: its +z normal becomes +y
    xml = """
<Scene><MaxRecursionDepth>1</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 5 0</Position><Gaze>0 -1 0</Gaze><Up>0 0 -1</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>4 4</ImageResolution><ImageName>t.png</ImageName>
  </Camera></Cameras>
  <Lights><AmbientLight>10 10 10</AmbientLight></Lights>
  <Materials><Material id="1">
    <AmbientReflectance>1 1 1</AmbientReflectance>
    <DiffuseReflectance>0.25 0.5 0.75</DiffuseReflectance>
    <SpecularReflectance>0.1 0.2 0.3</SpecularReflectance>
    <PhongExponent>7</PhongExponent></Material></Materials>
  <Transformations>
    <Scaling id="1">2 2 2</Scaling>
    <Rotation id="1">90 1 0 0</Rotation>
  </Transformations>
  <VertexData>-1 -1 0  1 -1 0  1 1 0  -1 1 0</VertexData>
  <Objects><Mesh id="1"><Material>1</Material>
    <Transformations>s1 r1</Transformations>
    <Faces>1 2 3  1 3 4</Faces></Mesh></Objects></Scene>
"""
    p = tmp_path_factory.mktemp("shading") / "s.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    return cfg, pack_scene(cfg)


def test_transformed_normal(transformed_scene):
    cfg, pack = transformed_scene
    # ray straight down onto the rotated quad (now lying in the xz plane)
    o = jnp.array([[0.5, 5.0, 0.5]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    hit = closest_hit(pack, o, d)
    assert bool(hit.valid[0])
    surf = surface_at(pack, o, d, jnp.zeros(1), hit)
    n = np.asarray(surf.normal)[0]
    # original +z face normal, rotated 90 about x -> +y (inverse-transpose
    # path, mesh.cpp:179)
    np.testing.assert_allclose(np.abs(n), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(surf.point)[0, 1], 0.0, atol=1e-5)


def test_reflectances_without_textures(transformed_scene):
    cfg, pack = transformed_scene
    o = jnp.array([[0.0, 5.0, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    hit = closest_hit(pack, o, d)
    surf = surface_at(pack, o, d, jnp.zeros(1), hit)
    np.testing.assert_allclose(np.asarray(diffuse_reflectance(pack, surf))[0],
                               [0.25, 0.5, 0.75], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(specular_reflectance(pack, surf))[0],
                               [0.1, 0.2, 0.3], rtol=1e-6)


def test_shade_matches_manual(transformed_scene):
    cfg, pack = transformed_scene
    o = jnp.array([[0.0, 5.0, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    hit = closest_hit(pack, o, d)
    surf = surface_at(pack, o, d, jnp.zeros(1), hit)
    # align incoming/outgoing with the (unflipped) shading normal — the
    # reference never flips normals toward the viewer, so a backfacing
    # normal legitimately zeroes the shading
    w_i = surf.normal
    w_o = surf.normal
    irr = jnp.full((1, 3), 2.0)
    out = np.asarray(shade(pack, surf, w_i, w_o, irr))[0]
    # diffuse: kd*E*cos(0)=2kd ; specular: ks*E*cos^7(0)=2ks
    expected = 2 * np.array([0.25, 0.5, 0.75]) + 2 * np.array([0.1, 0.2, 0.3])
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_sphere_uv_poles_and_seam():
    xml = """
<Scene><MaxRecursionDepth>1</MaxRecursionDepth>
  <Cameras><Camera id="1">
    <Position>0 0 5</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>4 4</ImageResolution><ImageName>s.png</ImageName>
  </Camera></Cameras>
  <Lights></Lights>
  <Materials><Material id="1">
    <AmbientReflectance>1 1 1</AmbientReflectance>
    <DiffuseReflectance>1 1 1</DiffuseReflectance>
    <SpecularReflectance>0 0 0</SpecularReflectance></Material></Materials>
  <Textures><TextureMap id="1" type="perlin">
    <DecalMode>replace_ks</DecalMode></TextureMap></Textures>
  <VertexData>0 0 0</VertexData>
  <Objects><Sphere id="1"><Material>1</Material><Textures>1</Textures>
    <Center>1</Center><Radius>1</Radius></Sphere></Objects></Scene>
"""
    # a texture is attached so the UV computation isn't statically elided
    import tempfile, pathlib

    p = pathlib.Path(tempfile.mkdtemp()) / "s.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    # hit front center: local point (0,0,1): phi=atan2(1,0)=pi/2,
    # theta=acos(0)=pi/2 -> u=(pi-pi/2)/2pi=0.25, v=0.5 (sphere.cpp:84-92)
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 2.0, 0.0]])
    d = jnp.asarray(np.array([[0, 0, -1.0], [0, -1, 0]], np.float32))
    hit = closest_hit(pack, o, d)
    surf = surface_at(pack, o, d, jnp.zeros(2), hit)
    uv = np.asarray(surf.uv)
    np.testing.assert_allclose(uv[0], [0.25, 0.5], atol=1e-5)
    # top pole: theta=0 -> v ~ 0
    assert uv[1][1] < 1e-2
    # normals point outward
    np.testing.assert_allclose(np.asarray(surf.normal)[0], [0, 0, 1], atol=1e-4)
