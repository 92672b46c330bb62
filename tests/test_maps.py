"""Normal-map and bump-map tests (mesh TBN path mesh.cpp:264-357, sphere
bump path sphere.cpp:116-169)."""

import numpy as np
import pytest


def _flat_normal_png(path, tilt=0):
    """Normal map: (128,128,255) = unperturbed; tilt shifts the x component."""
    from advanced_cpu_raytracing_tpu.post.writers import write_png

    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 128 + tilt
    img[..., 1] = 128
    img[..., 2] = 255
    write_png(path, img)


def _ramp_png(path):
    """Height field ramp along u for bump mapping."""
    from advanced_cpu_raytracing_tpu.post.writers import write_png

    ramp = np.linspace(0, 255, 16, dtype=np.uint8)
    img = np.tile(ramp[None, :, None], (16, 1, 3))
    write_png(path, img)


def _render_quad(tmp_path, tex_block, tex_ids, name):
    from advanced_cpu_raytracing_tpu.render.renderer import render_camera
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    xml = f"""
<Scene><MaxRecursionDepth>1</MaxRecursionDepth>
  <BackgroundColor>0 0 0</BackgroundColor>
  <Cameras><Camera id="1">
    <Position>0 0 3</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>12 12</ImageResolution><ImageName>m.png</ImageName>
  </Camera></Cameras>
  <Lights><PointLight id="1"><Position>0 0 4</Position>
    <Intensity>1600 1600 1600</Intensity></PointLight></Lights>
  <Materials><Material id="1">
    <AmbientReflectance>0 0 0</AmbientReflectance>
    <DiffuseReflectance>1 1 1</DiffuseReflectance>
    <SpecularReflectance>0 0 0</SpecularReflectance></Material></Materials>
  <Textures>{tex_block}</Textures>
  <VertexData>-1 -1 0  1 -1 0  1 1 0  -1 1 0  0 0 0</VertexData>
  <TexCoordData>0 1  1 1  1 0  0 0</TexCoordData>
  <Objects><Mesh id="1"><Material>1</Material>
    <Textures>{tex_ids}</Textures>
    <Faces>1 2 3  1 3 4</Faces></Mesh></Objects></Scene>
"""
    p = tmp_path / name
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    return render_camera(pack, cfg, cfg.cameras[0], seed=0, tile_size=1024)


def test_identity_normal_map_unchanged(tmp_path):
    png = tmp_path / "flat.png"
    _flat_normal_png(str(png), tilt=0)
    tex = f"""<Images><Image id="1">{png}</Image></Images>
      <TextureMap id="1" type="image"><DecalMode>replace_normal</DecalMode>
      <ImageId>1</ImageId></TextureMap>"""
    img_mapped = _render_quad(tmp_path, tex, "1", "nm.xml")
    img_plain = _render_quad(tmp_path, tex, "", "plain.xml")
    # a (128,128,255) normal map leaves the geometric normal intact
    np.testing.assert_allclose(img_mapped, img_plain, rtol=5e-3, atol=0.5)


def test_tilted_normal_map_changes_shading(tmp_path):
    png = tmp_path / "tilt.png"
    _flat_normal_png(str(png), tilt=60)
    tex = f"""<Images><Image id="1">{png}</Image></Images>
      <TextureMap id="1" type="image"><DecalMode>replace_normal</DecalMode>
      <ImageId>1</ImageId></TextureMap>"""
    img_tilt = _render_quad(tmp_path, tex, "1", "t.xml")
    img_plain = _render_quad(tmp_path, tex, "", "p.xml")
    assert np.abs(img_tilt - img_plain).mean() > 1.0


def test_image_bump_map_modulates(tmp_path):
    png = tmp_path / "ramp.png"
    _ramp_png(str(png))
    tex = f"""<Images><Image id="1">{png}</Image></Images>
      <TextureMap id="1" type="image"><DecalMode>bump_normal</DecalMode>
      <ImageId>1</ImageId><BumpFactor>4</BumpFactor></TextureMap>"""
    img_bump = _render_quad(tmp_path, tex, "1", "b.xml")
    img_plain = _render_quad(tmp_path, tex, "", "p2.xml")
    assert np.isfinite(img_bump).all()
    assert np.abs(img_bump - img_plain).mean() > 0.5


def test_perlin_bump_on_sphere(tmp_path):
    from advanced_cpu_raytracing_tpu.render.renderer import render_camera
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    xml = """
<Scene><MaxRecursionDepth>1</MaxRecursionDepth>
  <BackgroundColor>0 0 0</BackgroundColor>
  <Cameras><Camera id="1">
    <Position>0 0 3</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
    <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
    <ImageResolution>16 16</ImageResolution><ImageName>pb.png</ImageName>
  </Camera></Cameras>
  <Lights><PointLight id="1"><Position>2 2 4</Position>
    <Intensity>1600 1600 1600</Intensity></PointLight></Lights>
  <Materials><Material id="1">
    <AmbientReflectance>0 0 0</AmbientReflectance>
    <DiffuseReflectance>1 1 1</DiffuseReflectance>
    <SpecularReflectance>0 0 0</SpecularReflectance></Material></Materials>
  <Textures><TextureMap id="1" type="perlin">
    <DecalMode>bump_normal</DecalMode><NoiseScale>6</NoiseScale>
    <BumpFactor>3</BumpFactor></TextureMap></Textures>
  <VertexData>0 0 0</VertexData>
  <Objects><Sphere id="1"><Material>1</Material><Textures>1</Textures>
    <Center>1</Center><Radius>1</Radius></Sphere></Objects></Scene>
"""
    p = tmp_path / "pb.xml"
    p.write_text(xml)
    cfg = load_scene(str(p))
    pack = pack_scene(cfg)
    img = render_camera(pack, cfg, cfg.cameras[0], seed=0, tile_size=1024)
    assert np.isfinite(img).all()
    # bump perturbation produces non-smooth shading across the sphere
    interior = img[5:11, 5:11, 0]
    grad = np.abs(np.diff(interior, axis=0))
    assert grad.mean() > 0.5
