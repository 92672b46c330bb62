"""Synthetic scene + asset builders for feature tests.

The reference repo commits no scenes exercising path tracing, textures, DoF,
tonemapping, area/mesh/env lights (SURVEY.md section 0.2) — these builders
author them, with synthetic texture assets, so the features are testable.
"""

from __future__ import annotations

import numpy as np


def checkerboard_png(path: str, n: int = 8, cell: int = 4) -> None:
    from advanced_cpu_raytracing_tpu.post.writers import write_png

    size = n * cell
    yy, xx = np.mgrid[0:size, 0:size]
    mask = ((yy // cell + xx // cell) % 2).astype(np.uint8)
    img = np.stack([mask * 255, mask * 255, np.full_like(mask, 128)], axis=-1)
    write_png(path, img)


def gradient_hdr(path: str, w: int = 64, h: int = 32) -> None:
    """Lat-long env map: bright band near +y pole, dark at -y."""
    from advanced_cpu_raytracing_tpu.post.writers import write_hdr

    v = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = 2.0 * (1 - v)
    img[..., 1] = 1.0
    img[..., 2] = 2.0 * v
    write_hdr(path, img)


CORNELL_PT = """
<Scene>
  <MaxRecursionDepth>{depth}</MaxRecursionDepth>
  <BackgroundColor>0 0 0</BackgroundColor>
  <Cameras>
    <Camera id="1">
      <Position>0 5 20</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
      <NearPlane>-5 5 -5 5</NearPlane><NearDistance>10</NearDistance>
      <ImageResolution>{res} {res}</ImageResolution>
      <ImageName>pt.png</ImageName>
      <NumSamples>{spp}</NumSamples>
      <Renderer>PathTracing</Renderer>
      <RendererParams>{params}</RendererParams>
    </Camera>
  </Cameras>
  <Lights></Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.7 0.7 0.7</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance></Material>
    <Material id="2"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.7 0.1 0.1</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance></Material>
    <Material id="3"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.1 0.7 0.1</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance></Material>
    <Material id="4"><AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0 0 0</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance></Material>
  </Materials>
  <VertexData>
    -5 0 5    5 0 5    5 0 -5   -5 0 -5
    -5 10 5   5 10 5   5 10 -5  -5 10 -5
    -1.5 9.99 -1.5   1.5 9.99 -1.5   1.5 9.99 1.5   -1.5 9.99 1.5
  </VertexData>
  <Objects>
    <Mesh id="1"><Material>1</Material>
      <Faces>1 2 3  1 3 4</Faces></Mesh>
    <Mesh id="2"><Material>1</Material>
      <Faces>5 7 6  5 8 7</Faces></Mesh>
    <Mesh id="3"><Material>1</Material>
      <Faces>4 3 7  4 7 8</Faces></Mesh>
    <Mesh id="4"><Material>2</Material>
      <Faces>1 4 8  1 8 5</Faces></Mesh>
    <Mesh id="5"><Material>3</Material>
      <Faces>2 6 7  2 7 3</Faces></Mesh>
    <LightMesh id="6"><Material>4</Material>
      <Radiance>{radiance} {radiance} {radiance}</Radiance>
      <Faces>9 10 11  9 11 12</Faces></LightMesh>
  </Objects>
</Scene>
"""


def cornell_pt_xml(depth=4, res=32, spp=16, params="NextEventEstimation",
                   radiance=8.0) -> str:
    return CORNELL_PT.format(depth=depth, res=res, spp=spp, params=params,
                             radiance=radiance)


TEXTURED = """
<Scene>
  <MaxRecursionDepth>2</MaxRecursionDepth>
  <BackgroundColor>0 0 0</BackgroundColor>
  <Cameras>
    <Camera id="1">
      <Position>0 0 3</Position><Gaze>0 0 -1</Gaze><Up>0 1 0</Up>
      <NearPlane>-1 1 -1 1</NearPlane><NearDistance>1</NearDistance>
      <ImageResolution>{res} {res}</ImageResolution>
      <ImageName>tex.png</ImageName>
    </Camera>
  </Cameras>
  <Lights>
    <AmbientLight>30 30 30</AmbientLight>
    <PointLight id="1"><Position>0 2 3</Position>
      <Intensity>400 400 400</Intensity></PointLight>
  </Lights>
  <Materials>
    <Material id="1"><AmbientReflectance>1 1 1</AmbientReflectance>
      <DiffuseReflectance>0.5 0.5 0.5</DiffuseReflectance>
      <SpecularReflectance>0.3 0.3 0.3</SpecularReflectance>
      <PhongExponent>10</PhongExponent></Material>
  </Materials>
  <Textures>
    <Images>
      <Image id="1">{image}</Image>
    </Images>
    <TextureMap id="1" type="image">
      <DecalMode>{decal}</DecalMode>
      <ImageId>1</ImageId>
      <Interpolation>{interp}</Interpolation>
    </TextureMap>
    <TextureMap id="2" type="perlin">
      <DecalMode>replace_kd</DecalMode>
      <NoiseScale>3</NoiseScale>
      <NoiseConversion>absval</NoiseConversion>
    </TextureMap>
  </Textures>
  <VertexData>
    -1 -1 0   1 -1 0   1 1 0   -1 1 0
    0 0 0
  </VertexData>
  <TexCoordData>
    0 1   1 1   1 0   0 0
  </TexCoordData>
  <Objects>
    {objects}
  </Objects>
</Scene>
"""

QUAD_OBJ = """<Mesh id="1"><Material>1</Material><Textures>{tex}</Textures>
      <Faces>1 2 3  1 3 4</Faces></Mesh>"""
SPHERE_OBJ = """<Sphere id="1"><Material>1</Material><Textures>{tex}</Textures>
      <Center>5</Center><Radius>1</Radius></Sphere>"""


def textured_xml(image_path: str, decal="replace_kd", interp="nearest",
                 obj="quad", tex_ids="1", res=24) -> str:
    objects = (QUAD_OBJ if obj == "quad" else SPHERE_OBJ).format(tex=tex_ids)
    return TEXTURED.format(image=image_path, decal=decal, interp=interp,
                           objects=objects, res=res)


MIRROR_MAT = """<Material id="5" type="mirror">
      <AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.05 0.05 0.05</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <MirrorReflectance>0.85 0.88 0.9</MirrorReflectance></Material>"""
CONDUCTOR_MAT = """<Material id="6" type="conductor">
      <AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0.05 0.02 0.02</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <MirrorReflectance>0.9 0.7 0.5</MirrorReflectance>
      <RefractionIndex>0.2</RefractionIndex>
      <AbsorptionIndex>3.9</AbsorptionIndex></Material>"""
DIELECTRIC_MAT = """<Material id="7" type="dielectric">
      <AmbientReflectance>0 0 0</AmbientReflectance>
      <DiffuseReflectance>0 0 0</DiffuseReflectance>
      <SpecularReflectance>0 0 0</SpecularReflectance>
      <RefractionIndex>1.5</RefractionIndex>
      <AbsorptionCoefficient>0.02 0.05 0.02</AbsorptionCoefficient>
      </Material>"""


def cornell_pt_spec_xml(depth=2, res=32, spp=1, params="NextEventEstimation",
                        radiance=8.0, dielectric=False) -> str:
    """Cornell PT box with specular mixtures (round 5): the left wall
    becomes a mirror and the right wall a conductor; with ``dielectric``,
    a glass sphere sits mid-box.  Exercises the reference's PT recursion
    through specular hits (raytracer.cpp:135-191 + 261-472)."""
    xml = cornell_pt_xml(depth=depth, res=res, spp=spp, params=params,
                         radiance=radiance)
    mats = MIRROR_MAT + "\n" + CONDUCTOR_MAT
    if dielectric:
        mats += "\n" + DIELECTRIC_MAT
    xml = xml.replace("</Materials>", mats + "\n</Materials>")
    xml = xml.replace('<Mesh id="4"><Material>2</Material>',
                      '<Mesh id="4"><Material>5</Material>')
    xml = xml.replace('<Mesh id="5"><Material>3</Material>',
                      '<Mesh id="5"><Material>6</Material>')
    if dielectric:
        xml = xml.replace(
            "</VertexData>", "  0 3.5 0\n  </VertexData>").replace(
            "</Objects>",
            '<Sphere id="1"><Material>7</Material>'
            "<Center>13</Center><Radius>2</Radius></Sphere>\n  </Objects>")
    return xml
