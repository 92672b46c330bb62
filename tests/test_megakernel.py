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

    mc, tab, ctab = build_mega(pack, opts.max_depth)
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
    """PT / textured / motion scenes must not route through the kernel."""
    cfg = load_scene(REF + "cornellbox_recursive_conductors.xml")
    pack = pack_scene(cfg)
    assert not mega_eligible(
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
