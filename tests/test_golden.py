"""Golden-image comparison against the reference's committed renders
(archive/hw1_outputs — SURVEY.md section 4).

Tolerances: the reference exhibits fp-order-sensitive shadow acne on sphere
silhouettes (visible as isolated black/lit pixel noise in its own outputs),
so bitwise equality is impossible; we require the mean abs difference and the
fraction of pixels differing by more than 2/255 to be tiny.
"""

import dataclasses

import numpy as np
import pytest

from tests.conftest import HW1_INPUTS, golden_image

CASES = [
    # (scene, mean_tol, frac_gt2_tol)
    ("simple", 2.0, 0.02),
    ("two_spheres", 2.0, 0.03),
    ("spheres_mirror", 1.0, 0.01),
    ("cornellbox_recursive_conductors", 1.5, 0.03),
]


def _render(name, spp=None, force_bvh=False):
    from advanced_cpu_raytracing_tpu.render.renderer import (
        ldr_from_radiance,
        render_camera,
    )
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    cfg = load_scene(str(HW1_INPUTS / f"{name}.xml"))
    pack = pack_scene(cfg)
    if force_bvh:
        pack = dataclasses.replace(
            pack, static=dataclasses.replace(pack.static, use_bvh=True)
        )
    cam = cfg.cameras[0]
    img = render_camera(pack, cfg, cam, seed=0, spp=spp)
    return ldr_from_radiance(img)


@pytest.mark.golden
@pytest.mark.parametrize("name,mean_tol,frac_tol", CASES)
def test_golden(name, mean_tol, frac_tol):
    ours = _render(name)
    gold = golden_image(name)
    diff = np.abs(ours.astype(int) - gold.astype(int))
    assert diff.mean() < mean_tol, f"mean {diff.mean()}"
    assert (diff > 2).mean() < frac_tol, f"frac {(diff > 2).mean()}"


@pytest.mark.golden
def test_golden_simple_bvh_path():
    # same scene through the BVH traversal path must match the golden too
    ours = _render("simple", force_bvh=True)
    gold = golden_image("simple")
    diff = np.abs(ours.astype(int) - gold.astype(int))
    assert diff.mean() < 2.0
    assert (diff > 2).mean() < 0.02
