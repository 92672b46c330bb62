"""Golden-image comparison against the reference renderer.

Preferred oracle: the reference's *current* source compiled and run fresh
(tests/conftest.fresh_golden) — the archived hw1_outputs PNGs were produced
by older homework iterations (cornellbox_recursive_alt2.png in particular
predates the current camera code and disagrees with the reference binary
itself by mean 114/255).  The archived PNG is the fallback when no compiler
is available.

Tolerances: the reference exhibits fp-order-sensitive shadow acne on sphere
silhouettes (visible as isolated black/lit pixel noise in its own outputs),
so bitwise equality is impossible against archived goldens; fresh goldens
typically match near-exactly.
"""

import dataclasses

import numpy as np
import pytest

from tests.conftest import HW1_INPUTS, fresh_golden, golden_image

CASES = [
    # (scene, mean_tol, frac_gt2_tol)
    ("simple", 2.0, 0.02),
    ("two_spheres", 2.0, 0.03),
    ("spheres_mirror", 1.0, 0.01),
    ("cornellbox_recursive_conductors", 1.5, 0.03),
    ("spheres", 2.0, 0.03),
    ("cornellbox_recursive_alt2", 2.5, 0.05),  # dielectric recursion
    ("scienceTree", 2.5, 0.05),
    ("scienceTree_diamond", 3.5, 0.08),  # dielectric mesh, deep splits
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
    gold = fresh_golden(name)
    if gold is None:
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


@pytest.mark.golden
@pytest.mark.slow
def test_golden_ton_roosendaal_bvh():
    """Large PLY mesh (16k faces) through the BVH traversal path, against the
    author's archived render (deterministic 1-spp scene; the archived PNG for
    this scene matches the current reference code)."""
    from PIL import Image

    from advanced_cpu_raytracing_tpu.render.renderer import (
        ldr_from_radiance,
        render_camera,
    )
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene
    from tests.conftest import HW1_INPUTS, HW1_OUTPUTS

    scene = HW1_INPUTS / "akif_uslu" / "ton_Roosendaal_smooth.xml"
    gold_path = HW1_OUTPUTS / "akif_uslu" / "ton_Roosendaal_smooth.png"
    if not scene.exists() or not gold_path.exists():
        pytest.skip("assets missing")
    cfg = load_scene(str(scene))
    pack = pack_scene(cfg)
    assert pack.static.use_bvh
    img = ldr_from_radiance(render_camera(pack, cfg, cfg.cameras[0], seed=0))
    gold = np.asarray(Image.open(gold_path).convert("RGB"))
    diff = np.abs(img.astype(int) - gold.astype(int))
    assert diff.mean() < 3.0, f"mean {diff.mean()}"
    assert (diff > 2).mean() < 0.05, f"frac {(diff > 2).mean()}"
