"""Pallas kernel equivalence tests (interpret mode on CPU; the same kernels
compile natively on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from advanced_cpu_raytracing_tpu.ops.intersect import ray_triangle
from advanced_cpu_raytracing_tpu.ops.pallas.tri_intersect import (
    tri_closest_hit_pallas,
)


def _random_case(n_rays=200, n_tris=37, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    v0 = rng.uniform(-4, 4, (n_tris, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    return map(jnp.asarray, (o, d, v0, v1, v2))


def _jnp_reference(o, d, v0, v1, v2):
    t, beta, gamma, valid = ray_triangle(
        o[None, :, :], d[None, :, :], v0[:, None, :], v1[:, None, :],
        v2[:, None, :],
    )
    t = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t, axis=0)
    r = jnp.arange(t.shape[1])
    return t[best, r], jnp.where(t[best, r] < jnp.inf, best, -1), \
        beta[best, r], gamma[best, r]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_jnp(seed):
    o, d, v0, v1, v2 = _random_case(seed=seed)
    tk, ik, bk, gk = tri_closest_hit_pallas(o, d, v0, v1, v2, interpret=True)
    tj, ij, bj, gj = _jnp_reference(o, d, v0, v1, v2)
    hit_k = np.asarray(ik) >= 0
    hit_j = np.asarray(ij) >= 0
    np.testing.assert_array_equal(hit_k, hit_j)
    # the kernel folds determinants in scalarized order; near-degenerate
    # triangles round differently at the last ulp
    np.testing.assert_allclose(np.asarray(tk)[hit_k], np.asarray(tj)[hit_j],
                               rtol=1e-4)
    # winners can differ only on exact t ties; require same t, and same
    # barycentrics when the same face won
    same = hit_k & (np.asarray(ik) == np.asarray(ij))
    np.testing.assert_allclose(np.asarray(bk)[same], np.asarray(bj)[same],
                               rtol=1e-4, atol=1e-5)


def test_all_miss():
    o, d, v0, v1, v2 = _random_case(n_rays=64, n_tris=8, seed=3)
    # point all rays away from every triangle
    o = o + 1000.0
    tk, ik, _, _ = tri_closest_hit_pallas(o, d, v0, v1, v2, interpret=True)
    assert np.all(np.asarray(ik) == -1)
    assert np.all(np.isinf(np.asarray(tk)))


def test_nonmultiple_shapes():
    # ray count not a multiple of 128, tri count not a multiple of 8
    o, d, v0, v1, v2 = _random_case(n_rays=67, n_tris=13, seed=4)
    tk, ik, bk, gk = tri_closest_hit_pallas(o, d, v0, v1, v2, interpret=True)
    tj, ij, bj, gj = _jnp_reference(o, d, v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(ik) >= 0, np.asarray(ij) >= 0)
    m = np.asarray(ik) >= 0
    np.testing.assert_allclose(np.asarray(tk)[m], np.asarray(tj)[m], rtol=1e-5)


def test_traverse_pallas_integration():
    """closest_hit/occluded through the Pallas brute path (interpret mode)
    must match the jnp path on a real scene."""
    import advanced_cpu_raytracing_tpu.ops.traverse as T
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene
    from tests.conftest import HW1_INPUTS

    pack = pack_scene(load_scene(
        str(HW1_INPUTS / "cornellbox_recursive_conductors.xml")))
    rng = np.random.default_rng(0)
    n = 128
    o = jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    old = T.USE_PALLAS_BRUTE
    try:
        T.USE_PALLAS_BRUTE = True
        hp = T.closest_hit(pack, o, d)
        op = T.occluded(pack, o, d, jnp.full(n, 5.0))
        T.USE_PALLAS_BRUTE = False
        hj = T.closest_hit(pack, o, d)
        oj = T.occluded(pack, o, d, jnp.full(n, 5.0))
    finally:
        T.USE_PALLAS_BRUTE = old
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hj.valid))
    m = np.asarray(hj.valid)
    np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hj.t)[m],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hp.index)[m],
                                  np.asarray(hj.index)[m])
    np.testing.assert_array_equal(np.asarray(op), np.asarray(oj))
