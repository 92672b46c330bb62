import numpy as np
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.ops import intersect


def test_ray_triangle_hit():
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([0.0, 0.0, -1.0])
    v0 = jnp.array([-1.0, -1.0, -2.0])
    v1 = jnp.array([1.0, -1.0, -2.0])
    v2 = jnp.array([0.0, 1.0, -2.0])
    t, beta, gamma, valid = intersect.ray_triangle(o, d, v0, v1, v2)
    assert bool(valid)
    np.testing.assert_allclose(float(t), 2.0, atol=1e-6)


def test_ray_triangle_miss_and_edge():
    o = jnp.array([5.0, 5.0, 0.0])
    d = jnp.array([0.0, 0.0, -1.0])
    v0 = jnp.array([-1.0, -1.0, -2.0])
    v1 = jnp.array([1.0, -1.0, -2.0])
    v2 = jnp.array([0.0, 1.0, -2.0])
    _, _, _, valid = intersect.ray_triangle(o, d, v0, v1, v2)
    assert not bool(valid)
    # parallel ray: detA == 0 -> invalid, no nan poisoning
    d2 = jnp.array([1.0, 0.0, 0.0])
    t, b, g, valid2 = intersect.ray_triangle(o, d2, v0, v1, v2)
    assert not bool(valid2)
    assert np.isfinite(float(t))


def test_ray_triangle_barycentric():
    o = jnp.array([0.25, -0.5, 0.0])  # inside the triangle, offset
    d = jnp.array([0.0, 0.0, -1.0])
    v0 = jnp.array([-1.0, -1.0, -2.0])
    v1 = jnp.array([1.0, -1.0, -2.0])
    v2 = jnp.array([0.0, 1.0, -2.0])
    t, beta, gamma, valid = intersect.ray_triangle(o, d, v0, v1, v2)
    assert bool(valid)
    p = np.asarray(o + d * t)
    rec = np.asarray(v0 + beta * (v1 - v0) + gamma * (v2 - v0))
    np.testing.assert_allclose(p, rec, atol=1e-6)


def test_ray_sphere_roots():
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([0.0, 0.0, -1.0])
    c = jnp.array([0.0, 0.0, -5.0])
    t, valid = intersect.ray_sphere(o, d, c, 1.0)
    assert bool(valid)
    np.testing.assert_allclose(float(t), 4.0, atol=1e-6)
    # inside the sphere: picks the positive (far) root
    t2, valid2 = intersect.ray_sphere(o, d, jnp.array([0.0, 0.0, 0.5]), 1.0)
    assert bool(valid2)
    np.testing.assert_allclose(float(t2), 0.5, atol=1e-5)
    # behind: both roots negative -> invalid
    _, valid3 = intersect.ray_sphere(o, d, jnp.array([0.0, 0.0, 5.0]), 1.0)
    assert not bool(valid3)


def test_ray_aabb():
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([0.0, 0.0, -1.0])
    assert bool(intersect.ray_aabb(o, d, jnp.array([-1.0, -1.0, -3.0]),
                                   jnp.array([1.0, 1.0, -2.0]), jnp.inf))
    assert not bool(intersect.ray_aabb(o, d, jnp.array([2.0, 2.0, -3.0]),
                                       jnp.array([3.0, 3.0, -2.0]), jnp.inf))
    # behind the origin
    assert not bool(intersect.ray_aabb(o, d, jnp.array([-1.0, -1.0, 2.0]),
                                       jnp.array([1.0, 1.0, 3.0]), jnp.inf))
    # min_t culling (shape.hpp:99: tmin < minT)
    assert not bool(intersect.ray_aabb(o, d, jnp.array([-1.0, -1.0, -3.0]),
                                       jnp.array([1.0, 1.0, -2.0]), 1.0))


def test_transform_ray_preserves_t():
    # t measured along an unnormalized transformed direction equals world t
    minv = jnp.array([[0.5, 0.0, 0.0, 1.0],
                      [0.0, 0.5, 0.0, 2.0],
                      [0.0, 0.0, 0.5, 3.0]])
    o = jnp.array([1.0, 2.0, 3.0])
    d = jnp.array([0.0, 0.0, -1.0])
    o_l, d_l = intersect.transform_ray(minv, o, d)
    t = 4.0
    world_pt = o + d * t
    local_pt = o_l + d_l * t
    wl = intersect.transform_ray(minv, world_pt, jnp.zeros(3))[0]
    np.testing.assert_allclose(np.asarray(local_pt), np.asarray(wl), atol=1e-6)
