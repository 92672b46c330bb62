import numpy as np
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.utils import math3d


def test_dot_cross_length():
    a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.array([[4.0, 5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(math3d.dot(a, b), [32.0, 0.0])
    np.testing.assert_allclose(
        math3d.cross(a, b)[1], [0.0, 0.0, -1.0], atol=1e-7
    )
    np.testing.assert_allclose(math3d.length(a)[1], 1.0)


def test_normalize():
    v = jnp.array([[3.0, 0.0, 4.0]])
    np.testing.assert_allclose(math3d.normalize(v), [[0.6, 0.0, 0.8]], atol=1e-7)


def test_reflect():
    # Reflection of w_o about n: r = 2 n (n.w_o) - w_o (raytracer.cpp:426)
    n = jnp.array([[0.0, 1.0, 0.0]])
    w_o = math3d.normalize(jnp.array([[1.0, 1.0, 0.0]]))
    r = math3d.reflect(n, w_o)
    np.testing.assert_allclose(r, [[-0.70710677, 0.70710677, 0.0]], atol=1e-6)


def test_orthonormal_basis_properties():
    rng = np.random.default_rng(0)
    r = math3d.normalize(jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32)))
    u, v = math3d.orthonormal_basis(r)
    np.testing.assert_allclose(math3d.dot(u, r), 0.0, atol=1e-5)
    np.testing.assert_allclose(math3d.dot(v, r), 0.0, atol=1e-5)
    np.testing.assert_allclose(math3d.dot(u, v), 0.0, atol=1e-5)
    np.testing.assert_allclose(math3d.length(u), 1.0, atol=1e-5)
    np.testing.assert_allclose(math3d.length(v), 1.0, atol=1e-5)


def test_orthonormal_basis_matches_reference_trick():
    # axis-swap construction from helperMath.cpp:59-85 on a canonical axis
    r = jnp.array([[0.0, 0.0, 1.0]])
    u, v = math3d.orthonormal_basis(r)
    # rPrime = (1,0,1): u = unit(rPrime x r) = unit((0,-1,0) x ...)
    np.testing.assert_allclose(
        np.abs(np.asarray(math3d.dot(u, r))), 0.0, atol=1e-6
    )


def test_luminance():
    assert abs(float(math3d.luminance(jnp.array([1.0, 1.0, 1.0]))) - 1.0) < 1e-6
