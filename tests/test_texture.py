import numpy as np
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.ops import texture as T


def _atlas():
    # one 4x2 image: distinct texel values
    img = np.arange(4 * 2 * 3, dtype=np.float32).reshape(1, 2, 4, 3)
    w = jnp.array([4], jnp.int32)
    h = jnp.array([2], jnp.int32)
    return jnp.asarray(img), w, h


def test_nearest_matches_int_truncation():
    atlas, w, h = _atlas()
    idx = jnp.zeros(3, jnp.int32)
    # u*w truncated: u=0.6 -> i=2; v=0.9 -> j=1 (imageTexture.h:63-68)
    u = jnp.array([0.6, 0.999, 0.0])
    v = jnp.array([0.9, 0.999, 0.0])
    out = T.sample_nearest(atlas, w, h, idx, u, v)
    np.testing.assert_allclose(out[0], atlas[0, 1, 2])
    np.testing.assert_allclose(out[1], atlas[0, 1, 3])  # clamped to w-1
    np.testing.assert_allclose(out[2], atlas[0, 0, 0])


def test_bilinear_interpolates():
    atlas, w, h = _atlas()
    idx = jnp.zeros(1, jnp.int32)
    # halfway between texels (0,0) and (1,0) at exact coords
    u = jnp.array([0.125])  # u*w = 0.5
    v = jnp.array([0.0])
    out = T.sample_bilinear(atlas, w, h, idx, u, v)
    expected = 0.5 * (np.asarray(atlas[0, 0, 0]) + np.asarray(atlas[0, 0, 1]))
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-6)


def test_tile_uv():
    # GetFloorForTiledUV (mesh.cpp:382-389): u <= 1.0001 passes through,
    # larger wraps to fractional part, near-integer wraps to 1.0
    x = jnp.array([0.5, 1.0, 2.25, 3.00005, -0.5])
    out = np.asarray(T.tile_uv(x))
    assert out[0] == 0.5
    assert out[1] == 1.0
    np.testing.assert_allclose(out[2], 0.25, atol=1e-6)
    np.testing.assert_allclose(out[3], 1.0)  # frac < 1e-4 -> 1.0
    assert out[4] == -0.5  # negative untouched, like the reference


def test_perlin_range_and_determinism():
    pts = jnp.asarray(np.random.default_rng(0).uniform(-8, 8, (256, 3)),
                      jnp.float32)
    n = np.asarray(T.perlin_raw(pts))
    assert np.all(n >= -1.0) and np.all(n <= 1.0)  # perlinTexture.h:113-116
    n2 = np.asarray(T.perlin_raw(pts))
    np.testing.assert_array_equal(n, n2)
    # nonconstant
    assert n.std() > 0.05


def test_perlin_conversions():
    pts = jnp.asarray(np.random.default_rng(1).uniform(-4, 4, (64, 3)),
                      jnp.float32)
    lin = np.asarray(T.perlin_sample(pts, jnp.ones(64), jnp.zeros(64, jnp.int32)))
    absv = np.asarray(T.perlin_sample(pts, jnp.ones(64), jnp.ones(64, jnp.int32)))
    assert np.all(lin >= 0) and np.all(lin <= 1)
    assert np.all(absv >= 0) and np.all(absv <= 1)


def test_perlin_lattice_zero():
    # classic Perlin is zero at integer lattice points
    pts = jnp.asarray(np.array([[0, 0, 0], [1, 2, 3], [-4, 5, -6]]), jnp.float32)
    np.testing.assert_allclose(np.asarray(T.perlin_raw(pts)), 0.0, atol=1e-6)
