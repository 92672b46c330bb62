import numpy as np

from advanced_cpu_raytracing_tpu.utils import transforms as tf


def test_compose_order():
    # "s r t" applies scale, then rotation, then translation: M = T R S
    ops = [("s", (2.0, 2.0, 2.0)), ("r", (90.0, (0.0, 0.0, 1.0))),
           ("t", (1.0, 0.0, 0.0))]
    m, m_inv = tf.compose(ops)
    p = tf.apply_to_points(m, np.array([1.0, 0.0, 0.0]))
    # scale -> (2,0,0); rotZ 90 -> (0,2,0); translate -> (1,2,0)
    np.testing.assert_allclose(p, [1.0, 2.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(m @ m_inv, np.eye(4), atol=1e-12)


def test_axis_aligned_rotation_matches_matrix_hpp():
    # GetRotationAroundX (matrix.hpp:46-53)
    m = tf.rotation_axis_angle((1, 0, 0), 90.0)
    expected = np.array([
        [1, 0, 0, 0],
        [0, 0, -1, 0],
        [0, 1, 0, 0],
        [0, 0, 0, 1],
    ], dtype=float)
    np.testing.assert_allclose(m, expected, atol=1e-12)


def test_vectors_ignore_translation():
    m = tf.translation([5.0, 6.0, 7.0])
    v = tf.apply_to_vectors(m, np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(v, [1.0, 2.0, 3.0])


def test_transform_aabb_8_corners():
    m = tf.rotation_axis_angle((0, 0, 1), 45.0)
    bmin, bmax = tf.transform_aabb(m, np.array([-1.0, -1.0, -1.0]),
                                   np.array([1.0, 1.0, 1.0]))
    s2 = np.sqrt(2.0)
    np.testing.assert_allclose(bmin, [-s2, -s2, -1.0], atol=1e-12)
    np.testing.assert_allclose(bmax, [s2, s2, 1.0], atol=1e-12)
