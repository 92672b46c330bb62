import numpy as np

from advanced_cpu_raytracing_tpu.accel.bvh import build_bvh_python


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-10, 10, (n, 3))
    b = a + rng.uniform(-0.5, 0.5, (n, 3))
    c = a + rng.uniform(-0.5, 0.5, (n, 3))
    bb_min = np.minimum(np.minimum(a, b), c)
    bb_max = np.maximum(np.maximum(a, b), c)
    center = (a + b + c) / 3
    return bb_min, bb_max, center


def test_build_structure():
    bb_min, bb_max, center = _random_tris(257)
    bvh = build_bvh_python(bb_min, bb_max, center)
    n = 257
    assert sorted(bvh.order.tolist()) == list(range(n))
    # leaves cover every face exactly once
    covered = []
    for i in range(bvh.num_nodes):
        if bvh.node_left[i] < 0:
            covered.extend(range(bvh.node_first[i],
                                 bvh.node_first[i] + bvh.node_count[i]))
        else:
            assert bvh.node_count[i] == 0  # interior (mesh.cpp:125)
    assert sorted(covered) == list(range(n))


def test_child_boxes_contained():
    bb_min, bb_max, center = _random_tris(500, seed=3)
    bvh = build_bvh_python(bb_min, bb_max, center)
    for i in range(bvh.num_nodes):
        l, r = bvh.node_left[i], bvh.node_right[i]
        if l >= 0:
            assert np.all(bvh.node_min[l] >= bvh.node_min[i] - 1e-6)
            assert np.all(bvh.node_max[r] <= bvh.node_max[i] + 1e-6)


def test_leaf_boxes_bound_faces():
    bb_min, bb_max, center = _random_tris(100, seed=7)
    bvh = build_bvh_python(bb_min, bb_max, center)
    for i in range(bvh.num_nodes):
        if bvh.node_left[i] < 0 and bvh.node_count[i] > 0:
            seg = bvh.order[bvh.node_first[i]:bvh.node_first[i] + bvh.node_count[i]]
            np.testing.assert_array_less(bvh.node_min[i] - 1e-6,
                                         bb_min[seg].min(axis=0) + 1e-5)
            assert np.all(bb_max[seg].max(axis=0) <= bvh.node_max[i] + 1e-6)


def test_single_face_and_empty():
    bb_min, bb_max, center = _random_tris(1)
    bvh = build_bvh_python(bb_min, bb_max, center)
    assert bvh.num_nodes == 1
    assert bvh.node_count[0] == 1
