"""Native C++ runtime library tests (BVH builder; PLY covered in test_ply)."""

import numpy as np
import pytest

from advanced_cpu_raytracing_tpu.accel.bvh import build_bvh_python
from advanced_cpu_raytracing_tpu.native import bindings


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-10, 10, (n, 3))
    b = a + rng.uniform(-0.5, 0.5, (n, 3))
    c = a + rng.uniform(-0.5, 0.5, (n, 3))
    return (np.minimum(np.minimum(a, b), c), np.maximum(np.maximum(a, b), c),
            (a + b + c) / 3)


def test_native_matches_python():
    bb_min, bb_max, ctr = _random_tris(733, seed=5)
    res = bindings.build_bvh_native(bb_min, bb_max, ctr)
    if res is None:
        pytest.skip("native library unavailable")
    ref = build_bvh_python(bb_min, bb_max, ctr)
    assert res.num_nodes == ref.num_nodes
    assert res.max_depth == ref.max_depth
    np.testing.assert_array_equal(res.order, ref.order)
    np.testing.assert_array_equal(res.node_left, ref.node_left)
    np.testing.assert_array_equal(res.node_first, ref.node_first)
    np.testing.assert_array_equal(res.node_count, ref.node_count)
    np.testing.assert_allclose(res.node_min, ref.node_min, rtol=1e-6)
    np.testing.assert_allclose(res.node_max, ref.node_max, rtol=1e-6)


def test_native_large_build_speed():
    bb_min, bb_max, ctr = _random_tris(50000, seed=9)
    res = bindings.build_bvh_native(bb_min, bb_max, ctr)
    if res is None:
        pytest.skip("native library unavailable")
    # structural sanity on a big build
    assert sorted(res.order.tolist()) == list(range(50000))
    leaves = res.node_left < 0
    assert res.node_count[leaves].sum() == 50000


def test_profiling_utils():
    from advanced_cpu_raytracing_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report()


def test_logger():
    from advanced_cpu_raytracing_tpu.utils.logging import get_logger

    lg = get_logger("acrt.test")
    lg.info("hello")
    assert lg is get_logger("acrt.test")
