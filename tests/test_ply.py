import io

import numpy as np
import pytest

from advanced_cpu_raytracing_tpu.scene.ply import load_ply_python
from tests.conftest import HW1_INPUTS

TON_PLY = HW1_INPUTS / "akif_uslu" / "ton_Roosendaal_smooth_ply" / "mesh_1.ply"


def _write_ascii_ply(path, quads=False):
    faces = "3 0 1 2\n" if not quads else "4 0 1 2 3\n"
    nv = 4
    path.write_text(
        "ply\nformat ascii 1.0\n"
        f"element vertex {nv}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n" + faces
    )


def test_ascii_tri(tmp_path):
    p = tmp_path / "t.ply"
    _write_ascii_ply(p)
    v, t = load_ply_python(str(p))
    assert v.shape == (4, 3) and t.shape == (1, 3)
    np.testing.assert_allclose(v[2], [1, 1, 0])


def test_ascii_quad_split(tmp_path):
    # quad -> (v0,v1,v2) + (v2,v3,v0) (parser.cpp:1431-1437)
    p = tmp_path / "q.ply"
    _write_ascii_ply(p, quads=True)
    v, t = load_ply_python(str(p))
    assert t.shape == (2, 3)
    np.testing.assert_array_equal(t[0], [0, 1, 2])
    np.testing.assert_array_equal(t[1], [2, 3, 0])


@pytest.mark.skipif(not TON_PLY.exists(), reason="reference asset missing")
def test_binary_reference_asset():
    v, t = load_ply_python(str(TON_PLY))
    assert v.shape == (8190, 3)
    assert t.shape == (16384, 3)
    assert t.min() >= 0 and t.max() < 8190
    assert np.isfinite(v).all()


@pytest.mark.skipif(not TON_PLY.exists(), reason="reference asset missing")
def test_native_matches_python():
    from advanced_cpu_raytracing_tpu.native.bindings import load_ply_native

    res = load_ply_native(str(TON_PLY))
    if res is None:
        pytest.skip("native library unavailable")
    vn, tn = res
    vp, tp = load_ply_python(str(TON_PLY))
    np.testing.assert_array_equal(tn, tp)
    np.testing.assert_allclose(vn, vp)
