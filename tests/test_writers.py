import numpy as np

from advanced_cpu_raytracing_tpu.post.writers import (
    read_ppm,
    write_hdr,
    write_png,
    write_ppm,
)
from advanced_cpu_raytracing_tpu.scene.images import load_image, read_hdr


def _img(h=7, w=5):
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_png_roundtrip(tmp_path):
    img = _img()
    p = tmp_path / "t.png"
    write_png(str(p), img)
    back, is_hdr = load_image(str(p))
    assert not is_hdr
    np.testing.assert_array_equal(back.astype(np.uint8), img)


def test_ppm_roundtrip(tmp_path):
    img = _img()
    p = tmp_path / "t.ppm"
    write_ppm(str(p), img)
    np.testing.assert_array_equal(read_ppm(str(p)), img)


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    hdr = (rng.uniform(0, 8, (6, 9, 3)) ** 2).astype(np.float32)
    p = tmp_path / "t.hdr"
    write_hdr(str(p), hdr)
    back = read_hdr(str(p))
    assert back.shape == hdr.shape
    # RGBE shares ONE 8-bit exponent across the three channels (the format,
    # not an implementation choice): with the max channel m·2^e (m in
    # [0.5,1)), every channel quantizes in steps of 2^(e-8) <= maxc·2^-7.
    # Small channels of high-dynamic-range pixels therefore carry absolute
    # error up to that step — rtol on the small channel is meaningless.
    step = np.ldexp(1.0, np.frexp(hdr.max(axis=-1))[1] - 8)
    assert np.all(np.abs(back - hdr) <= step[..., None] + 1e-6)
    # the max channel itself keeps ~8-bit relative precision
    np.testing.assert_allclose(
        back.max(axis=-1), hdr.max(axis=-1), rtol=2 ** -7)


def test_hdr_zero_pixels(tmp_path):
    hdr = np.zeros((2, 3, 3), np.float32)
    hdr[0, 0] = [1.0, 0.5, 0.25]
    p = tmp_path / "z.hdr"
    write_hdr(str(p), hdr)
    back = read_hdr(str(p))
    np.testing.assert_allclose(back[1], 0.0)
    np.testing.assert_allclose(back[0, 0], hdr[0, 0], rtol=0.01)
