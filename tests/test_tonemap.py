import numpy as np

from advanced_cpu_raytracing_tpu.post.tonemap import reinhard_tonemap


def _reference_tonemap(hdr, key=0.18, burn=1.0, sat=1.0, gamma=2.2):
    """Direct numpy transcription of Tonemapper::Tonemap
    (src/tonemapper.h:28-121) as the oracle."""
    h, w, _ = hdr.shape
    delta = 0.01
    lum = 0.2126 * hdr[..., 0] + 0.7152 * hdr[..., 1] + 0.0722 * hdr[..., 2]
    avg = np.exp(np.mean(np.log(delta + lum.astype(np.float64))))
    flat = np.sort(hdr.reshape(-1))
    out = np.zeros_like(hdr)
    for i in range(h):
        for j in range(w):
            y_i = lum[i, j]
            lxy = key * y_i / avg
            if burn > 0.01:
                last = flat.size - 1
                idx = min(last, int((100.0 - burn) / 100.0 * last))
                thr = flat[idx] * key / avg
                y_o = lxy * (1 + lxy / (thr * thr)) / (1 + lxy)
            else:
                y_o = lxy / (1 + lxy)
            for c in range(3):
                r = np.clip(y_o * (hdr[i, j, c] / y_i) ** sat, 0, 1)
                out[i, j, c] = np.floor(min(255.0, 255 * r ** (1 / gamma)))
    return out.astype(np.uint8)


def test_matches_reference_transcription():
    rng = np.random.default_rng(0)
    hdr = rng.uniform(0.01, 20.0, (8, 9, 3)).astype(np.float32)
    ours = reinhard_tonemap(hdr)
    oracle = _reference_tonemap(hdr)
    diff = np.abs(ours.astype(int) - oracle.astype(int))
    assert diff.max() <= 1  # floor() edges may differ by 1 ulp


def test_no_burn_path():
    rng = np.random.default_rng(1)
    hdr = rng.uniform(0.01, 5.0, (6, 6, 3)).astype(np.float32)
    ours = reinhard_tonemap(hdr, burn_percent=0.0)
    oracle = _reference_tonemap(hdr, burn=0.0)
    assert np.abs(ours.astype(int) - oracle.astype(int)).max() <= 1


def test_saturation_gamma():
    rng = np.random.default_rng(2)
    hdr = rng.uniform(0.01, 5.0, (5, 5, 3)).astype(np.float32)
    ours = reinhard_tonemap(hdr, saturation=1.3, gamma=1.8)
    oracle = _reference_tonemap(hdr, sat=1.3, gamma=1.8)
    assert np.abs(ours.astype(int) - oracle.astype(int)).max() <= 1


def test_monotone_in_luminance():
    ramp = np.linspace(0.01, 50, 64, dtype=np.float32)
    hdr = np.tile(ramp[None, :, None], (1, 1, 3))
    ours = reinhard_tonemap(hdr, burn_percent=0.0).astype(int)
    assert np.all(np.diff(ours[0, :, 0]) >= 0)
