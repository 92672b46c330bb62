"""Host-side image decode/encode.

Replaces the reference's vendored stb_image / tinyexr (src/LDRImage.h:40,
src/HDRImage.h:45-70):

  - LDR (png/jpg...) decode via PIL -> float32 arrays kept in **0..255**
    range, matching ``LDRImage::GetSample`` returning raw bytes.
  - EXR decode via imageio (if built with an EXR plugin) or a minimal native
    reader; falls back with a clear error.
  - Radiance ``.hdr`` (RGBE) encode/decode implemented here directly —
    the reference writes .hdr via stb_image_write (src/main.cpp:191).
"""

from __future__ import annotations

import numpy as np


def load_image(path: str) -> tuple[np.ndarray, bool]:
    """Return (data (H,W,3) float32, is_hdr).

    LDR values stay in 0..255 like the reference byte samples; HDR (.exr/.hdr)
    are linear floats.
    """
    lower = path.lower()
    if lower.endswith(".exr"):
        return load_exr(path), True
    if lower.endswith(".hdr"):
        return read_hdr(path), True
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        data = np.asarray(im, dtype=np.float32)
    return data, False


def load_exr(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    data = np.asarray(imageio.imread(path), dtype=np.float32)
    if data.ndim == 2:
        data = np.stack([data] * 3, axis=-1)
    # RGBA -> RGB, mirroring HDRImage's RGBA->RGB repack (src/HDRImage.h:58-66)
    return np.ascontiguousarray(data[..., :3])


def write_png(path: str, rgb_u8: np.ndarray) -> None:
    """Write (H,W,3) uint8 to PNG (reference: stbi_write_png, main.cpp:195)."""
    from PIL import Image

    Image.fromarray(np.asarray(rgb_u8, dtype=np.uint8), mode="RGB").save(path)


def write_hdr(path: str, rgb: np.ndarray) -> None:
    """Write (H,W,3) float32 as Radiance RGBE .hdr (flat, no RLE).

    Matches the container stb_image_write produces (main.cpp:191); readers
    accept both RLE and flat scanlines.
    """
    rgb = np.asarray(rgb, dtype=np.float32)
    h, w, _ = rgb.shape
    maxc = rgb.max(axis=-1)
    # frexp: maxc = m * 2^e with m in [0.5, 1)
    m, e = np.frexp(maxc)
    scale = np.where(maxc > 1e-32, m * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def read_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE reader (flat and adaptive-RLE scanlines)."""
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError("not a Radiance file")
        while True:
            line = f.readline().strip()
            if not line:
                break
        dims = f.readline().split()
        h, w = int(dims[1]), int(dims[3])
        data = f.read()

    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    pos = 0
    for y in range(h):
        if (
            len(data) - pos >= 4
            and data[pos] == 2
            and data[pos + 1] == 2
            and ((data[pos + 2] << 8) | data[pos + 3]) == w
        ):
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    cnt = data[pos]; pos += 1
                    if cnt > 128:  # run
                        rgbe[y, x : x + cnt - 128, c] = data[pos]
                        pos += 1
                        x += cnt - 128
                    else:  # literal
                        rgbe[y, x : x + cnt, c] = np.frombuffer(
                            data, np.uint8, cnt, pos
                        )
                        pos += cnt
                        x += cnt
        else:
            row = np.frombuffer(data, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4

    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]
