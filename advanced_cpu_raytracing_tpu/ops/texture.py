"""Texture sampling: image atlas (nearest/bilinear) and procedural Perlin.

Mirrors src/imageTexture.h and src/perlinTexture.{h,cpp}.  All samplers take
the packed atlas plus per-texture metadata and are batched over rays.
Conventions preserved:

  * ``GetRGBSample`` returns *raw* image units (0..255 for LDR); the /255
    normalization is the caller's job, exactly like the reference
    (raytracer.cpp:494 divides, PerPixel:54 does not).
  * nearest: i = int(u*w) clamped to w-1 (imageTexture.h:60-70).
  * bilinear: coordinates clipped to [0, w-1], four taps with the +1 taps
    clamped to the edge (the reference reads one texel out of bounds there;
    we clamp — visible only on the last row/column).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Image sampling
# --------------------------------------------------------------------------


def atlas_fetch(atlas, img_idx, i, j):
    """Integer texel fetch from the padded atlas: (R,) indices -> (R,3)."""
    return atlas[img_idx, j, i]


def sample_nearest(atlas, img_w, img_h, img_idx, u, v):
    w = img_w[img_idx]
    h = img_h[img_idx]
    i = jnp.minimum((u * w).astype(jnp.int32), w - 1)
    j = jnp.minimum((v * h).astype(jnp.int32), h - 1)
    i = jnp.maximum(i, 0)
    j = jnp.maximum(j, 0)
    return atlas_fetch(atlas, img_idx, i, j)


def sample_bilinear(atlas, img_w, img_h, img_idx, u, v):
    w = img_w[img_idx].astype(jnp.float32)
    h = img_h[img_idx].astype(jnp.float32)
    i = jnp.clip(u * w, 0.0, w - 1.0)
    j = jnp.clip(v * h, 0.0, h - 1.0)
    p = jnp.floor(i)
    q = jnp.floor(j)
    dx = (i - p)[..., None]
    dy = (j - q)[..., None]
    p = p.astype(jnp.int32)
    q = q.astype(jnp.int32)
    p1 = jnp.minimum(p + 1, img_w[img_idx] - 1)
    q1 = jnp.minimum(q + 1, img_h[img_idx] - 1)
    c00 = atlas_fetch(atlas, img_idx, p, q)
    c10 = atlas_fetch(atlas, img_idx, p1, q)
    c01 = atlas_fetch(atlas, img_idx, p, q1)
    c11 = atlas_fetch(atlas, img_idx, p1, q1)
    return (
        c00 * (1 - dx) * (1 - dy)
        + c10 * dx * (1 - dy)
        + c01 * (1 - dx) * dy
        + c11 * dx * dy
    )


def sample_image(atlas, img_w, img_h, img_idx, interp, u, v):
    """interp: (R,) 0=nearest 1=bilinear."""
    nearest = sample_nearest(atlas, img_w, img_h, img_idx, u, v)
    bilinear = sample_bilinear(atlas, img_w, img_h, img_idx, u, v)
    return jnp.where((interp == 0)[..., None], nearest, bilinear)


def tile_uv(x):
    """UV tiling: Mesh::GetFloorForTiledUV (src/mesh.cpp:382-389)."""
    frac = x - jnp.floor(x)
    frac = jnp.where(frac < 0.0001, 1.0, frac)
    return jnp.where(x > 1.0001, frac, x)


# --------------------------------------------------------------------------
# Perlin noise (classic, 12 gradients, quintic fade)
# --------------------------------------------------------------------------

# Permutation table duplicated to 512 entries (src/perlinTexture.cpp:5-33).
_PERM256 = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
    74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
    60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
    65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
    200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64,
    52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212,
    207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213,
    119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
    218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241,
    81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157,
    184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
], dtype=np.int32)
PERLIN_PERM = jnp.asarray(np.concatenate([_PERM256, _PERM256]))

PERLIN_GRADIENTS = jnp.asarray(np.array([
    [1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
    [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
    [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1],
], dtype=np.float32))


def _fade_weight(x):
    """The reference's f(): weight 1 at distance 0, 0 at distance >= 1
    (perlinTexture.h:147-155): 1 - (6|x|^5 - 15|x|^4 + 10|x|^3), 0 beyond 1."""
    x = jnp.abs(x)
    x2 = x * x
    x3 = x2 * x
    w = -6.0 * x3 * x2 + 15.0 * x3 * x - 10.0 * x3 + 1.0
    return jnp.where(x > 1.0, 0.0, w)


def perlin_raw(p):
    """Raw Perlin noise in [-1, 1] at world positions p (R,3)
    (PerlinTexture::GetSampleFromWorldPos, perlinTexture.h:76-133)."""
    xi = jnp.floor(p).astype(jnp.int32)
    d = p - xi
    cell = xi & 255

    perm = PERLIN_PERM
    grads = PERLIN_GRADIENTS

    def hash3(ox, oy, oz):
        return perm[cell[..., 0] + ox + perm[cell[..., 1] + oy + perm[cell[..., 2] + oz]]] % 12

    total = jnp.zeros(p.shape[:-1], jnp.float32)
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                g = grads[hash3(ox, oy, oz)]
                dd = d - jnp.array([ox, oy, oz], jnp.float32)
                c = jnp.sum(g * dd, axis=-1)
                w = (
                    _fade_weight(d[..., 0] - ox)
                    * _fade_weight(d[..., 1] - oy)
                    * _fade_weight(d[..., 2] - oz)
                )
                total = total + w * c
    return total


def perlin_sample(p, noise_scale, conversion):
    """Scaled + converted Perlin sample.

    conversion: (R,) int — 0 linear ((n+1)/2), 1 absval (perlinTexture.h:127-132).
    """
    n = perlin_raw(p * noise_scale[..., None])
    return jnp.where(conversion == 0, (n + 1.0) * 0.5, jnp.abs(n))
