"""BRDF evaluation — the five pluggable models plus the default split
diffuse/specular shading, fully vectorized with masked dispatch.

Reference: src/brdf*.cpp.  The reference converts dots to degrees and back
(angleBetweenUnitVectors / cosDeg, src/helperMath.cpp:154-160); we operate on
the clamped cosines directly, which is the same function.  ``pow`` bases are
clamped to >= 0 (the reference can feed negative cosines into std::pow and NaN
— its raytracer.cpp:128-131 merely prints a warning; we keep the math finite).
"""

from __future__ import annotations

import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.scene.types import BrdfType
from advanced_cpu_raytracing_tpu.utils.math3d import dot, length, normalize

PI = jnp.float32(jnp.pi)


def _clamp_cos(x):
    return jnp.clip(x, -1.0, 1.0)


def _powmax(base, e):
    # pow with base clamped to >= 0 and an AD-safe zero branch: grad of
    # pow(0, e) is inf for e < 1 and pow(0, 0) = 1 like C's pow
    pos = base > 0.0
    safe = jnp.where(pos, base, 1.0)
    zero_val = jnp.where(e == 0.0, 1.0, 0.0)
    return jnp.where(pos, jnp.power(safe, e), zero_val)


def eval_brdf(kind, exponent, normalized, kdfresnel, mat_ior,
              kd, ks, w_i, w_o, n):
    """Evaluate the BRDF table entry per lane.

    Args are per-ray arrays: kind (R,) int, exponent (R,), normalized (R,)
    bool, kdfresnel (R,) bool, mat_ior (R,); kd/ks (R,3); w_i/w_o/n (R,3).
    Returns (R,3) brdf value as in BRDF::apply.
    """
    cos_i = _clamp_cos(dot(w_i, n))  # cosDeg(angleTheta_i)
    front = cos_i > 0.0  # angleTheta_i < 90 deg

    half = normalize(w_i + w_o, eps=1e-20)
    cos_h = _clamp_cos(dot(half, n))
    refl = normalize(n * (2.0 * dot(n, w_i))[..., None] - w_i)
    cos_r = _clamp_cos(dot(refl, w_o))

    e = exponent[..., None]
    cos_i_c = jnp.maximum(cos_i, 1e-20)[..., None]

    # Phong (brdfPhong.cpp:11-21): kd + ks cos^e(aR)/cos(ti)
    phong = kd + ks * (_powmax(cos_r, exponent)[..., None] / cos_i_c)

    # ModifiedPhong (brdfModifiedPhong.cpp:14-33)
    mp_norm = kd / PI + ks * (
        ((exponent + 2.0) / (2.0 * PI) * _powmax(cos_r, exponent))[..., None]
    )
    mp_plain = kd + ks * _powmax(cos_r, exponent)[..., None]
    modified_phong = jnp.where(normalized[..., None], mp_norm, mp_plain)

    # BlinnPhong (brdfBlinnPhong.cpp:11-21)
    blinn = kd + ks * (_powmax(cos_h, exponent)[..., None] / cos_i_c)

    # ModifiedBlinnPhong (brdfModifiedBlinnPhong.cpp:11-30)
    mbp_norm = kd / PI + ks * (
        ((exponent + 8.0) / (8.0 * PI) * _powmax(cos_h, exponent))[..., None]
    )
    mbp_plain = kd + ks * _powmax(cos_h, exponent)[..., None]
    modified_blinn = jnp.where(normalized[..., None], mbp_norm, mbp_plain)

    # TorranceSparrow (brdfTorranceSparrow.cpp:15-66)
    d_term = (exponent + 2.0) / (2.0 * PI) * _powmax(dot(half, n), exponent)
    r0 = jnp.square(mat_ior - 1.0) / jnp.maximum(jnp.square(mat_ior + 1.0), 1e-20)
    f_term = r0 + (1.0 - r0) * jnp.power(
        jnp.maximum(1.0 - dot(half, w_o), 0.0), 5.0
    )
    ndoth = dot(n, half)
    ndotwo = dot(n, w_o)
    ndotwi = dot(n, w_i)
    wodoth = jnp.where(dot(w_o, half) == 0, 1e-20, dot(w_o, half))
    g_term = jnp.minimum(
        1.0,
        jnp.minimum(2.0 * ndoth * ndotwo / wodoth, 2.0 * ndoth * ndotwi / wodoth),
    )
    kd_coeff = jnp.where(kdfresnel, (1.0 - f_term) / PI, 1.0 / PI)
    denom = 4.0 * jnp.where(ndotwi * ndotwo == 0, 1e-20, ndotwi * ndotwo)
    torrance = kd * kd_coeff[..., None] + ks * (
        (d_term * f_term * g_term / denom)[..., None]
    )

    out = jnp.where(
        (kind == BrdfType.PHONG)[..., None], phong,
        jnp.where(
            (kind == BrdfType.MODIFIED_PHONG)[..., None], modified_phong,
            jnp.where(
                (kind == BrdfType.BLINN_PHONG)[..., None], blinn,
                jnp.where(
                    (kind == BrdfType.MODIFIED_BLINN_PHONG)[..., None],
                    modified_blinn,
                    torrance,
                ),
            ),
        ),
    )
    return jnp.where(front[..., None], out, 0.0)


def default_diffuse(kd, w_i, n, irradiance):
    """kd * E * max(0, w_i.n) (Raytracer::GetDiffuse, src/raytracer.cpp:540-545)."""
    cos_t = jnp.maximum(0.0, dot(w_i, n))
    return kd * irradiance * cos_t[..., None]


def default_specular(ks, phong_exponent, w_i, w_o, n, irradiance):
    """Blinn-Phong lobe (Raytracer::GetSpecular, src/raytracer.cpp:547-554)."""
    half = normalize(w_i + w_o, eps=1e-20)
    cos_a = jnp.maximum(0.0, dot(n, half))
    return ks * irradiance * _powmax(cos_a, phong_exponent)[..., None]
