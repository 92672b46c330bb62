import numpy as np
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.ops import brdf as B
from advanced_cpu_raytracing_tpu.scene.types import BrdfType


def _setup(n=1):
    w_i = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    w_o = jnp.tile(jnp.asarray([[0.6, 0.8, 0.0]]), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    kd = jnp.full((n, 3), 0.5)
    ks = jnp.full((n, 3), 0.3)
    return w_i, w_o, nrm, kd, ks


def _eval(kind, exponent=10.0, normalized=False, kdfresnel=False, ior=1.5):
    w_i, w_o, nrm, kd, ks = _setup()
    return np.asarray(B.eval_brdf(
        jnp.array([int(kind)]), jnp.array([exponent]),
        jnp.array([normalized]), jnp.array([kdfresnel]), jnp.array([ior]),
        kd, ks, w_i, w_o, nrm,
    ))[0]


def test_phong_normal_incidence():
    # w_i == n: cos_i = 1; refl(w_i)=w_i -> cos_r = dot(w_i, w_o) = 0.8
    out = _eval(BrdfType.PHONG, exponent=2.0)
    expected = 0.5 + 0.3 * (0.8 ** 2.0)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_modified_phong_normalized():
    out = _eval(BrdfType.MODIFIED_PHONG, exponent=2.0, normalized=True)
    expected = 0.5 / np.pi + 0.3 * (4.0 / (2 * np.pi)) * (0.8 ** 2.0)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_blinn_phong_half_vector():
    w_i, w_o, nrm, kd, ks = _setup()
    half = np.array(w_i[0] + w_o[0])
    half /= np.linalg.norm(half)
    cos_h = half[1]
    out = _eval(BrdfType.BLINN_PHONG, exponent=5.0)
    expected = 0.5 + 0.3 * (cos_h ** 5.0)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_modified_blinn_phong_normalized_energy_factor():
    w_i, w_o, nrm, kd, ks = _setup()
    half = np.array(w_i[0] + w_o[0])
    half /= np.linalg.norm(half)
    out = _eval(BrdfType.MODIFIED_BLINN_PHONG, exponent=8.0, normalized=True)
    expected = 0.5 / np.pi + 0.3 * (16.0 / (8 * np.pi)) * (half[1] ** 8.0)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_torrance_sparrow_components():
    # verify against a direct transcription of brdfTorranceSparrow.cpp:15-66
    w_i, w_o, nrm, kd, ks = _setup()
    e, ior = 10.0, 1.5
    half = np.asarray(w_i[0] + w_o[0], dtype=np.float64)
    half /= np.linalg.norm(half)
    n = np.array([0, 1, 0.0])
    d = (e + 2) / (2 * np.pi) * (half @ n) ** e
    r0 = ((ior - 1) / (ior + 1)) ** 2
    f = r0 + (1 - r0) * (1 - half @ np.asarray(w_o[0], np.float64)) ** 5
    ndoth = n @ half
    ndotwo = n @ np.asarray(w_o[0], np.float64)
    ndotwi = 1.0
    wodoth = np.asarray(w_o[0], np.float64) @ half
    g = min(1.0, min(2 * ndoth * ndotwo / wodoth, 2 * ndoth * ndotwi / wodoth))
    expected = 0.5 / np.pi + 0.3 * d * f * g / (4 * ndotwi * ndotwo)
    out = _eval(BrdfType.TORRANCE_SPARROW, exponent=e, ior=ior)
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_backface_zero():
    w_i, w_o, nrm, kd, ks = _setup()
    out = B.eval_brdf(
        jnp.array([int(BrdfType.PHONG)]), jnp.array([2.0]),
        jnp.array([False]), jnp.array([False]), jnp.array([1.5]),
        kd, ks, -w_i, w_o, nrm,
    )
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_default_diffuse_specular():
    w_i, w_o, nrm, kd, ks = _setup()
    irr = jnp.full((1, 3), 2.0)
    dif = np.asarray(B.default_diffuse(kd, w_i, nrm, irr))[0]
    np.testing.assert_allclose(dif, 0.5 * 2.0 * 1.0, rtol=1e-6)
    spec = np.asarray(B.default_specular(ks, jnp.array([4.0]), w_i, w_o, nrm, irr))[0]
    half = np.array(w_i[0] + w_o[0])
    half /= np.linalg.norm(half)
    np.testing.assert_allclose(spec, 0.3 * 2.0 * half[1] ** 4.0, rtol=1e-5)
