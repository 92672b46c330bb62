"""Reinhard photographic tonemapping (Tonemapper, src/tonemapper.h:28-121).

Two passes expressed as jit-friendly reductions:
  1. statistics — log-average luminance (delta = 0.01, Rec.709 weights) and
     the burn percentile taken over the *sorted flat channel values* (the
     reference sorts all W*H*3 channel samples, tonemapper.h:33-52);
  2. per-pixel mapping — Reinhard with optional L_white burnout, saturation
     exponent on channel ratios, inverse-gamma encode, floor to 8-bit.

A sharded variant (parallel/shard_render.py) computes the log-mean with psum
and the percentile on gathered per-shard histograms.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.utils.math3d import luminance


@partial(jax.jit, static_argnames=("key_value", "burn_percent", "saturation",
                                   "gamma"))
def reinhard_tonemap_device(hdr, key_value: float = 0.18,
                            burn_percent: float = 1.0,
                            saturation: float = 1.0, gamma: float = 2.2):
    """hdr: (H,W,3) float -> (H,W,3) uint8."""
    delta = 0.01
    lum = luminance(hdr)
    avg_lum = jnp.exp(jnp.mean(jnp.log(delta + lum.astype(jnp.float64))))
    avg_lum = avg_lum.astype(jnp.float32)

    l_scaled = key_value * lum / avg_lum

    if burn_percent > 0.01:
        flat = jnp.sort(hdr.reshape(-1))
        last = flat.shape[0] - 1
        idx = min(int((100.0 - burn_percent) / 100.0 * last), last)
        thresh = flat[idx] * key_value / avg_lum
        lw2 = thresh * thresh
        y_o = (l_scaled * (1.0 + l_scaled / lw2)) / (1.0 + l_scaled)
    else:
        y_o = l_scaled / (1.0 + l_scaled)

    lum_safe = jnp.where(lum == 0, 1e-20, lum)
    ratios = hdr / lum_safe[..., None]
    rgb = jnp.clip(y_o[..., None] * jnp.power(jnp.maximum(ratios, 0.0),
                                              saturation), 0.0, 1.0)
    enc = jnp.floor(jnp.minimum(255.0, 255.0 * jnp.power(rgb, 1.0 / gamma)))
    return enc.astype(jnp.uint8)


def reinhard_tonemap(hdr: np.ndarray, key_value: float = 0.18,
                     burn_percent: float = 1.0, saturation: float = 1.0,
                     gamma: float = 2.2) -> np.ndarray:
    return np.asarray(
        reinhard_tonemap_device(
            jnp.asarray(np.nan_to_num(hdr, nan=0.0)), key_value=key_value,
            burn_percent=burn_percent, saturation=saturation, gamma=gamma,
        )
    )
