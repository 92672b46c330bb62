"""Differentiable parameter pytrees over a ScenePack.

The renderer is pure jnp, so gradients flow end-to-end through intersection
(t, barycentrics), shading, lights and textures.  Discrete *topology*
(BVH structure, argmin hit selection, texture integer taps) contributes no
gradient — the standard stop-gradient-on-topology stance: gradients are exact
for shading/light/texture-value parameters and first-order for geometry while
the visibility function is locally constant.

``extract_params`` pulls the optimizable leaves; ``inject_params`` writes a
(possibly updated) pytree back into a pack.
"""

from __future__ import annotations

import dataclasses

# Leaves exposed to optimization, in stable order.
PARAM_FIELDS = (
    "mat_ambient", "mat_diffuse", "mat_specular", "mat_mirror",
    "mat_phong", "mat_roughness", "mat_radiance",
    "pl_intensity", "dl_radiance", "sl_intensity", "al_radiance",
    "ml_radiance", "verts", "img_atlas", "bg_color",
)


def extract_params(pack, fields=PARAM_FIELDS) -> dict:
    return {f: getattr(pack, f) for f in fields}


def inject_params(pack, params: dict):
    return dataclasses.replace(pack, **params)
