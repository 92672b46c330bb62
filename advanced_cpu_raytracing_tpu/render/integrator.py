"""Wavefront integrator: the reference's recursive shading tree re-expressed
as a per-lane ray *stack* iterated by one ``lax.while_loop``.

The reference recurses (PerformShading, src/raytracer.cpp:65-134): mirrors and
conductors spawn one child ray, dielectrics split into two
(raytracer.cpp:261-415), path tracing adds a sampled GI child
(raytracer.cpp:135-191).  On TPU, recursion becomes: every lane owns a small
LIFO stack of pending rays {origin, dir, weight, absorption, medium, depth,
env-on-miss}; each loop iteration pops one entry per lane, traces the whole
batch, accumulates ``weight x local_radiance`` and pushes children.  This
reproduces the recursive tree's arithmetic exactly — a node's contribution is
its local radiance times the product of branch weights (mirror color, Fresnel
ratios, Beer attenuation) along the path from the root, and those products are
tracked in the stacked weight.

Beer's law (raytracer.cpp:416-423) is folded in at pop time: a child carries
the absorption coefficient chosen at push (zero unless its medium check
passed, mirroring the per-branch thresholds at raytracer.cpp:306/345/398) and
the popped hit applies ``exp(-c * t)``.

Russian roulette follows the reference's *intent* (survive with probability
max-throughput once depth exhausted, then divide — raytracer.cpp:137-147) but
tracks real path throughput; the reference's own throughput plumbing never
accumulates before the RR test (Shade mutates it only after the recursive
call), which would recurse forever — we also apply a hard depth floor.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.ops.traverse import Hit, KIND_TRI, closest_hit
from advanced_cpu_raytracing_tpu.render import camera as cam_mod
from advanced_cpu_raytracing_tpu.render.lights import (
    direct_lighting,
    env_sample_radiance,
)
from advanced_cpu_raytracing_tpu.render.shading import (
    _sample_tex_rgb,
    shade_weight,
    surface_at,
)
from advanced_cpu_raytracing_tpu.scene.pack import SLOT_REPLACE_ALL, ScenePack
from advanced_cpu_raytracing_tpu.scene.types import MaterialType
from advanced_cpu_raytracing_tpu.utils.math3d import (
    dot,
    normalize,
    orthonormal_basis,
)

PI = jnp.float32(jnp.pi)
RR_DEPTH_FLOOR = 8  # extra bounces allowed past depth 0 under Russian roulette


@dataclass(frozen=True)
class RenderOptions:
    """Static (compile-time) renderer switches — RendererParams
    (src/rendererParams.h:6-26) plus engine knobs."""

    path_tracing: bool = False
    importance_sampling: bool = False
    next_event_estimation: bool = False
    russian_roulette: bool = False
    max_depth: int = 0
    max_iters: int = 0  # 0 -> auto
    # Reverse-mode AD cannot cross lax.while_loop; the differentiable path
    # runs a fixed-trip-count fori_loop instead (fully masked body, so the
    # result is identical — only early exit is lost).
    differentiable: bool = False

    def auto_iters(self) -> int:
        if self.max_iters:
            return self.max_iters
        d = self.max_depth + (RR_DEPTH_FLOOR if self.russian_roulette else 0)
        # a full dielectric binary tree has 2^(d+1)-1 nodes; PT adds the GI
        # chain; cap generously but finitely
        return min(2 ** (min(d, 9) + 1) + 64, 2048)


class _Stack(NamedTuple):
    o: jnp.ndarray  # (R,K,3)
    d: jnp.ndarray  # (R,K,3)
    w: jnp.ndarray  # (R,K,3)
    absorb: jnp.ndarray  # (R,K,3)
    medium: jnp.ndarray  # (R,K)
    depth: jnp.ndarray  # (R,K)
    envmiss: jnp.ndarray  # (R,K) bool
    sp: jnp.ndarray  # (R,)


def _make_stack(r: int, k: int) -> _Stack:
    # directions initialized to +z so that popped *empty* entries (masked
    # lanes in the loop) never trace degenerate d = 0 rays — their NaNs
    # would leak through jnp.where in reverse-mode AD
    d0 = jnp.zeros((r, k, 3)).at[:, :, 2].set(1.0)
    return _Stack(
        o=jnp.zeros((r, k, 3)), d=d0,
        w=jnp.zeros((r, k, 3)), absorb=jnp.zeros((r, k, 3)),
        medium=jnp.ones((r, k)), depth=jnp.zeros((r, k), jnp.int32),
        envmiss=jnp.zeros((r, k), bool), sp=jnp.zeros(r, jnp.int32),
    )


def _push(stack: _Stack, mask, o, d, w, absorb, medium, depth, envmiss) -> _Stack:
    r = mask.shape[0]
    lanes = jnp.arange(r)
    sp = stack.sp
    sel = lambda new, old: jnp.where(mask[:, None] if new.ndim == 2 else mask, new, old)

    def set2(arr, val):
        cur = arr[lanes, sp]
        return arr.at[lanes, sp].set(jnp.where(mask[..., None] if val.ndim == 2 else mask, val, cur))

    return _Stack(
        o=set2(stack.o, o), d=set2(stack.d, d), w=set2(stack.w, w),
        absorb=set2(stack.absorb, absorb),
        medium=set2(stack.medium, medium),
        depth=set2(stack.depth, depth),
        envmiss=set2(stack.envmiss, envmiss),
        sp=sp + mask.astype(jnp.int32),
    )


def _pop(stack: _Stack):
    r = stack.sp.shape[0]
    lanes = jnp.arange(r)
    active = stack.sp > 0
    idx = jnp.maximum(stack.sp - 1, 0)
    entry = (
        stack.o[lanes, idx], stack.d[lanes, idx], stack.w[lanes, idx],
        stack.absorb[lanes, idx], stack.medium[lanes, idx],
        stack.depth[lanes, idx], stack.envmiss[lanes, idx],
    )
    new_stack = stack._replace(sp=jnp.where(active, stack.sp - 1, stack.sp))
    return new_stack, active, entry


def _reflect_rough(n, w_o, rough, key):
    """Reflect with optional roughness perturbation
    (Raytracer::Reflect, src/raytracer.cpp:424-440)."""
    r = normalize(n * (2.0 * dot(n, w_o))[:, None] - w_o)
    u, v = orthonormal_basis(r)
    psi = jax.random.uniform(key, r.shape[:1] + (2,)) - 0.5
    perturbed = normalize(r + (u * psi[:, 0:1] + v * psi[:, 1:2]) * rough[:, None])
    return jnp.where((rough > 0.001)[:, None], perturbed, r)


def _perturb_dir(d, rough, key):
    """Roughness perturbation of an arbitrary direction (refraction case,
    raytracer.cpp:366-376)."""
    u, v = orthonormal_basis(d)
    psi = jax.random.uniform(key, d.shape[:1] + (2,)) - 0.5
    perturbed = normalize(d + (u * psi[:, 0:1] + v * psi[:, 1:2]) * rough[:, None])
    return jnp.where((rough > 0.001)[:, None], perturbed, normalize(d))


def _process_hit(pack: ScenePack, opts: RenderOptions, o, d, w_in, absorb,
                 medium, depth, time, key, hit: Hit, L, stack: _Stack):
    """Shade one popped batch of rays and push children.

    Mirrors PerformShading (src/raytracer.cpp:65-134) with the branch weights
    applied at push time.  Returns (L, stack).
    """
    st = pack.static
    r = o.shape[0]
    valid = hit.valid
    t_safe = jnp.where(valid, hit.t, 0.0)
    atten = jnp.exp(-absorb * t_safe[:, None])
    w = w_in * atten

    surf = surface_at(pack, o, d, time, hit)
    w_o = -d
    m = surf.mat
    mtype = pack.mat_type[m]
    eps = pack.shadow_eps
    n = surf.normal
    p = surf.point
    rough = pack.mat_roughness[m]

    active = valid

    # emissive: radiance * 2pi, nothing else (raytracer.cpp:81-84)
    is_emissive = mtype == int(MaterialType.EMISSIVE)
    L = L + jnp.where((active & is_emissive)[:, None],
                      w * pack.mat_radiance[m] * (2.0 * PI), 0.0)
    active = active & ~is_emissive

    # replace_all texture short-circuits shading (raytracer.cpp:87-89)
    if st.n_textures > 0:
        ra_slot = surf.tex[:, SLOT_REPLACE_ALL]
        has_ra = ra_slot >= 0
        ra_col = _sample_tex_rgb(pack, ra_slot, surf.uv)
        L = L + jnp.where((active & has_ra)[:, None], w * ra_col, 0.0)
        active = active & ~has_ra

    inside = medium > 1.00001  # travellingInsideAnObject (raytracer.cpp:77-78)

    key, k_gi, k_rr, k_dl, k_m, k_c, k_t, k_rl, k_rf = jax.random.split(key, 9)

    # ---- path tracing: sampled GI bounce (raytracer.cpp:135-191) ----
    skip_ml = jnp.full(r, -1, jnp.int32)
    if opts.path_tracing:
        if opts.russian_roulette:
            max_thr = jnp.max(w, axis=-1)
            prob = jnp.clip(max_thr, 1e-4, 1.0)
            kill = (jax.random.uniform(k_rr, (r,)) > prob) & (depth <= 0)
            gi_alive = active & ~kill & (depth > -RR_DEPTH_FLOOR)
            rr_scale = jnp.where(depth <= 0, 1.0 / prob, 1.0)
        else:
            gi_alive = active & (depth > 0)
            rr_scale = jnp.ones(r)

        r12 = jax.random.uniform(k_gi, (r, 2))
        phi = 2.0 * PI * r12[:, 0]
        theta = jnp.where(
            opts.importance_sampling,
            jnp.arcsin(jnp.sqrt(r12[:, 1])),
            jnp.arccos(r12[:, 1]),
        )
        u_b, v_b = orthonormal_basis(n)
        gi_dir = normalize(
            u_b * (jnp.sin(theta) * jnp.cos(phi))[:, None]
            + n * jnp.cos(theta)[:, None]
            + v_b * (jnp.sin(theta) * jnp.sin(phi))[:, None]
        )
        gi_o = p + n * 1e-4  # hardcoded GI epsilon (raytracer.cpp:174)
        gi_hit = closest_hit(pack, gi_o, gi_dir, time)
        # NEE double-count suppression: if the GI ray hits an emissive mesh
        # light, the parent's direct sampling skips that light
        # (raytracer.cpp:180-188, 778-781)
        if st.n_mesh_lights > 0:
            gi_ent = jnp.clip(gi_hit.index, 0, max(st.n_entities - 1, 0))
            gi_em = gi_hit.valid & (gi_hit.kind == KIND_TRI) & pack.ent_emissive[gi_ent]
            skip_ml = jnp.where(gi_alive & gi_em, pack.ent_mlight[gi_ent], -1)

        gi_w = w * shade_weight(pack, surf, gi_dir, w_o) * (2.0 * PI) \
            * rr_scale[:, None]
        stack = _push(
            stack, gi_alive & gi_hit.valid, gi_o, gi_dir, gi_w,
            jnp.zeros((r, 3)), medium, depth - 1, jnp.zeros(r, bool),
        )

    # ---- ambient + direct lighting (raytracer.cpp:98-108) ----
    sample_direct = (not opts.path_tracing) or opts.next_event_estimation
    if sample_direct:
        lit = active & ~inside
        amb = pack.ambient_light * pack.mat_ambient[m]
        contrib = amb
        n_lights = (st.n_point + st.n_area + st.n_env + st.n_directional
                    + st.n_spot + st.n_mesh_lights)
        if n_lights > 0:
            contrib = contrib + direct_lighting(pack, surf, w_o, time, k_dl,
                                                skip_ml)
        L = L + jnp.where(lit[:, None], w * contrib, 0.0)

    can_recurse = depth > 0

    # ---- mirror (raytracer.cpp:442-472) ----
    is_mirror = mtype == int(MaterialType.MIRROR)
    if True:
        w_r = _reflect_rough(n, w_o, rough, k_m)
        stack = _push(
            stack, active & is_mirror & can_recurse,
            p + n * eps, w_r, w * pack.mat_mirror[m],
            jnp.zeros((r, 3)), jnp.ones(r), depth - 1,
            jnp.full(r, st.has_env),  # mirror miss samples env (461-469)
        )

    # ---- conductor (raytracer.cpp:208-254) ----
    is_cond = mtype == int(MaterialType.CONDUCTOR)
    cos_t = dot(w_o, n)
    n2 = pack.mat_ior[m]
    k2 = pack.mat_cond_k[m]
    n2k2 = n2 * n2 + k2 * k2
    two_n2cos = 2.0 * n2 * cos_t
    cos2 = cos_t * cos_t
    rs = (n2k2 - two_n2cos + cos2) / jnp.maximum(n2k2 + two_n2cos + cos2, 1e-20)
    rp = (n2k2 * cos2 - two_n2cos + 1.0) / jnp.maximum(n2k2 * cos2 + two_n2cos + 1.0, 1e-20)
    ratio = 0.5 * (rs + rp)
    w_rc = _reflect_rough(n, w_o, rough, k_c)
    stack = _push(
        stack, active & is_cond & can_recurse & (ratio > 1e-4),
        p + n * eps, w_rc, w * pack.mat_mirror[m] * ratio[:, None],
        jnp.zeros((r, 3)), jnp.ones(r), depth - 1,
        jnp.zeros(r, bool),  # conductor miss contributes 0 (242-247)
    )

    # ---- dielectric (raytracer.cpp:261-415) ----
    is_diel = mtype == int(MaterialType.DIELECTRIC)
    cos0 = -dot(d, n)
    entering = cos0 > 0.0
    n_mod = jnp.where(entering[:, None], n, -n)
    cos_i = jnp.abs(cos0)
    n1 = jnp.where(entering, medium, pack.mat_ior[m])
    n2d = jnp.where(entering, pack.mat_ior[m], 1.0)
    obj_n = jnp.where(entering, pack.mat_ior[m], 1.0)
    ratio_n = n1 / jnp.maximum(n2d, 1e-20)
    sin2 = 1.0 - cos_i * cos_i
    crit = ratio_n * ratio_n * sin2
    tir = crit > 1.0
    mat_abs = pack.mat_absorption[m]

    # TIR: reflect only, weight 1, medium unchanged (292-311)
    w_rt = _reflect_rough(n_mod, w_o, rough, k_t)
    absorb_tir = jnp.where((medium > 1.0001)[:, None], mat_abs, 0.0)
    stack = _push(
        stack, active & is_diel & tir & can_recurse,
        p + n_mod * eps, w_rt, w,
        absorb_tir, medium, depth - 1, jnp.zeros(r, bool),
    )

    # partial reflect + refract (313-411)
    cos_p = jnp.sqrt(jnp.maximum(1.0 - crit, 0.0))
    n2cos = n2d * cos_i
    n1cosp = n1 * cos_p
    rpar = (n2cos - n1cosp) / jnp.maximum(n2cos + n1cosp, 1e-20)
    rperp = (n1 * cos_i - n2d * cos_p) / jnp.maximum(n1 * cos_i + n2d * cos_p, 1e-20)
    r_refl = 0.5 * (rpar * rpar + rperp * rperp)
    r_refr = 1.0 - r_refl
    child_medium = obj_n  # both children (331-338, 381-388)

    w_rl = _reflect_rough(n_mod, w_o, rough, k_rl)
    absorb_rl = jnp.where((child_medium > 1.00001)[:, None], mat_abs, 0.0)
    stack = _push(
        stack, active & is_diel & ~tir & can_recurse,
        p + n_mod * eps, w_rl, w * r_refl[:, None],
        absorb_rl, child_medium, depth - 1, jnp.full(r, st.has_env),
    )

    refr_dir = (d + n_mod * cos_i[:, None]) * ratio_n[:, None] - n_mod * cos_p[:, None]
    refr_dir = _perturb_dir(refr_dir, rough, k_rf)
    absorb_rf = jnp.where((child_medium > 1.001)[:, None], mat_abs, 0.0)
    stack = _push(
        stack, active & is_diel & ~tir & can_recurse,
        p - n_mod * eps, refr_dir, w * r_refr[:, None],
        absorb_rf, child_medium, depth - 1, jnp.full(r, st.has_env),
    )

    return L, stack


def trace_radiance(pack: ScenePack, cam, px, py, key, opts: RenderOptions):
    """Full radiance for a batch of (fractional) pixel coordinates.

    Replicates PerPixel (src/raytracer.cpp:38-63): primary ray (with DoF and
    motion-blur time), background resolution order on miss (bg texture ->
    env light -> flat color), then the shading tree via the stack loop.
    """
    st = pack.static
    r = px.shape[0]
    key, k_time, k_lens, k_first, k_loop = jax.random.split(key, 5)

    time = jax.random.uniform(k_time, (r,)) if st.has_motion else jnp.zeros(r)
    lens = jax.random.uniform(k_lens, (r, 2), minval=-1.0, maxval=1.0)
    o, d = cam_mod.generate_rays(cam, px, py, lens, dof=cam.use_dof)

    hit = closest_hit(pack, o, d, time)

    # primary miss color (raytracer.cpp:49-62)
    if st.bg_tex >= 0:
        u = px / cam.width
        v = py / cam.height
        ti = jnp.full(r, st.bg_tex, jnp.int32)
        miss_col = _sample_tex_rgb(
            pack, ti, jnp.stack([u, v], axis=-1)
        )
    elif st.has_env:
        miss_col = env_sample_radiance(pack, d)
    else:
        miss_col = jnp.broadcast_to(pack.bg_color, (r, 3))
    L = jnp.where(hit.valid[:, None], 0.0, miss_col)

    k_stack = 2 * (opts.max_depth + (RR_DEPTH_FLOOR if opts.russian_roulette
                                     else 0)) + 4
    stack = _make_stack(r, k_stack)

    L, stack = _process_hit(
        pack, opts, o, d, jnp.ones((r, 3)), jnp.zeros((r, 3)), jnp.ones(r),
        jnp.full(r, opts.max_depth, jnp.int32), time, k_first, hit, L, stack,
    )

    max_iters = opts.auto_iters()

    def cond(state):
        it, _, _, stack = state
        return (it < max_iters) & jnp.any(stack.sp > 0)

    def body(state):
        it, key, L, stack = state
        key, k_it = jax.random.split(key)
        stack, active, (eo, ed, ew, eabs, emed, edep, eenv) = _pop(stack)
        hit = closest_hit(pack, eo, ed, time)
        hit = hit._replace(valid=hit.valid & active)
        # secondary miss: env contribution only where the branch samples it
        if st.has_env:
            env_c = env_sample_radiance(pack, ed)
            L = L + jnp.where((active & eenv & ~hit.valid)[:, None],
                              ew * env_c, 0.0)
        L, stack = _process_hit(
            pack, opts, eo, ed, ew, eabs, emed, edep, time, k_it, hit, L, stack,
        )
        return it + 1, key, L, stack

    init = (jnp.int32(0), k_loop, L, stack)
    if opts.differentiable:
        _, _, L, _ = jax.lax.fori_loop(0, max_iters, lambda i, s: body(s), init)
    else:
        _, _, L, _ = jax.lax.while_loop(cond, body, init)
    return L
