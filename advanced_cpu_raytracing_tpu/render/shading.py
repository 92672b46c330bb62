"""Surface reconstruction and local shading (batched, masked).

Derives the reference's per-hit state (HitInfo, src/ray.hpp:10-20) from the
compact Hit record, including texture-modulated reflectances, normal/bump
mapping, and the Shade() dispatch between the default Blinn-Phong split and
pluggable BRDFs (Raytracer::Shade, src/raytracer.cpp:192-206).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.ops import texture as tex_ops
from advanced_cpu_raytracing_tpu.ops.brdf import (
    default_diffuse,
    default_specular,
    eval_brdf,
)
from advanced_cpu_raytracing_tpu.ops.intersect import transform_ray, transform_vector
from advanced_cpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI, Hit
from advanced_cpu_raytracing_tpu.scene.pack import (
    SLOT_BUMP,
    SLOT_DIFFUSE,
    SLOT_NORMAL,
    SLOT_REPLACE_ALL,
    SLOT_SPECULAR,
    ScenePack,
)
from advanced_cpu_raytracing_tpu.scene.types import DecalMode
from advanced_cpu_raytracing_tpu.utils.math3d import cross, dot, normalize

PI = jnp.float32(jnp.pi)


class MaterialRows(NamedTuple):
    """Per-lane material fields from one fused table gather."""

    type: jnp.ndarray  # (R,)
    ambient: jnp.ndarray  # (R,3)
    diffuse: jnp.ndarray
    specular: jnp.ndarray
    mirror: jnp.ndarray
    absorption: jnp.ndarray
    radiance: jnp.ndarray
    phong: jnp.ndarray  # (R,)
    ior: jnp.ndarray
    cond_k: jnp.ndarray
    rough: jnp.ndarray
    brdf: jnp.ndarray  # (R,) int


def gather_materials(pack: "ScenePack", m) -> MaterialRows:
    """One (M, 22) concat + one gather instead of 12 separate per-lane
    gathers (gathers are serial-ish on TPU; the concat is tiny)."""
    matf = jnp.concatenate([
        pack.mat_ambient, pack.mat_diffuse, pack.mat_specular,
        pack.mat_mirror, pack.mat_absorption, pack.mat_radiance,
        pack.mat_phong[:, None], pack.mat_ior[:, None],
        pack.mat_cond_k[:, None], pack.mat_roughness[:, None],
        pack.mat_type.astype(jnp.float32)[:, None],
        pack.mat_brdf.astype(jnp.float32)[:, None],
    ], axis=1)
    row = matf[m]  # (R, 24)
    return MaterialRows(
        type=row[:, 22].astype(jnp.int32),
        ambient=row[:, 0:3], diffuse=row[:, 3:6], specular=row[:, 6:9],
        mirror=row[:, 9:12], absorption=row[:, 12:15], radiance=row[:, 15:18],
        phong=row[:, 18], ior=row[:, 19], cond_k=row[:, 20], rough=row[:, 21],
        brdf=row[:, 23].astype(jnp.int32),
    )


class Surface(NamedTuple):
    point: jnp.ndarray  # (R,3) world hit point
    normal: jnp.ndarray  # (R,3) world shading normal (after maps)
    uv: jnp.ndarray  # (R,2)
    mat: jnp.ndarray  # (R,) dense material index
    tex: jnp.ndarray  # (R,5) texture slots of the hit shape
    mlight: jnp.ndarray  # (R,) mesh-light index of hit entity or -1
    valid: jnp.ndarray  # (R,)


def _gather_tri_uv(pack: ScenePack, face, beta, gamma):
    uvi = pack.tri_uvidx[face]  # (R,3)
    has = uvi[:, 0] >= 0
    uvi = jnp.maximum(uvi, 0)
    uv0 = pack.uvs[uvi[:, 0]]
    uv1 = pack.uvs[uvi[:, 1]]
    uv2 = pack.uvs[uvi[:, 2]]
    uv = uv0 + beta[:, None] * (uv1 - uv0) + gamma[:, None] * (uv2 - uv0)
    uv = tex_ops.tile_uv(uv)  # (mesh.cpp:256-258)
    return jnp.where(has[:, None], uv, 0.0), has, (uv0, uv1, uv2)


def _tri_tangents(pack: ScenePack, face, uv012):
    """Tangent/bitangent from UV edges (Mesh::GetTangentAndBitangentForTriangle,
    src/mesh.cpp:390-422)."""
    vi = pack.tri_vidx[face]
    v0 = pack.verts[vi[:, 0]]
    v1 = pack.verts[vi[:, 1]]
    v2 = pack.verts[vi[:, 2]]
    e1 = normalize(v1 - v0, eps=1e-20)
    e2 = normalize(v2 - v1, eps=1e-20)
    uv0, uv1, uv2 = (tex_ops.tile_uv(u) for u in uv012)
    u1 = uv1[:, 0] - uv0[:, 0]
    w1 = uv1[:, 1] - uv0[:, 1]
    u2 = uv2[:, 0] - uv1[:, 0]
    w2 = uv2[:, 1] - uv1[:, 1]
    det = u1 * w2 - w1 * u2
    det = 1.0 / jnp.where(det == 0, 1e-20, det)
    tan = (w2[:, None] * e1 - w1[:, None] * e2) * det[:, None]
    bitan = (-u2[:, None] * e1 + u1[:, None] * e2) * det[:, None]
    return normalize(tan, eps=1e-20), normalize(bitan, eps=1e-20)


def _sphere_tangents(p_rel, radius, phi, theta):
    """Analytic sphere tangents (Sphere::GetTangentAndBitangentAroundPoint,
    src/sphere.cpp:181-193)."""
    tan = jnp.stack([
        2 * PI * p_rel[:, 2],
        jnp.zeros_like(phi),
        -2 * PI * p_rel[:, 0],
    ], axis=-1)
    bitan = jnp.stack([
        PI * p_rel[:, 1] * jnp.cos(phi),
        -radius * PI * jnp.sin(theta),
        PI * p_rel[:, 1] * jnp.sin(phi),
    ], axis=-1)
    return normalize(tan, eps=1e-20), normalize(bitan, eps=1e-20)


def _sample_tex_rgb(pack: ScenePack, tex_idx, uv):
    """Raw GetRGBSample for image textures (0..255-range for LDR images)."""
    ti = jnp.maximum(tex_idx, 0)
    img = pack.tex_img[ti]
    interp = pack.tex_interp[ti]
    return tex_ops.sample_image(
        pack.img_atlas, pack.img_w, pack.img_h, jnp.maximum(img, 0), interp,
        uv[:, 0], uv[:, 1],
    )


def _sample_tex_world(pack: ScenePack, tex_idx, point):
    """GetSampleFromWorldPos for generated (Perlin) textures."""
    ti = jnp.maximum(tex_idx, 0)
    return tex_ops.perlin_sample(
        point, pack.tex_noise_scale[ti], pack.tex_noise_conv[ti]
    )


def _apply_bump_normal_maps(pack: ScenePack, st, kind, hit: Hit, point, uv,
                            uv012, n_obj, tex, nrm_mat, p_rel, radius,
                            phi, theta):
    """Normal mapping (TBN) and bump mapping, mesh path (mesh.cpp:264-357)
    and sphere path (sphere.cpp:116-169).  Returns the *object-space* normal;
    callers transform by the inverse-transpose afterwards."""
    n = n_obj
    is_tri = kind == KIND_TRI

    normal_slot = tex[:, SLOT_NORMAL]
    bump_slot = tex[:, SLOT_BUMP]

    if st.n_textures == 0:
        return n

    # --- normal map (triangles only; the reference's sphere normal-map path
    # is commented out / repurposed, sphere.cpp:95-115) ---
    has_nm = (normal_slot >= 0) & is_tri
    if True:
        sampled = _sample_tex_rgb(pack, normal_slot, uv) / 127.5 - 1.0
        sampled = normalize(sampled, eps=1e-20)
        tan, bitan = _tri_tangents(pack, hit.face, uv012)
        # TBN multiply (GetTransformedNormal, helperMath.cpp:86-108)
        n_mapped = (
            tan * sampled[:, 0:1] + bitan * sampled[:, 1:2] + n * sampled[:, 2:3]
        )
        n = jnp.where(has_nm[:, None], normalize(n_mapped, eps=1e-20), n)

    # --- bump map ---
    has_bump = bump_slot >= 0
    ti = jnp.maximum(bump_slot, 0)
    is_perlin = pack.tex_kind[ti] == 1
    bf = pack.tex_bump_factor[ti]

    # generated (Perlin) bump: world-space gradient (mesh.cpp:290-309 applies
    # bumpFactor to the height; sphere.cpp:123-137 does not)
    eps = 1e-3
    scale = jnp.where(is_tri, bf, 1.0)
    # forward differences of the scaled height field
    p0 = jnp.where(is_tri[:, None], point, p_rel)
    h0 = _sample_tex_world(pack, bump_slot, p0) * scale
    grad = jnp.stack([
        (_sample_tex_world(pack, bump_slot, p0 + jnp.array([eps, 0, 0])) * scale - h0) / eps,
        (_sample_tex_world(pack, bump_slot, p0 + jnp.array([0, eps, 0])) * scale - h0) / eps,
        (_sample_tex_world(pack, bump_slot, p0 + jnp.array([0, 0, eps])) * scale - h0) / eps,
    ], axis=-1)
    # sphere base normal for bump: cross(bitan, tan) (sphere.cpp:118-121)
    tan_s, bitan_s = _sphere_tangents(p_rel, radius, phi, theta)
    n_base = jnp.where(is_tri[:, None], n, normalize(cross(bitan_s, tan_s), eps=1e-20))
    g_par = n_base * dot(grad, n_base)[:, None]
    n_perlin = normalize(n_base - (grad - g_par), eps=1e-20)

    # image bump: forward differences on the height texture
    # mesh path (mesh.cpp:310-357): greyscale = avg/3, no normalizer
    # sphere path (sphere.cpp:138-167): /normalizer, sum of channels
    w_img = pack.img_w[jnp.maximum(pack.tex_img[ti], 0)]
    h_img = pack.img_h[jnp.maximum(pack.tex_img[ti], 0)]
    iw = (uv[:, 0] * jnp.where(is_tri, (w_img - 1), w_img).astype(jnp.float32)).astype(jnp.int32)
    jh = (uv[:, 1] * jnp.where(is_tri, (h_img - 1), h_img).astype(jnp.float32)).astype(jnp.int32)
    i1 = jnp.minimum(iw + 1, w_img - 1)
    j1 = jnp.minimum(jh + 1, h_img - 1)
    img_idx = jnp.maximum(pack.tex_img[ti], 0)
    iw_c = jnp.clip(iw, 0, w_img - 1)
    jh_c = jnp.clip(jh, 0, h_img - 1)

    def grey(ii, jj):
        c = tex_ops.atlas_fetch(pack.img_atlas, img_idx, ii, jj)
        mesh_g = (c[:, 0] + c[:, 1] + c[:, 2]) / 3.0
        sph_g = (c[:, 0] + c[:, 1] + c[:, 2]) / pack.tex_normalizer[ti]
        return jnp.where(is_tri, mesh_g, sph_g)

    h_uv = grey(iw_c, jh_c)
    h_du = grey(i1, jh_c)
    h_dv = grey(iw_c, j1)
    tan_t, bitan_t = _tri_tangents(pack, hit.face, uv012)
    tan_i = jnp.where(is_tri[:, None], tan_t, tan_s)
    bitan_i = jnp.where(is_tri[:, None], bitan_t, bitan_s)
    nb = jnp.where(is_tri[:, None], n, n_base)
    q_u = tan_i + nb * ((h_du - h_uv) * bf)[:, None]
    q_v = bitan_i + nb * ((h_dv - h_uv) * bf)[:, None]
    n_img = normalize(cross(q_v, q_u), eps=1e-20)
    # orientation fixups (mesh.cpp:345-354): flip if opposing the geometric
    # normal on all axes, or wildly diverging on any
    flip1 = jnp.all(n_img * nb <= 0, axis=-1)
    flip2 = jnp.any(jnp.abs(n_img - nb) > 0.9, axis=-1) & is_tri
    n_img = jnp.where((flip1 | flip2)[:, None], -n_img, n_img)

    n_bumped = jnp.where(is_perlin[:, None], n_perlin, n_img)
    n = jnp.where(has_bump[:, None] & (~has_nm)[:, None], n_bumped, n)
    return n


def surface_at(pack: ScenePack, o, d, time, hit: Hit) -> Surface:
    """Reconstruct world-space surface state at the hit.

    Gathers are ~1.5-3 ms EACH at 640k lanes on TPU, so per-hit state comes
    from ONE gather per source table (face / entity / sphere blobs
    concatenated in-jit — the concats are tiny (rows x cols) device ops and
    keep autodiff wiring intact) instead of one gather per field.
    """
    st = pack.static
    r = o.shape[0]
    # miss lanes carry t = inf; zero them so masked lanes never materialize
    # inf/NaN positions (their grads would leak through jnp.where)
    t_eff = jnp.where(hit.valid, hit.t, 0.0)
    point = o + d * t_eff[:, None]

    is_tri = hit.kind == KIND_TRI
    ent = jnp.clip(hit.index, 0, max(st.n_entities - 1, 0))
    sph = jnp.clip(hit.index, 0, max(st.n_spheres - 1, 0))

    # --- triangle branch: normal + entity row in one gather each ---
    n_obj_tri = pack.tri_normal[hit.face]
    if st.has_uv or st.n_textures > 0:
        uv_tri, has_uv, uv012 = _gather_tri_uv(pack, hit.face, hit.beta,
                                               hit.gamma)
    else:
        # gathers elided at compile time for untextured scenes
        uv_tri = jnp.zeros((r, 2))
        uv012 = (uv_tri, uv_tri, uv_tri)
    e_cols = [pack.ent_nrm.reshape(-1, 9),
              pack.ent_material.astype(jnp.float32)[:, None],
              pack.ent_mlight.astype(jnp.float32)[:, None]]
    if st.n_textures > 0:
        e_cols.append(pack.ent_tex.astype(jnp.float32))
    e_row = jnp.concatenate(e_cols, axis=1)[ent]
    nrm_ent = e_row[:, 0:9].reshape(-1, 3, 3)
    ent_material = e_row[:, 9].astype(jnp.int32)
    ent_mlight = e_row[:, 10].astype(jnp.int32)
    ent_tex = (e_row[:, 11:16].astype(jnp.int32) if st.n_textures > 0
               else None)

    # --- sphere branch: recompute local hit (sphere.cpp:66-92) ---
    if st.n_spheres > 0:
        s_cols = [pack.sph_minv.reshape(-1, 12),
                  pack.sph_nrm.reshape(-1, 9),
                  pack.sph_center, pack.sph_radius[:, None],
                  pack.sph_material.astype(jnp.float32)[:, None],
                  pack.sph_motion]
        if st.n_textures > 0:
            s_cols.append(pack.sph_tex.astype(jnp.float32))
        s_row = jnp.concatenate(s_cols, axis=1)[sph]
        sph_minv = s_row[:, 0:12].reshape(-1, 3, 4)
        nrm_sph = s_row[:, 12:21].reshape(-1, 3, 3)
        sph_center = s_row[:, 21:24]
        radius = s_row[:, 24]
        sph_material = s_row[:, 25].astype(jnp.int32)
        sph_motion = s_row[:, 26:29]
        sph_tex = (s_row[:, 29:34].astype(jnp.int32) if st.n_textures > 0
                   else None)
        o_l, d_l = transform_ray(sph_minv, o, d)
        if st.has_motion:
            o_l = o_l + sph_motion * time[:, None]
        p_local = o_l + d_l * t_eff[:, None]
        p_rel = p_local - sph_center
        if st.n_textures > 0:
            phi = jnp.arctan2(p_rel[:, 2], p_rel[:, 0])
            # clip strictly inside (-1, 1): arccos' gradient is infinite at
            # the poles; the 1e-6 shift moves UV.v by < 5e-4 texel units
            theta = jnp.arccos(
                jnp.clip(p_rel[:, 1] / radius, -0.999999, 0.999999))
            uv_sph = jnp.stack([(-phi + PI) / (2 * PI), theta / PI], axis=-1)
        else:
            phi = jnp.zeros(r)
            theta = jnp.zeros(r)
            uv_sph = jnp.zeros((r, 2))
        n_obj_sph = normalize(p_rel, eps=1e-20)
    else:
        p_rel = jnp.zeros((r, 3))
        radius = jnp.ones(r)
        phi = jnp.zeros(r)
        theta = jnp.zeros(r)
        uv_sph = jnp.zeros((r, 2))
        n_obj_sph = jnp.zeros((r, 3))
        sph_material = jnp.zeros(r, jnp.int32)
        sph_tex = None
        nrm_sph = jnp.broadcast_to(jnp.eye(3), (r, 3, 3))

    n_obj = jnp.where(is_tri[:, None], n_obj_tri, n_obj_sph)
    uv = jnp.where(is_tri[:, None], uv_tri, uv_sph)
    if st.n_textures > 0 and sph_tex is not None:
        tex = jnp.where(is_tri[:, None], ent_tex, sph_tex)
    elif st.n_textures > 0:
        tex = ent_tex
    else:
        tex = jnp.full((r, 5), -1, jnp.int32)
    mat = jnp.where(is_tri, ent_material, sph_material)
    if st.n_mesh_lights > 0:
        mlight = jnp.where(is_tri, ent_mlight, -1)
    else:
        mlight = jnp.full(r, -1, jnp.int32)

    if st.n_textures > 0:
        n_obj = _apply_bump_normal_maps(
            pack, st, hit.kind, hit, point, uv, uv012, n_obj, tex,
            None, p_rel, radius, phi, theta,
        )

    nrm_mat = jnp.where(is_tri[:, None, None], nrm_ent, nrm_sph)
    normal = normalize(transform_vector(nrm_mat, n_obj), eps=1e-20)

    return Surface(point=point, normal=normal, uv=uv, mat=mat, tex=tex,
                   mlight=mlight, valid=hit.valid)


def diffuse_reflectance(pack: ScenePack, surf: Surface, base=None):
    """kd with texture modulation (GetDiffuseReflectanceCoeff,
    src/raytracer.cpp:478-508)."""
    kd = pack.mat_diffuse[surf.mat] if base is None else base
    if pack.static.n_textures == 0:
        return kd
    slot = surf.tex[:, SLOT_DIFFUSE]
    has = slot >= 0
    ti = jnp.maximum(slot, 0)
    is_perlin = pack.tex_kind[ti] == 1
    perlin = _sample_tex_world(pack, slot, surf.point)[:, None].repeat(3, -1)
    image = _sample_tex_rgb(pack, slot, surf.uv) / 255.0
    tex_kd = jnp.where(is_perlin[:, None], perlin, image)
    is_blend = pack.tex_decal[ti] == int(DecalMode.BLEND_KD)
    modulated = jnp.where(is_blend[:, None], (tex_kd + kd) / 2.0, tex_kd)
    return jnp.where(has[:, None], modulated, kd)


def specular_reflectance(pack: ScenePack, surf: Surface, base=None):
    """ks with texture modulation.

    The reference's GetSpecularReflectanceCoeff (src/raytracer.cpp:509-539)
    gates on the specular texture but *samples the diffuse texture pointer*
    and blends against mat.diffuse — a null-deref bug when only a specular
    texture exists.  We sample the specular texture and blend against
    mat.specular (the evident intent).
    """
    ks = pack.mat_specular[surf.mat] if base is None else base
    if pack.static.n_textures == 0:
        return ks
    slot = surf.tex[:, SLOT_SPECULAR]
    has = slot >= 0
    ti = jnp.maximum(slot, 0)
    is_perlin = pack.tex_kind[ti] == 1
    perlin = _sample_tex_world(pack, slot, surf.point)[:, None].repeat(3, -1)
    image = _sample_tex_rgb(pack, slot, surf.uv) / 255.0
    tex_ks = jnp.where(is_perlin[:, None], perlin, image)
    is_blend = pack.tex_decal[ti] == int(DecalMode.BLEND_KD)
    modulated = jnp.where(is_blend[:, None], (tex_ks + ks) / 2.0, tex_ks)
    return jnp.where(has[:, None], modulated, ks)


def shade(pack: ScenePack, surf: Surface, w_i, w_o, irradiance,
          kd=None, ks=None, mat_rows: MaterialRows | None = None):
    """Raytracer::Shade (src/raytracer.cpp:192-206): BRDF override if the
    material has one, else default diffuse + specular.

    ``kd``/``ks``/``mat_rows`` may be precomputed by the caller (texture
    sampling and material gathers are w_i-independent, so per-light
    recomputation is waste).
    """
    st = pack.static
    if kd is None:
        kd = diffuse_reflectance(
            pack, surf, None if mat_rows is None else mat_rows.diffuse)
    if ks is None:
        ks = specular_reflectance(
            pack, surf, None if mat_rows is None else mat_rows.specular)
    phong = pack.mat_phong[surf.mat] if mat_rows is None else mat_rows.phong
    n = surf.normal
    base = default_diffuse(kd, w_i, n, irradiance) + default_specular(
        ks, phong, w_i, w_o, n, irradiance
    )
    if st.n_brdfs == 0:
        return base
    bidx = pack.mat_brdf[surf.mat] if mat_rows is None else mat_rows.brdf
    ior = pack.mat_ior[surf.mat] if mat_rows is None else mat_rows.ior
    has_brdf = bidx >= 0
    bi = jnp.maximum(bidx, 0)
    val = eval_brdf(
        pack.brdf_kind[bi], pack.brdf_exponent[bi], pack.brdf_normalized[bi],
        pack.brdf_kdfresnel[bi], ior, kd, ks, w_i, w_o, n,
    )
    cos_i = jnp.maximum(0.0, dot(w_i, n))
    brdf_col = val * irradiance * cos_i[:, None]
    return jnp.where(has_brdf[:, None], brdf_col, base)


def shade_weight(pack: ScenePack, surf: Surface, w_i, w_o, mat_rows=None):
    """Shade with unit irradiance — the path weight used for GI bounces
    (raytracer.cpp:188 applies Shade(..., Li) * 2pi; the Li factor is the
    child's radiance, so the weight is Shade with Li = 1)."""
    return shade(pack, surf, w_i, w_o, jnp.ones_like(w_i),
                 mat_rows=mat_rows)
