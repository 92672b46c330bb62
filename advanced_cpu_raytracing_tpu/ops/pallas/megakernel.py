"""Fused TPU wavefront integrator: the ENTIRE Whitted shading tree in one
Pallas kernel.

Motivation (measured on TPU v5e): the jnp wavefront loop pays ~33 ms of HBM
round-trips + gather kernels per bounce iteration at 640k lanes, because every
stage (trace, surface reconstruction, material gather, per-light occlusion,
stack push/pop) is a separate XLA kernel writing (R,...) arrays back to HBM.
This kernel keeps everything on-chip instead:

  * grid over (8, 128) ray blocks — one block = 1024 pixels resident in
    registers/VMEM for its whole life;
  * the scene is VMEM-resident: triangles as one SoA table (world-space
    vertices + world shading normal + material id, <= 16384 faces = 1 MiB),
    spheres / materials / lights / bg / epsilon baked in as scalar constants
    (the kernel is specialized per scene — scenes are static per render);
  * the recursive shading tree (PerformShading, reference
    src/raytracer.cpp:65-134) runs as a per-block `lax.while_loop`: each lane
    carries its current ray; dielectric splits (raytracer.cpp:261-415) push
    the refraction leg onto a K-slot one-hot stack in the loop carry while the
    reflection leg continues in-register.  Blocks whose 1024 lanes all
    terminate exit the loop early — block-granular ray compaction for free;
  * direct lighting (SampleDirectLighting, raytracer.cpp:701-806) runs
    in-kernel per light with a dedicated occlusion sweep over the same VMEM
    tables (IsInShadow, raytracer.cpp:567-583).

Eligibility is static per scene (see `mega_eligible`) and now covers the
reference's whole feature set except environment lights: Whitted AND path
tracing (diffuse or specular, any RendererParams permutation), all material
types incl. the five pluggable BRDF models with static per-material
parameters, point/directional/spot/area/mesh lights, emissive surfaces,
motion blur, glossy roughness, DoF, stratified multisampling, procedural
Perlin textures (diffuse/specular/bump on untransformed meshes — the
512-entry permutation table is gathered with Mosaic's lane-wise
`take_along_axis(axis=1)`, four perm rows masked by the row index; the 12
gradient vectors are derived arithmetically from the hash so no second
table is needed), and image textures of any committed size
(diffuse/specular/replace_all/normal-map/bump decal modes — nearest and
bilinear, with UV tiling; per-face vertex UVs ride extra tri-table columns
and the trace fold carries the winner's barycentrics).  Small LDR images
(<= 16k texels, integer 0..255) pack RGB one-f32-per-texel into a VMEM row
table fetched by the row-masked lane gather; megapixel and HDR/EXR images
(round 5) live in an HBM table of 8x16-texel tiles served by a
block-coherent WINDOWED gather (DMA the window at the min outstanding row
into a VMEM scratch, lane-gather, repeat — measured 0.065 s for an 800x600
frame over a 1024x1024 bilinear texture, 9.1x the reference CPU,
bit-equal images).  Env lights use the same two paths by map size.
Randomness comes from the on-chip PRNG (pltpu.prng_random_bits; a host
jax.random table in interpret mode, where pltpu.prng has no lowering).
Reverse-mode AD routes to ops/pallas/megabwd.py when eligible, else the
jnp wavefront.

Semantics are a transcription of render/integrator.py (same reference quirks:
2pi emissive factor, shadow epsilon offsets along the shading normal, the
dielectric medium bookkeeping of raytracer.cpp:261-415, conductor Fresnel of
raytracer.cpp:208-254) — the two paths are cross-checked by
tests/test_megakernel.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advanced_cpu_raytracing_tpu.scene.types import DecalMode, MaterialType

ROWS, LANES = 8, 128
TILE = ROWS * LANES
BIG = 3.0e37  # sentinel "no hit" distance (plain float: jnp scalars would be
# captured consts in pallas)

_MIRROR = int(MaterialType.MIRROR)
_DIELECTRIC = int(MaterialType.DIELECTRIC)
_CONDUCTOR = int(MaterialType.CONDUCTOR)
_EMISSIVE = int(MaterialType.EMISSIVE)


# Faces per culling chunk: consecutive faces in BVH depth-first order (the
# pack permutes each mesh's faces by its BVH build), so a chunk is spatially
# coherent and one AABB test per (block, chunk) replaces 128 triangle tests
# when the whole ray block misses it — the TPU-shaped answer to per-ray BVH
# pointer chasing (reference bvh.cpp:5-31).
CHUNK = 128

# VMEM-residency ceiling for the tri table (mirrors pack.MEGA_MAX_FACES);
# larger scenes stream chunks from HBM
_VMEM_MAX_FACES = 98304

# Streaming granularity (round 5): HBM-streamed scenes sweep 512-face
# chunks — one DMA amortizes its latency over 4x the faces and the cull
# loop runs 4x fewer conds than the round-4 128-face granularity
# (measured 0.20 -> see BASELINE.md).  Culling granularity coarsens
# correspondingly; BVH-ordered faces keep chunks spatially coherent.
STREAM_CHUNK = 2048
# fine-cull granularity inside a streamed super-chunk: smaller boxes cull
# sweeps tighter at the cost of more slab tests within surviving supers
# (fine tests only run where the super's coarse box passed).  Swept on
# hardware over {128, 64, 32, 16, 8} on the 524k-face textured terrain:
# 1.01 / 0.76 / 0.67 / 0.62 / 0.72 s — 16 is the knee (BASELINE.md)
STREAM_FINE = 16


def _perm512_table() -> np.ndarray:
    """Perlin permutation table duplicated to 512 entries, shaped (4, 128)
    f32 for the kernel's lane-wise gather (values <= 255 are exact in f32)."""
    from advanced_cpu_raytracing_tpu.ops.texture import _PERM256

    return np.concatenate([_PERM256, _PERM256]).astype(np.float32).reshape(4, 128)


@dataclass(frozen=True)
class MegaConsts:
    """Scene constants baked into the kernel (hashable => one jit per scene)."""

    n_tri: int
    # per sphere: (minv 12 floats row-major 3x4, nrm 9 floats row-major 3x3,
    #              center 3, radius, mat_index)
    spheres: tuple
    # per material: (type, ambient3, diffuse3, specular3, mirror3, phong,
    #                ior, cond_k, absorb3, radiance3, roughness,
    #                brdf_kind|-1, brdf_exponent, normalized, kdfresnel)
    materials: tuple
    point_lights: tuple  # of (pos3, intensity3)
    dir_lights: tuple  # of (unit_to_light3, radiance3)
    # of (pos3, dir3, intensity3, cos_half_cov, cos_half_fall, cov_deg, fall_deg)
    spot_lights: tuple
    # of (pos3, normal3, radiance3, extent, area, u3, v3)
    area_lights: tuple
    ambient: tuple  # (3,)
    bg: tuple  # (3,)
    eps: float  # shadow_ray_epsilon
    max_depth: int
    has_mirror: bool
    has_dielectric: bool
    has_conductor: bool
    stack_k: int
    max_iters: int
    # ---- path tracing / emissive extensions ----
    pt: bool = False
    pt_importance: bool = False
    pt_nee: bool = False
    pt_rr: bool = False
    rr_floor: int = 8
    has_emissive: bool = False
    # per mesh light: (radiance3, faces: tuple of (tri_row:int, weight:float))
    mesh_lights: tuple = ()
    # draw randoms from a host-supplied table instead of the on-chip PRNG
    # (pltpu.prng_* has no interpret-mode lowering -> CPU tests use this)
    host_rng: bool = False
    n_draws: int = 0  # randoms consumed per loop iteration (table layout)
    has_rough: bool = False  # any material roughness > 0.001
    has_motion: bool = False  # per-object linear motion (tri cols 16:19)
    # ---- procedural Perlin textures (tri cols 19:22 = slot per face) ----
    # per texture: (noise_scale, conversion 0=linear 1=absval, blend_kd 0/1,
    # bump_factor); the three slot tuples list which texture ids actually
    # appear in the diffuse / specular / bump slot so the kernel unrolls
    # only the evals a scene needs
    perlin_textures: tuple = ()
    perlin_diff: tuple = ()
    perlin_spec: tuple = ()
    perlin_bump: tuple = ()
    # ---- image textures (tri cols 19:22 = slot per face, 24:30 = uv0/1/2;
    # ImageTexture, src/imageTexture.h:60-133) ----
    # per texture index: () for non-image textures, else (interp 0=nearest
    # 1=bilinear, blend_kd 0/1, width, height, row0, n_rows) where
    # [row0, row0+n_rows) are this texture's rows in the packed texel table
    # (one f32 per texel: r + 256*g + 65536*b, exact for LDR 0..255).  The
    # slot tuples mirror perlin_diff/perlin_spec.
    image_textures: tuple = ()
    img_diff: tuple = ()
    img_spec: tuple = ()
    # texture ids per decal slot (round 4): replace_all short-circuit
    # (raytracer.cpp:87-89), tangent-space normal maps (mesh.cpp:264-275),
    # image height-field bump (mesh.cpp:310-357); TBN columns 30:36 of the
    # tri table are precomputed per face on the host
    img_ra: tuple = ()
    img_normal: tuple = ()
    img_bump: tuple = ()
    has_tbn: bool = False
    # round 5: TBN columns are OBJECT-space (+ object normal 36:39 and
    # per-entity M^-T 39:48) for scenes with transformed mapped meshes;
    # identity scenes keep the 6-col precomposed world TBN
    tbn_obj: bool = False
    # geometry beyond the VMEM budget: the tri table stays in HBM and each
    # chunk that survives the per-block AABB cull is DMA'd into a VMEM
    # scratch before its 128-face sweep (lifts the 98,304-face ceiling to
    # STREAM_MAX_FACES; mesh.cpp:23-156 handles any face count)
    stream_geo: bool = False
    # ---- spherical environment light (sphericalEnvironmentLight.h:8-64) ----
    # () or (width, height, row0, n_rows): raw HDR texels live as three
    # channel blocks of n_rows rows each at [row0, row0+3*n_rows) in the
    # img table, fetched by the row-masked lane gather; lat-long direction
    # math (atan2/acos) is computed with in-kernel polynomials since Mosaic
    # lowers neither primitive
    env: tuple = ()
    # ---- megapixel / HDR image textures (round 5) ----
    # per texture index: () for small/non-image textures, else
    # (interp, blend, w, h, tiles_x, row0, bump_factor) into the HBM big
    # table (see _tile_big_image); only set when at least one big texture
    # exists.  The decal slot lists (img_diff/img_spec/...) cover BOTH
    # small and big ids — call sites dispatch per id.
    big_textures: tuple = ()
    # env map beyond the VMEM gather budget: mc.env becomes
    # (width, height, row0_in_big_table, tiles_x) and env_big is set
    env_big: bool = False
    # replace_background decal (round 5, texture.h:49-52): texture index
    # sampled at (px/width, py/height) on primary miss — the kernel gets
    # two pixel-uv input planes beside o/d
    bg_tex: int = -1
    # sphere textures (round 5, sphere.cpp:116-169): per sphere,
    # (diffuse, specular, replace_all, bump slots, bump normalizer);
    # the trace computes spherical UV from the local hit point with the
    # in-kernel atan2/acos polynomials, and BUMP applies at intersect
    # time in object space (analytic tangents, M^-T back to world)
    sph_tex: tuple = ()


def mega_eligible(static, opts, pack=None) -> bool:
    """Static feature gate for the fused kernel (see module docstring)."""
    base = (
        not opts.differentiable
        # all triangle geometry must fit the VMEM work-item table (sphere-only
        # scenes qualify with an empty one)
        and (static.n_faces == 0 or static.n_work_items > 0)
        and (static.n_work_items > 0 or static.n_spheres > 0)
        and static.n_env <= 1
        and static.n_area <= 4
        and static.n_spot <= 4
        and static.n_spheres <= 8
        # materials are unrolled masked selects (~17 scalar fields each);
        # the contributor golden scenes go up to 103 materials
        and static.n_materials <= 128
        and opts.max_depth <= 10
        # mesh lights: the NEE face loop unrolls per face.  Round 5: both
        # textures (their tables are separate VMEM inputs; tri-table
        # columns read through the rebindable accessor) and mesh lights
        # (corners baked as constants) work with HBM-streamed geometry,
        # so no streaming exclusions remain
        and static.n_mesh_lights <= 4
    )
    if not base:
        return False
    if static.n_textures > 0 and not _textures_eligible(static, pack):
        return False
    if static.n_env > 0:
        # small maps ride the VMEM row-masked gather; bigger ones the HBM
        # windowed gather (round 5) up to the per-image big budget
        if pack is None:
            return False
        img = int(np.asarray(pack.env_img)[0])
        ew = int(np.asarray(pack.img_w)[img])
        eh = int(np.asarray(pack.img_h)[img])
        if ew * eh > _BIG_MAX_TEXELS:
            return False
    if pack is not None and static.n_mesh_lights > 0:
        import numpy as _np

        if int(_np.asarray(pack.ml_face_count).max()) > 32:
            return False
    return True


# Texel budget per in-kernel image texture: 128 gather rows of 128 lanes.
# The row-masked lane gather is O(rows) vector ops per tap; measured still
# cheap at 128 rows compiled (ARCHITECTURE.md "gather headroom").
_IMG_MAX_TEXELS = 16384

# ---- megapixel / HDR textures (round 5) ----
# Images too big (or non-integer, i.e. HDR/EXR) for the VMEM row-masked
# gather live in a separate HBM table laid out in 8x16-TEXEL TILES (one
# 128-lane row per tile per channel, three channel rows per tile, tile grid
# row-major).  The kernel serves taps with a block-coherent WINDOWED gather:
# take the min outstanding row over unserved lanes, DMA a _BIG_WN-row
# window into a VMEM scratch, lane-gather every tap that falls inside it,
# repeat until all lanes are served (validated + timed on hardware by
# tools/probe_bigtex.py: ~110-220 M bilinear samples/s at realistic
# coherence).  2D tiling keeps a ray block's taps in few windows: a 32x32
# texel footprint touches ~5 runs of ~4 consecutive rows regardless of the
# image width, where row-major rows would spread over width/16 rows.
_BIG_TILE_H, _BIG_TILE_W = 8, 16
_BIG_WN = 16  # DMA window rows (8 KiB)
_BIG_MAX_TEXELS = 1 << 24  # per image (e.g. 4096x4096)
_BIG_MAX_TOTAL = 1 << 25  # per scene (~400 MB HBM at f32 rgb)


def _tile_big_image(data: np.ndarray):
    """(h, w, 3) f32 -> ((tiles*3, 128) rows, tiles_x).  Tile t=(ty,tx)
    channel c lives at row (ty*tiles_x+tx)*3 + c; texel (i,j) sits at lane
    (j%8)*16 + i%16 of its tile's rows."""
    h, w, _ = data.shape
    ty = -(-h // _BIG_TILE_H)
    tx = -(-w // _BIG_TILE_W)
    buf = np.zeros((ty * _BIG_TILE_H, tx * _BIG_TILE_W, 3), np.float32)
    buf[:h, :w] = data
    t = buf.reshape(ty, _BIG_TILE_H, tx, _BIG_TILE_W, 3)
    t = t.transpose(0, 2, 4, 1, 3)  # (ty, tx, 3, 8, 16)
    return t.reshape(ty * tx * 3, LANES), tx


def _img_is_small(pack, img: int) -> bool:
    """Does image `img` qualify for the VMEM packed-RGB row gather?
    (<= _IMG_MAX_TEXELS texels AND integer 0..255 values — the pack folds
    RGB into one f32 per texel, exact only for LDR ints.)  Anything else —
    megapixel and/or HDR/EXR — goes to the HBM windowed-gather big table."""
    w = int(np.asarray(pack.img_w)[img])
    h = int(np.asarray(pack.img_h)[img])
    if w * h > _IMG_MAX_TEXELS:
        return False
    data = np.asarray(pack.img_atlas)[img, :h, :w]
    return bool(data.min() >= 0.0 and data.max() <= 255.0
                and np.array_equal(data, np.round(data)))


def _textures_eligible(static, pack) -> bool:
    """Textured scenes qualify only when every texture is in-kernel-able:

    * procedural Perlin — diffuse/specular/bump decal modes (sphere bump
      uses the local frame; MESH perlin bump still needs identity normal
      matrices, since the kernel projects a world-space gradient against
      its world normal while shading.py works in object space);
    * image — diffuse/specular/replace_all/replace_background/normal-map/
      image-bump decal modes, on meshes AND spheres (round 5).  Small LDR
      images (<= _IMG_MAX_TEXELS texels, integer 0..255) ride the VMEM
      row-masked gather; megapixel and HDR/EXR images (round 5) ride the
      HBM windowed gather up to _BIG_MAX_TEXELS per image /
      _BIG_MAX_TOTAL per scene (imageTexture.h:60-133, HDRImage.h:45-70
      load arbitrary sizes).  Normal/bump maps work on ANY transform
      (object-space TBN + per-entity M^-T columns, round 5).

    Common gates: no custom BRDFs (the kernel's BRDF branch bakes kd
    statically), no motion (the hit point used for world-space Perlin
    sampling would live in shifted-ray space)."""
    # 8 textures max: the kernel unrolls per texture, and the shared
    # total_texels budget below bounds VMEM regardless of count
    if pack is None or static.n_textures > 8 or static.has_motion:
        return False
    if getattr(static, "n_brdfs", 0) > 0:
        return False
    from advanced_cpu_raytracing_tpu.scene.pack import (
        SLOT_NORMAL,
        SLOT_REPLACE_ALL,
        SLOT_BUMP,
    )

    kind = np.asarray(pack.tex_kind)
    decal = np.asarray(pack.tex_decal)
    ok_perlin = {int(DecalMode.REPLACE_KD), int(DecalMode.BLEND_KD),
                 int(DecalMode.REPLACE_KS), int(DecalMode.BUMP_NORMAL)}
    ok_image = {int(DecalMode.REPLACE_KD), int(DecalMode.BLEND_KD),
                int(DecalMode.REPLACE_KS), int(DecalMode.REPLACE_ALL),
                int(DecalMode.REPLACE_NORMAL), int(DecalMode.BUMP_NORMAL),
                int(DecalMode.REPLACE_BACKGROUND)}
    total_texels = 0
    total_big = 0
    for i in range(static.n_textures):
        if kind[i] == 1:
            if int(decal[i]) not in ok_perlin:
                return False
            continue
        # image texture
        if int(decal[i]) not in ok_image:
            return False
        img = int(np.asarray(pack.tex_img)[i])
        if img < 0:
            return False
        w = int(np.asarray(pack.img_w)[img])
        h = int(np.asarray(pack.img_h)[img])
        if _img_is_small(pack, img):
            total_texels += w * h
        else:
            if w * h > _BIG_MAX_TEXELS:
                return False
            total_big += w * h
    if total_texels > 2 * _IMG_MAX_TEXELS or total_big > _BIG_MAX_TOTAL:
        return False
    # spheres: diffuse/specular/replace_all decals AND bump maps run
    # in-kernel since round 5 (spherical UV + analytic tangents from the
    # local hit, sphere.cpp:116-169); sphere normal-map slots are a no-op
    # in the reference (sphere.cpp:95-115 commented out) and in shading.py
    et = np.asarray(pack.ent_tex)
    # PERLIN-bump entities still need the world==object identity (the
    # kernel projects a world-space gradient against its world normal,
    # shading.py does it in object space); image normal/bump maps and
    # replace_all work on ANY transform since round 5 — object-space TBN
    # columns + per-entity M^-T columns (mesh.cpp:264-357 semantics)
    pb = et[:, SLOT_BUMP]
    mapped = np.where((pb >= 0) & (kind[np.maximum(pb, 0)] == 1))[0]
    if len(mapped):
        nrm = np.asarray(pack.ent_nrm)[mapped]
        if not np.allclose(nrm, np.eye(3, dtype=np.float32), atol=1e-6):
            return False
    return True


def build_mega(pack, opts, host_rng: bool = False):
    """Extract (MegaConsts, tri_table, chunk_table, img_table) from a
    ScenePack.

    tri_table is (Tpad, 16|24|32) f32: v0(0:3) v1(3:6) v2(6:9) n_world(9:12)
    mat(12) mlight(13) emissive(14) pad(15) [motion(16:19) tex slots(19:22)
    uv0/uv1/uv2(24:30)].  chunk_table is (n_chunks, 8) f32: bbox min(0:3)
    max(3:6) over each CHUNK consecutive faces.  img_table is the packed
    image-texture texel pool ((1,128) zeros when unused).  ``opts`` is the
    RenderOptions the render will use (PT flags + depth).
    """
    st = pack.static
    max_depth = opts.max_depth
    w = st.n_work_items
    # motion scenes widen the table with per-face world-space motion (16:19);
    # textured scenes with per-face texture slots (19:22); image-textured
    # scenes with per-face vertex UVs (24:30) — VMEM pads the minor dim to
    # 128 lanes either way, so wider columns are free
    has_tex = st.n_textures > 0
    kind_np = np.asarray(pack.tex_kind) if has_tex else np.zeros(0, np.int32)
    has_img = bool((kind_np == 0).any()) if has_tex else False
    if has_tex:
        from advanced_cpu_raytracing_tpu.scene.pack import (
            SLOT_NORMAL as _SN,
            SLOT_REPLACE_ALL as _SR,
            SLOT_BUMP as _SB,
        )

        _et = np.asarray(pack.ent_tex)
        _tbn_ents = ((_et[:, _SN] >= 0)
                     | ((_et[:, _SB] >= 0)
                        & (kind_np[np.maximum(_et[:, _SB], 0)] == 0)))
        has_tbn = bool(has_img and _tbn_ents.any())
        # round 5: mapped entities with non-identity normal matrices use
        # OBJECT-space TBN columns + per-entity M^-T columns (cols 36:48);
        # identity scenes keep the precomposed world-space 6-col fast path
        tbn_obj = bool(has_tbn and not np.allclose(
            np.asarray(pack.ent_nrm)[np.where(_tbn_ents)[0]],
            np.eye(3, dtype=np.float32), atol=1e-6))
    else:
        has_tbn = False
        tbn_obj = False
    n_cols = ((48 if tbn_obj else 40) if has_tbn else 32) if has_img \
        else (24 if (st.has_motion or has_tex) else 16)
    tab = np.zeros((max(w, 1), n_cols), np.float32)
    tab[:, 13] = -1.0
    if has_tex:
        tab[:, 19:22] = -1.0
        if has_img:
            tab[:, 22:24] = -1.0
    if w:
        tab[:, 0:3] = np.asarray(pack.wi_v0)[:w]
        tab[:, 3:6] = np.asarray(pack.wi_v1)[:w]
        tab[:, 6:9] = np.asarray(pack.wi_v2)[:w]
        tab[:, 9:12] = np.asarray(pack.wi_normal)[:w]
        tab[:, 12] = np.asarray(pack.wi_mat)[:w].astype(np.float32)
        wi_ent = np.asarray(pack.wi_ent)[:w]
        tab[:, 13] = np.asarray(pack.ent_mlight)[wi_ent].astype(np.float32)
        mtypes = np.asarray(pack.mat_type)
        tab[:, 14] = (mtypes[np.asarray(pack.wi_mat)[:w]]
                      == _EMISSIVE).astype(np.float32)
        if st.has_motion:
            tab[:, 16:19] = np.asarray(pack.wi_motion)[:w]
        if has_tex:
            from advanced_cpu_raytracing_tpu.scene.pack import (
                SLOT_BUMP,
                SLOT_DIFFUSE,
                SLOT_SPECULAR,
            )

            et = np.asarray(pack.ent_tex)
            tab[:, 19] = et[wi_ent, SLOT_DIFFUSE].astype(np.float32)
            tab[:, 20] = et[wi_ent, SLOT_SPECULAR].astype(np.float32)
            tab[:, 21] = et[wi_ent, SLOT_BUMP].astype(np.float32)
        if has_img:
            from advanced_cpu_raytracing_tpu.scene.pack import (
                SLOT_NORMAL,
                SLOT_REPLACE_ALL,
            )

            tab[:, 22] = et[wi_ent, SLOT_REPLACE_ALL].astype(np.float32)
            tab[:, 23] = et[wi_ent, SLOT_NORMAL].astype(np.float32)
            # per-face vertex UVs for barycentric interpolation
            # (_gather_tri_uv semantics: uvidx -1 -> uv 0, clamped gathers)
            uvi = np.asarray(pack.tri_uvidx)[np.asarray(pack.wi_face)[:w]]
            uvv = np.asarray(pack.uvs)[np.maximum(uvi, 0)]  # (w,3,2)
            uvv[uvi[:, 0] < 0] = 0.0
            tab[:, 24:30] = uvv.reshape(w, 6)
        if has_tbn:
            # per-face tangent/bitangent from UV edges in cols 30:36
            # (Mesh::GetTangentAndBitangentForTriangle, mesh.cpp:390-422;
            # shading.py::_tri_tangents).  Identity scenes: world edge
            # vectors equal object ones, so the columns double as the
            # precomposed world TBN.  tbn_obj (round 5): columns hold the
            # OBJECT-space TBN + object normal (36:39) + per-entity M^-T
            # (39:48) and the kernel transforms the mapped normal itself.
            def _nrm(v):
                return v / np.maximum(
                    np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

            def _tile(u):
                frac = u - np.floor(u)
                frac = np.where(frac < 0.0001, 1.0, frac)
                return np.where(u > 1.0001, frac, u)

            if tbn_obj:
                vo = np.asarray(pack.verts)[
                    np.asarray(pack.tri_vidx)[np.asarray(pack.wi_face)[:w]]]
                e1 = _nrm(vo[:, 1] - vo[:, 0])
                e2 = _nrm(vo[:, 2] - vo[:, 1])
            else:
                e1 = _nrm(tab[:w, 3:6] - tab[:w, 0:3])
                e2 = _nrm(tab[:w, 6:9] - tab[:w, 3:6])
            uvt = _tile(tab[:w, 24:30].reshape(w, 3, 2))
            u1 = uvt[:, 1, 0] - uvt[:, 0, 0]
            w1 = uvt[:, 1, 1] - uvt[:, 0, 1]
            u2 = uvt[:, 2, 0] - uvt[:, 1, 0]
            w2 = uvt[:, 2, 1] - uvt[:, 1, 1]
            det = u1 * w2 - w1 * u2
            det = 1.0 / np.where(det == 0, 1e-20, det)
            tan = (w2[:, None] * e1 - w1[:, None] * e2) * det[:, None]
            bitan = (-u2[:, None] * e1 + u1[:, None] * e2) * det[:, None]
            tab[:w, 30:33] = _nrm(tan)
            tab[:w, 33:36] = _nrm(bitan)
            if tbn_obj:
                tab[:w, 36:39] = np.asarray(pack.tri_normal)[
                    np.asarray(pack.wi_face)[:w]]
                tab[:w, 39:48] = np.asarray(pack.ent_nrm)[wi_ent] \
                    .reshape(w, 9)

    stream_geo = w > _VMEM_MAX_FACES
    fgran = STREAM_FINE if stream_geo else CHUNK
    n_chunks = max((w + fgran - 1) // fgran, 1)
    ctab = np.zeros((n_chunks, 8), np.float32)
    for ci in range(n_chunks):
        lo, hi = ci * fgran, min((ci + 1) * fgran, max(w, 1))
        vs = tab[lo:hi, 0:9].reshape(-1, 3)
        if len(vs):
            ctab[ci, 0:3] = vs.min(axis=0)
            ctab[ci, 3:6] = vs.max(axis=0)
            if st.has_motion:
                # ray origin shifts by +motion*time, i.e. the triangle sweeps
                # by -motion over time [0,1]: cover both endpoints
                mo = tab[lo:hi, 16:19]
                ctab[ci, 0:3] = np.minimum(ctab[ci, 0:3],
                                           (vs.reshape(-1, 3, 3) - mo[:, None])
                                           .reshape(-1, 3).min(axis=0))
                ctab[ci, 3:6] = np.maximum(ctab[ci, 3:6],
                                           (vs.reshape(-1, 3, 3) - mo[:, None])
                                           .reshape(-1, 3).max(axis=0))

    def tup(a):
        return tuple(float(x) for x in np.asarray(a).reshape(-1))

    spheres = []
    for i in range(st.n_spheres):
        spheres.append((
            tup(np.asarray(pack.sph_minv)[i]),
            tup(np.asarray(pack.sph_nrm)[i]),
            tup(np.asarray(pack.sph_center)[i]),
            float(np.asarray(pack.sph_radius)[i]),
            int(np.asarray(pack.sph_material)[i]),
            tup(np.asarray(pack.sph_motion)[i]),  # object-space, per time
        ))

    materials = []
    for i in range(st.n_materials):
        materials.append((
            int(np.asarray(pack.mat_type)[i]),
            tup(np.asarray(pack.mat_ambient)[i]),
            tup(np.asarray(pack.mat_diffuse)[i]),
            tup(np.asarray(pack.mat_specular)[i]),
            tup(np.asarray(pack.mat_mirror)[i]),
            float(np.asarray(pack.mat_phong)[i]),
            float(np.asarray(pack.mat_ior)[i]),
            float(np.asarray(pack.mat_cond_k)[i]),
            tup(np.asarray(pack.mat_absorption)[i]),
            tup(np.asarray(pack.mat_radiance)[i]),
            float(np.asarray(pack.mat_roughness)[i]),
            # 11-14: pluggable BRDF (kind or -1, exponent, normalized,
            # kdfresnel) resolved from the scene's BRDF table
            int(np.asarray(pack.mat_brdf)[i]) if st.n_brdfs else -1,
            0.0, False, False,
        ))
    if st.n_brdfs:
        bk = np.asarray(pack.brdf_kind)
        be = np.asarray(pack.brdf_exponent)
        bn = np.asarray(pack.brdf_normalized)
        bf = np.asarray(pack.brdf_kdfresnel)
        materials = [
            m[:11] + ((int(bk[m[11]]), float(be[m[11]]), bool(bn[m[11]]),
                       bool(bf[m[11]])) if m[11] >= 0
                      else (-1, 0.0, False, False))
            for m in materials
        ]

    # mesh lights: each face as (row, area weight, world corners) so the
    # NEE loop unrolls with scalar constants (MeshLight::SampleRandomPoint,
    # meshLight.h:27-50; weight = faceArea/surfaceArea in object space).
    # Corners are BAKED — no tri-table reads, so mesh lights work with
    # HBM-streamed geometry too (round 5)
    mesh_lights = []
    if st.n_mesh_lights and w:
        wi_ent_np = np.asarray(pack.wi_ent)[:w]
        wi_face_np = np.asarray(pack.wi_face)[:w]
        tri_area_np = np.asarray(pack.tri_area)
        for i in range(st.n_mesh_lights):
            ent = int(np.asarray(pack.ml_ent)[i])
            area = float(np.asarray(pack.ml_area)[i])
            rows = np.where(wi_ent_np == ent)[0]
            faces = tuple(
                (int(rw), float(tri_area_np[wi_face_np[rw]]
                                / max(area, 1e-20)),
                 tup(tab[rw, 0:9]))
                for rw in rows
            )
            mesh_lights.append(
                (tup(np.asarray(pack.ml_radiance)[i]), faces))

    plights = tuple(
        (tup(np.asarray(pack.pl_pos)[i]), tup(np.asarray(pack.pl_intensity)[i]))
        for i in range(st.n_point)
    )
    dlights = []
    for i in range(st.n_directional):
        d = np.asarray(pack.dl_dir)[i].astype(np.float64)
        d = -d / max(np.linalg.norm(d), 1e-30)  # unit vector TOWARD the light
        dlights.append((tup(d), tup(np.asarray(pack.dl_radiance)[i])))
    slights = tuple(
        (tup(np.asarray(pack.sl_pos)[i]), tup(np.asarray(pack.sl_dir)[i]),
         tup(np.asarray(pack.sl_intensity)[i]),
         float(np.asarray(pack.sl_cos_half_cov)[i]),
         float(np.asarray(pack.sl_cos_half_fall)[i]),
         float(np.asarray(pack.sl_coverage_deg)[i]),
         float(np.asarray(pack.sl_falloff_deg)[i]))
        for i in range(st.n_spot))
    alights = tuple(
        (tup(np.asarray(pack.al_pos)[i]), tup(np.asarray(pack.al_normal)[i]),
         tup(np.asarray(pack.al_radiance)[i]),
         float(np.asarray(pack.al_extent)[i]),
         float(np.asarray(pack.al_area)[i]),
         tup(np.asarray(pack.al_u)[i]), tup(np.asarray(pack.al_v)[i]))
        for i in range(st.n_area))

    rr_floor = 8
    any_spec_mat = st.has_mirror or st.has_conductor or st.has_dielectric
    d_total = max_depth + (rr_floor if (opts.path_tracing
                                        and opts.russian_roulette) else 0)
    if opts.path_tracing and not any_spec_mat:
        # diffuse+emissive PT: the GI bounce is the lane's continuation, so
        # iterations track the chain length and no stack is needed
        max_iters = d_total + 2
        stack_k = 0
    elif opts.path_tracing:
        # PT with specular materials: the specular chain continues
        # in-register; GI (and dielectric refraction) children push.
        # Branching b-ary tree node bound, while-loop exits early per block.
        b = 3 if st.has_dielectric else 2
        max_iters = min(b ** (min(d_total, 9) + 1), 4096) + 4
        stack_k = (b - 1) * max(d_total, 1) + 4
    elif st.has_dielectric:
        max_iters = min(2 ** (max_depth + 1), 4096) + 4
        stack_k = max_depth + 2
    else:
        max_iters = max_depth + 2
        stack_k = 0

    n_area = st.n_area
    has_rough = st.has_rough
    n_env = st.n_env
    if (opts.path_tracing or mesh_lights or n_area or has_rough
            or st.has_motion or n_env):
        # slots: 0 RR | 1-2 GI | 3.. mesh lights (3 each) | .. area (2 each)
        # | .. env rejection candidates (48 = 16 x 3) | .. roughness (4:
        # reflect+refract psi pairs) | last: motion time
        n_draws = (3 + 3 * len(mesh_lights) + 2 * n_area
                   + (48 if n_env else 0)
                   + (4 if has_rough else 0) + (1 if st.has_motion else 0))
    else:
        n_draws = 0

    perlin_tex = ()
    p_diff = p_spec = p_bump = ()
    image_tex = ()
    big_tex = ()
    big_rows: list = []  # HBM big-table blocks (megapixel/HDR images + env)
    i_diff = i_spec = i_bump = i_ra = i_nm = ()
    img_tab = np.zeros((1, LANES), np.float32)
    if has_tex:
        nscale = np.asarray(pack.tex_noise_scale)
        nconv = np.asarray(pack.tex_noise_conv)
        decal = np.asarray(pack.tex_decal)
        bumpf = np.asarray(pack.tex_bump_factor)

        # sphere texture slots (round 5): their ids join the per-slot
        # unroll lists alongside the tri-table column ids
        sph_tex_np = (np.asarray(pack.sph_tex) if st.n_spheres
                      else np.zeros((0, 5), np.int32))

        def slotted(col, kind):
            ids = set(tab[:w, col])
            from advanced_cpu_raytracing_tpu.scene.pack import (
                SLOT_BUMP as _SB2,
                SLOT_DIFFUSE as _SD2,
                SLOT_REPLACE_ALL as _SR2,
                SLOT_SPECULAR as _SS2,
            )
            # sphere BUMP ids are intentionally absent (col 21): the bump
            # applies inside the trace's sphere loop with static dispatch,
            # not through the body's tb_f-masked mesh loops
            sph_col = {19: _SD2, 20: _SS2, 22: _SR2}.get(col)
            if sph_col is not None and len(sph_tex_np):
                ids |= set(sph_tex_np[:, sph_col].astype(np.float64))
            return tuple(sorted(
                int(x) for x in ids
                if x >= 0 and kind_np[int(x)] == kind))

        if (kind_np == 1).any():
            perlin_tex = tuple(
                (float(nscale[i]), int(nconv[i]),
                 int(int(decal[i]) == int(DecalMode.BLEND_KD)),
                 float(bumpf[i]))
                for i in range(st.n_textures))
            p_diff = slotted(19, 1)
            p_spec = slotted(20, 1)
            p_bump = slotted(21, 1)
        if has_img:
            # pack each small LDR image's texels as one f32 per texel
            # (r + 256 g + 65536 b, exact: < 2^24), row-major j*w+i flat
            # order, padded to full 128-lane rows and stacked into one
            # table; megapixel/HDR images (round 5) go to the tiled HBM
            # big table instead (_tile_big_image)
            interp_np = np.asarray(pack.tex_interp)
            timg = np.asarray(pack.tex_img)
            entries: list = []
            big_entries: list = []
            rows_list = []
            img_row0: dict = {}  # image index -> row0 (textures share images)
            big_img_row0: dict = {}  # image index -> (row0, tiles_x)
            row0 = 0
            for i in range(st.n_textures):
                if kind_np[i] != 0:
                    entries.append(())
                    big_entries.append(())
                    continue
                img = int(timg[i])
                iw = int(np.asarray(pack.img_w)[img])
                ih = int(np.asarray(pack.img_h)[img])
                if _img_is_small(pack, img):
                    if img not in img_row0:
                        data = np.asarray(pack.img_atlas)[img, :ih, :iw]
                        packed = (data[..., 0] + 256.0 * data[..., 1]
                                  + 65536.0 * data[..., 2]).reshape(-1)
                        n_rows = -(-packed.size // LANES)
                        buf = np.zeros(n_rows * LANES, np.float32)
                        buf[:packed.size] = packed
                        rows_list.append(buf.reshape(n_rows, LANES))
                        img_row0[img] = row0
                        row0 += n_rows
                    entries.append((
                        int(interp_np[i]),
                        int(int(decal[i]) == int(DecalMode.BLEND_KD)),
                        iw, ih, img_row0[img], -(-(iw * ih) // LANES),
                        float(bumpf[i])))
                    big_entries.append(())
                else:
                    if img not in big_img_row0:
                        data = np.asarray(pack.img_atlas)[img, :ih, :iw]
                        tiled, tiles_x = _tile_big_image(data)
                        big_img_row0[img] = (
                            sum(b.shape[0] for b in big_rows), tiles_x)
                        big_rows.append(tiled)
                    br0, btx = big_img_row0[img]
                    big_entries.append((
                        int(interp_np[i]),
                        int(int(decal[i]) == int(DecalMode.BLEND_KD)),
                        iw, ih, btx, int(br0), float(bumpf[i])))
                    entries.append(())
            image_tex = tuple(entries)
            if any(big_entries):
                big_tex = tuple(big_entries)
            img_tab = (np.concatenate(rows_list, axis=0) if rows_list
                       else np.zeros((1, LANES), np.float32))
            i_diff = slotted(19, 0)
            i_spec = slotted(20, 0)
            i_bump = slotted(21, 0)
            i_ra = slotted(22, 0)
            i_nm = slotted(23, 0)

    # spherical env light: raw HDR texels appended to the img table as three
    # channel blocks (R rows, G rows, B rows) for the row-masked lane
    # gather; megapixel maps (round 5) go to the tiled HBM big table
    env = ()
    env_big = False
    if st.n_env:
        eimg = int(np.asarray(pack.env_img)[0])
        ew = int(np.asarray(pack.img_w)[eimg])
        eh = int(np.asarray(pack.img_h)[eimg])
        edata = np.asarray(pack.img_atlas)[eimg, :eh, :ew]
        if ew * eh <= _IMG_MAX_TEXELS:
            n_rows_e = -(-(ew * eh) // LANES)
            erow0 = img_tab.shape[0]
            blocks = []
            for c in range(3):
                buf = np.zeros(n_rows_e * LANES, np.float32)
                buf[:ew * eh] = edata[..., c].reshape(-1)
                blocks.append(buf.reshape(n_rows_e, LANES))
            img_tab = np.concatenate([np.asarray(img_tab)] + blocks, axis=0)
            env = (ew, eh, erow0, n_rows_e)
        else:
            env_big = True
            tiled, tiles_x = _tile_big_image(edata)
            erow0 = sum(b.shape[0] for b in big_rows)
            big_rows.append(tiled)
            env = (ew, eh, erow0, tiles_x)

    # big table: pad with a full DMA window of zero rows so the windowed
    # gather's [rmin, rmin + _BIG_WN) slice never overruns
    big_tab = None
    if big_rows:
        big_tab = np.concatenate(
            big_rows + [np.zeros((_BIG_WN, LANES), np.float32)], axis=0)

    # HBM-streamed geometry: pad the table to whole stream chunks so the
    # per-chunk DMA never overruns (padding rows are degenerate: det == 0
    # -> invalid) and to the full 128-lane minor dim — Mosaic requires HBM
    # memref slices aligned to the (1,128) tiling, so the DMA must move
    # whole lane rows.  COARSE cull boxes (one per STREAM_CHUNK of faces,
    # union of its fine boxes) append to ctab at rows [n_chunks,
    # n_chunks + n_sc) — the kernel tests the coarse box first and only
    # pays the fine culls where it passes (round 5)
    if stream_geo:
        pad_rows = (-tab.shape[0]) % STREAM_CHUNK
        pad_cols = LANES - n_cols
        tab = np.pad(tab, ((0, pad_rows), (0, pad_cols)))
        r_sc = STREAM_CHUNK // STREAM_FINE
        n_sc = -(-n_chunks // r_sc)
        coarse = np.zeros((n_sc, 8), np.float32)
        for si in range(n_sc):
            f = ctab[si * r_sc:(si + 1) * r_sc]
            coarse[si, 0:3] = f[:, 0:3].min(axis=0)
            coarse[si, 3:6] = f[:, 3:6].max(axis=0)
        ctab = np.concatenate([ctab, coarse], axis=0)

    mc = MegaConsts(
        n_tri=w,
        spheres=tuple(spheres),
        materials=tuple(materials),
        point_lights=plights,
        dir_lights=tuple(dlights),
        spot_lights=slights,
        area_lights=alights,
        ambient=tup(pack.ambient_light),
        bg=tup(pack.bg_color),
        eps=float(np.asarray(pack.shadow_eps)),
        max_depth=int(max_depth),
        has_mirror=st.has_mirror,
        has_dielectric=st.has_dielectric,
        has_conductor=st.has_conductor,
        stack_k=stack_k,
        max_iters=max_iters,
        pt=bool(opts.path_tracing),
        pt_importance=bool(opts.importance_sampling),
        pt_nee=bool(opts.next_event_estimation),
        pt_rr=bool(opts.russian_roulette),
        rr_floor=rr_floor,
        has_emissive=st.has_emissive_mat,
        mesh_lights=tuple(mesh_lights),
        host_rng=host_rng,
        n_draws=n_draws,
        has_rough=has_rough,
        has_motion=st.has_motion,
        perlin_textures=perlin_tex,
        perlin_diff=p_diff,
        perlin_spec=p_spec,
        perlin_bump=p_bump,
        image_textures=image_tex,
        img_diff=i_diff,
        img_spec=i_spec,
        img_ra=i_ra,
        img_normal=i_nm,
        img_bump=i_bump,
        has_tbn=has_tbn,
        tbn_obj=tbn_obj,
        stream_geo=stream_geo,
        env=env,
        big_textures=big_tex,
        env_big=env_big,
        bg_tex=int(getattr(st, "bg_tex", -1)) if has_tex else -1,
        # per sphere: (diffuse, specular, replace_all, bump slots,
        # bump-texture normalizer — the sphere grey path divides by it,
        # sphere.cpp:138-167)
        sph_tex=tuple(
            (int(sph_tex_np[i, 0]), int(sph_tex_np[i, 1]),
             int(sph_tex_np[i, 4]), int(sph_tex_np[i, 3]),
             float(np.asarray(pack.tex_normalizer)[
                 max(int(sph_tex_np[i, 3]), 0)]))
            for i in range(st.n_spheres)) if has_tex else (),
    )
    img_out = jnp.asarray(img_tab)
    if big_tab is not None:
        # big table rides along as the second element of the img slot (the
        # call-site plumbing passes it opaquely; mega_trace_flat unpacks)
        img_out = (img_out, jnp.asarray(big_tab))
    return mc, jnp.asarray(tab), jnp.asarray(ctab), img_out


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tri_ref,
            chunk_ref, seed_ref, rng_ref, *rest, mc: MegaConsts):
    rest = list(rest)
    has_big = bool(mc.big_textures) or mc.env_big
    perm_ref = rest.pop(0) if mc.perlin_textures else None
    img_ref = rest.pop(0) if (mc.image_textures or mc.env) else None
    big_ref = rest.pop(0) if has_big else None
    # pixel-uv planes for the replace_background decal (texture.h:49-52)
    pu_ref = rest.pop(0) if mc.bg_tex >= 0 else None
    pv_ref = rest.pop(0) if mc.bg_tex >= 0 else None
    lx_ref, ly_ref, lz_ref = rest[:3]
    scr_at = 3
    if mc.stream_geo:
        geo_scr, geo_sem = rest[scr_at], rest[scr_at + 1]
        scr_at += 2
    if has_big:
        big_scr, big_sem = rest[scr_at], rest[scr_at + 1]

    # geometry accessor: the sweeps read faces through _geo so the streaming
    # chunk loop can rebind them to the DMA'd VMEM scratch slots (local
    # indices) while resident scenes read tri_ref directly (global indices)
    _geo = {"ref": tri_ref}

    def gref(ti, col):
        return _geo["ref"][ti, col]
    shape = (ROWS, LANES)
    ZERO = jnp.zeros(shape, jnp.float32)
    ONE = jnp.ones(shape, jnp.float32)
    FALSE = jnp.zeros(shape, jnp.bool_)

    def norm3(x, y, z):
        inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
        return x * inv, y * inv, z * inv

    def powmax(base, e):
        """pow with base clamped > 0 and C-style pow(0, 0) = 1
        (matches ops/brdf.py::_powmax)."""
        pos = base > 0.0
        safe = jnp.where(pos, base, 1.0)
        val = jnp.exp(e * jnp.log(safe))
        return jnp.where(pos, val, jnp.where(e == 0.0, 1.0, 0.0))

    needs_rng = (mc.pt or len(mc.mesh_lights) > 0 or len(mc.area_lights) > 0
                 or mc.has_rough or mc.has_motion or bool(mc.env))
    if needs_rng and not mc.host_rng:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    def rnd(it, slot: int):
        """One uniform [0,1) draw per lane.  Compiled: on-chip PRNG (draw
        order irrelevant).  host_rng (interpret/tests): indexed from the
        pre-generated table by (iteration, slot)."""
        if mc.host_rng:
            idx = jnp.minimum(it, mc.max_iters - 1) * mc.n_draws + slot
            return rng_ref[idx]
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        return (bits & jnp.int32(0x7FFFFF)).astype(jnp.float32) \
            * (1.0 / (1 << 23))

    def onb(nx, ny, nz):
        """Axis-swap orthonormal basis (GetOrthonormalBasis,
        helperMath.cpp:59-85; matches utils/math3d.py tie-breaking)."""
        ax, ay, az = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
        use_x = (ax < ay) & (ax < az)
        use_y = (~(ax < ay)) & (ay < az)
        use_z = ~(use_x | use_y)
        rpx = jnp.where(use_x, 1.0, nx)
        rpy = jnp.where(use_y, 1.0, ny)
        rpz = jnp.where(use_z, 1.0, nz)
        # u = unit(r' x n), v = unit(n x u)
        ux = rpy * nz - rpz * ny
        uy = rpz * nx - rpx * nz
        uz = rpx * ny - rpy * nx
        ux, uy, uz = norm3(ux, uy, uz)
        vx_ = ny * uz - nz * uy
        vy_ = nz * ux - nx * uz
        vz_ = nx * uy - ny * ux
        return (ux, uy, uz), norm3(vx_, vy_, vz_)

    # ---- procedural Perlin textures (ops/texture.py::perlin_sample <-
    # src/perlinTexture.h:76-133) ----
    if mc.perlin_textures:
        _pt = perm_ref[:, :]
        # the 512-entry table as four pre-broadcast (8,128) rows; perm[idx]
        # becomes a lane-wise take_along_axis masked by idx's row — the only
        # gather form Mosaic lowers (sublane gathers are unsupported)
        _perm_rows = [jnp.broadcast_to(_pt[r:r + 1, :], shape)
                      for r in range(4)]

        def perm_gather(idx_f):
            idx = idx_f.astype(jnp.int32)
            lane = jnp.bitwise_and(idx, 127)
            row = jnp.right_shift(idx, 7)
            out = ZERO
            for r in range(4):
                g = jnp.take_along_axis(_perm_rows[r], lane, axis=1)
                out = out + jnp.where(row == r, g, 0.0)
            return out

        def fade_w(x):
            # 1 - (6|x|^5 - 15|x|^4 + 10|x|^3), 0 beyond 1
            # (perlinTexture.h:147-155)
            x = jnp.abs(x)
            x2 = x * x
            x3 = x2 * x
            w = -6.0 * x3 * x2 + 15.0 * x3 * x - 10.0 * x3 + 1.0
            return jnp.where(x > 1.0, 0.0, w)

        def perlin_unit(px, py, pz, scale: float, conv: int):
            """Converted Perlin sample in [0,1] at (8,128) world positions.
            Gradient components are derived arithmetically from the hash
            (the classic 12-vector table has components in {-1,0,1})."""
            px = px * scale
            py = py * scale
            pz = pz * scale
            fx = jnp.floor(px)
            fy = jnp.floor(py)
            fz = jnp.floor(pz)
            ddx = px - fx
            ddy = py - fy
            ddz = pz - fz
            cx = jnp.bitwise_and(fx.astype(jnp.int32), 255).astype(jnp.float32)
            cy = jnp.bitwise_and(fy.astype(jnp.int32), 255).astype(jnp.float32)
            cz = jnp.bitwise_and(fz.astype(jnp.int32), 255).astype(jnp.float32)
            total = ZERO
            for ox_ in (0.0, 1.0):
                for oy_ in (0.0, 1.0):
                    for oz_ in (0.0, 1.0):
                        h = perm_gather(cx + ox_ + perm_gather(
                            cy + oy_ + perm_gather(cz + oz_)))
                        h = h - 12.0 * jnp.floor(h / 12.0)  # % 12
                        k = h - jnp.where(h >= 8.0, 8.0,
                                          jnp.where(h >= 4.0, 4.0, 0.0))
                        s0 = 1.0 - 2.0 * (k - 2.0 * jnp.floor(k / 2.0))
                        s1 = 1.0 - 2.0 * jnp.floor(k / 2.0)
                        gx = jnp.where(h < 8.0, s0, 0.0)
                        gy = jnp.where(h < 4.0, s1,
                                       jnp.where(h >= 8.0, s0, 0.0))
                        gz = jnp.where(h < 4.0, 0.0, s1)
                        c = (gx * (ddx - ox_) + gy * (ddy - oy_)
                             + gz * (ddz - oz_))
                        w = fade_w(ddx - ox_) * fade_w(ddy - oy_) \
                            * fade_w(ddz - oz_)
                        total = total + w * c
            if conv:
                return jnp.abs(total)
            return (total + 1.0) * 0.5

    # ---- LDR image textures (ImageTexture, src/imageTexture.h:60-133) ----
    if mc.image_textures:

        def tile_uv_k(x):
            """UV tiling (Mesh::GetFloorForTiledUV, src/mesh.cpp:382-389;
            matches ops/texture.py::tile_uv)."""
            frac = x - jnp.floor(x)
            frac = jnp.where(frac < 0.0001, 1.0, frac)
            return jnp.where(x > 1.0001, frac, x)

        def img_sample(ti_, uu, vv, raw=False):
            """RGB at tiled UV for texture ti_ (scaled by 1/255 unless
            ``raw``): nearest (imageTexture.h:60-70) or bilinear with
            edge-clamped +1 taps (imageTexture.h:77-133 via
            ops/texture.py::sample_bilinear).  Texels live in the packed f32
            pool (r + 256 g + 65536 b) and are fetched with the same
            row-masked lane-wise take_along_axis gather as the Perlin perm
            table — n_rows masked vector ops per tap."""
            interp, _blend, iw, ih, row0, n_rows, _bf = \
                mc.image_textures[ti_]
            fw, fh = float(iw), float(ih)
            if interp == 0:  # nearest
                i_ = jnp.clip(jnp.floor(uu * fw), 0.0, fw - 1.0)
                j_ = jnp.clip(jnp.floor(vv * fh), 0.0, fh - 1.0)
                flats = [j_ * fw + i_]
                wts = None
            else:  # bilinear
                fi = jnp.clip(uu * fw, 0.0, fw - 1.0)
                fj = jnp.clip(vv * fh, 0.0, fh - 1.0)
                p_ = jnp.floor(fi)
                q_ = jnp.floor(fj)
                dx_ = fi - p_
                dy_ = fj - q_
                p1 = jnp.minimum(p_ + 1.0, fw - 1.0)
                q1 = jnp.minimum(q_ + 1.0, fh - 1.0)
                flats = [q_ * fw + p_, q_ * fw + p1,
                         q1 * fw + p_, q1 * fw + p1]
                wts = [(1.0 - dx_) * (1.0 - dy_), dx_ * (1.0 - dy_),
                       (1.0 - dx_) * dy_, dx_ * dy_]
            idxs = [f.astype(jnp.int32) for f in flats]
            lanes = [jnp.bitwise_and(ii, 127) for ii in idxs]
            rows = [jnp.right_shift(ii, 7) for ii in idxs]
            outs = [ZERO for _ in flats]
            for r in range(n_rows):
                brow = jnp.broadcast_to(
                    img_ref[row0 + r:row0 + r + 1, :], shape)
                for k in range(len(flats)):
                    g = jnp.take_along_axis(brow, lanes[k], axis=1)
                    outs[k] = outs[k] + jnp.where(rows[k] == r, g, 0.0)
            rgbs = []
            for v_ in outs:  # unpack (all arithmetic exact in f32: < 2^24)
                b_ = jnp.floor(v_ * (1.0 / 65536.0))
                rem = v_ - b_ * 65536.0
                g_ = jnp.floor(rem * (1.0 / 256.0))
                rgbs.append((rem - g_ * 256.0, g_, b_))
            if wts is None:
                r_, g_, b_ = rgbs[0]
            else:
                r_ = sum(w_ * c[0] for w_, c in zip(wts, rgbs))
                g_ = sum(w_ * c[1] for w_, c in zip(wts, rgbs))
                b_ = sum(w_ * c[2] for w_, c in zip(wts, rgbs))
            if raw:
                return r_, g_, b_
            s = 1.0 / 255.0  # raytracer.cpp:494 normalization
            return r_ * s, g_ * s, b_ * s

        def img_grey_at(ti_, ii, jj):
            """Mean-channel greyscale at INTEGER texel coords (the image
            bump path's taps, mesh.cpp:317-329: greyscale = (r+g+b)/3, no
            normalizer)."""
            _interp, _b, iw, ih, row0, n_rows, _bf = mc.image_textures[ti_]
            idx = (jj * iw + ii).astype(jnp.int32)
            lane = jnp.bitwise_and(idx, 127)
            row = jnp.right_shift(idx, 7)
            out = ZERO
            for r in range(n_rows):
                brow = jnp.broadcast_to(
                    img_ref[row0 + r:row0 + r + 1, :], shape)
                g = jnp.take_along_axis(brow, lane, axis=1)
                out = out + jnp.where(row == r, g, 0.0)
            b_ = jnp.floor(out * (1.0 / 65536.0))
            rem = out - b_ * 65536.0
            g_ = jnp.floor(rem * (1.0 / 256.0))
            return (rem - g_ * 256.0 + g_ + b_) * (1.0 / 3.0)

    # ---- megapixel / HDR image textures (round 5): HBM windowed gather ----
    # Texels live in the HBM big table in 8x16-texel tiles (3 channel rows
    # per tile, see _tile_big_image).  Taps are served by a block-coherent
    # loop: DMA the _BIG_WN-row window at the minimum outstanding row into
    # the VMEM scratch, lane-gather every tap that falls inside, repeat
    # until all lanes are served.  Progress is guaranteed (each window
    # serves at least the min-row lane); lanes with need=False start
    # served.  Validated + timed on hardware by tools/probe_bigtex.py.
    if has_big:
        _BIG_MAX_START = float(int(big_ref.shape[0]) - _BIG_WN)

        def big_serve(rows, lanes, needs):
            """rows/lanes: (8,128) i32 per tap; needs: bool masks.  Returns
            one f32 array per tap (0 where not needed).  Served masks are
            f32 — Mosaic miscompiles (8,128) i1 loop carries."""
            n = len(rows)
            outs0 = tuple(ZERO for _ in range(n))
            served0 = tuple(jnp.where(m, 0.0, 1.0) for m in needs)

            def cond(c):
                m = c[n]
                for s in c[n + 1:]:
                    m = jnp.minimum(m, s)
                return jnp.min(m) < 0.5

            def body(c):
                outs = list(c[:n])
                served = list(c[n:])
                rf = jnp.full(shape, 3.0e9)
                for r, s in zip(rows, served):
                    rf = jnp.minimum(
                        rf, jnp.where(s > 0.5, 3.0e9,
                                      r.astype(jnp.float32)))
                rmin = jnp.minimum(jnp.min(rf),
                                   _BIG_MAX_START).astype(jnp.int32)
                cp = pltpu.make_async_copy(
                    big_ref.at[pl.ds(rmin, _BIG_WN), :], big_scr, big_sem)
                cp.start()
                cp.wait()
                for r_ in range(_BIG_WN):
                    brow = jnp.broadcast_to(big_scr[r_:r_ + 1, :], shape)
                    for k in range(n):
                        g = jnp.take_along_axis(brow, lanes[k], axis=1)
                        m = (rows[k] == rmin + r_) & (served[k] < 0.5)
                        outs[k] = outs[k] + jnp.where(m, g, 0.0)
                        served[k] = jnp.maximum(
                            served[k], jnp.where(m, 1.0, 0.0))
                return tuple(outs) + tuple(served)

            res = jax.lax.while_loop(cond, body, outs0 + served0)
            return list(res[:n])

        def _big_rowlane(meta, i_, j_):
            """Integer texel coords -> (3 channel rows, lane) in the big
            table for texture metadata (.., tiles_x, row0, ..)."""
            tiles_x, row0 = meta[4], meta[5]
            tile = (j_ >> 3) * tiles_x + (i_ >> 4)
            base = row0 + tile * 3
            lane = ((j_ & 7) << 4) + (i_ & 15)
            return base, lane

        def big_img_sample(ti_, uu, vv, need, raw=False):
            """RGB at tiled UV for big texture ti_ — same nearest/bilinear
            + edge-clamp semantics as img_sample (imageTexture.h:60-133),
            raw HDR values (scaled 1/255 unless ``raw``, matching the
            wavefront's raytracer.cpp:494 normalization)."""
            interp, _bl, iw, ih, _tx, _r0, _bf = mc.big_textures[ti_]
            meta = mc.big_textures[ti_]
            fw, fh = float(iw), float(ih)
            if interp == 0:  # nearest
                i_ = jnp.clip(jnp.floor(uu * fw), 0.0, fw - 1.0) \
                    .astype(jnp.int32)
                j_ = jnp.clip(jnp.floor(vv * fh), 0.0, fh - 1.0) \
                    .astype(jnp.int32)
                taps = [(i_, j_)]
                wts = None
            else:  # bilinear
                fi = jnp.clip(uu * fw, 0.0, fw - 1.0)
                fj = jnp.clip(vv * fh, 0.0, fh - 1.0)
                p_ = jnp.floor(fi)
                q_ = jnp.floor(fj)
                dx_ = fi - p_
                dy_ = fj - q_
                p0 = p_.astype(jnp.int32)
                q0 = q_.astype(jnp.int32)
                p1 = jnp.minimum(p0 + 1, iw - 1)
                q1 = jnp.minimum(q0 + 1, ih - 1)
                taps = [(p0, q0), (p1, q0), (p0, q1), (p1, q1)]
                wts = [(1.0 - dx_) * (1.0 - dy_), dx_ * (1.0 - dy_),
                       (1.0 - dx_) * dy_, dx_ * dy_]
            rows, lanes, needs = [], [], []
            for (i_, j_) in taps:
                base, lane = _big_rowlane(meta, i_, j_)
                for c in range(3):
                    rows.append(base + c)
                    lanes.append(lane)
                    needs.append(need)
            vals = big_serve(rows, lanes, needs)
            if wts is None:
                r_, g_, b_ = vals[0], vals[1], vals[2]
            else:
                r_ = sum(w_ * vals[3 * k] for k, w_ in enumerate(wts))
                g_ = sum(w_ * vals[3 * k + 1] for k, w_ in enumerate(wts))
                b_ = sum(w_ * vals[3 * k + 2] for k, w_ in enumerate(wts))
            if raw:
                return r_, g_, b_
            s = 1.0 / 255.0
            return r_ * s, g_ * s, b_ * s

        def big_img_grey3(ti_, coords, need):
            """Mean-channel greyscale at three INTEGER texel coords (the
            image-bump taps, mesh.cpp:317-329) in ONE serve loop."""
            meta = mc.big_textures[ti_]
            rows, lanes, needs = [], [], []
            for (i_, j_) in coords:
                base, lane = _big_rowlane(meta, i_, j_)
                for c in range(3):
                    rows.append(base + c)
                    lanes.append(lane)
                    needs.append(need)
            vals = big_serve(rows, lanes, needs)
            return [(vals[3 * k] + vals[3 * k + 1] + vals[3 * k + 2])
                    * (1.0 / 3.0) for k in range(len(coords))]

        def _tex_is_big(ti_):
            return bool(mc.big_textures) and bool(mc.big_textures[ti_])

        def _tex_meta(ti_):
            return (mc.big_textures[ti_] if _tex_is_big(ti_)
                    else mc.image_textures[ti_])
    else:
        def _tex_is_big(ti_):
            return False

        def _tex_meta(ti_):
            return mc.image_textures[ti_]

    # ---- inverse-trig polynomials (shared by the env light's lat-long
    # lookup and round-5 sphere-texture UVs; Mosaic lowers no inverse-trig
    # primitive, so these are plain VPU polynomials) ----
    _sph_tex_any = any(s >= 0 for t in mc.sph_tex for s in t[:4])
    if mc.env or _sph_tex_any:
        _PI = float(np.pi)

        def _atan_core(z):
            """Cephes atanf polynomial, |z| <= tan(pi/8)."""
            zz = z * z
            return (((8.05374449538e-2 * zz - 1.38776856032e-1) * zz
                     + 1.99777106478e-1) * zz - 3.33329491539e-1) * zz * z \
                + z

        def _atan_pos(r):
            """atan(r) for r >= 0 via cephes range reduction (Mosaic lowers
            no inverse-trig primitive, so these are plain VPU polynomials;
            max error ~1e-7 rad — far below an env texel)."""
            big = r > 2.414213562373095
            mid = (r > 0.4142135623730950) & (~big)
            x = jnp.where(big, -1.0 / jnp.maximum(r, 1e-30),
                          jnp.where(mid, (r - 1.0) / (r + 1.0), r))
            y = jnp.where(big, _PI / 2.0, jnp.where(mid, _PI / 4.0, 0.0))
            return y + _atan_core(x)

        def atan2_k(yv, xv):
            ay, ax = jnp.abs(yv), jnp.abs(xv)
            swap = ay > ax
            num = jnp.minimum(ay, ax)
            den = jnp.maximum(jnp.maximum(ay, ax), 1e-30)
            base = _atan_pos(num / den)
            r = jnp.where(swap, _PI / 2.0 - base, base)
            a = jnp.where(xv < 0.0, _PI - r, r)
            return jnp.where(yv < 0.0, -a, a)

        def acos_k(t):
            return atan2_k(jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0)), t)

    # ---- spherical environment light (sphericalEnvironmentLight.h:8-64;
    # render/lights.py::env_sample_radiance) ----
    if mc.env:

        def env_fetch(uu, vv, need):
            """Nearest lat-long texel (ops/texture.py::sample_nearest): raw
            HDR rgb via the row-masked lane gather over the env channel
            blocks (small maps) or the HBM windowed gather (megapixel maps,
            round 5 — ``need`` gates which lanes pay for windows)."""
            ew, eh, erow0, enr = mc.env
            fw, fh = float(ew), float(eh)
            i_ = jnp.maximum(jnp.minimum((uu * fw).astype(jnp.int32),
                                         ew - 1), 0)
            j_ = jnp.maximum(jnp.minimum((vv * fh).astype(jnp.int32),
                                         eh - 1), 0)
            if mc.env_big:
                # env meta reinterprets as (w, h, row0, tiles_x)
                base, lane = _big_rowlane((0, 0, ew, eh, enr, erow0), i_, j_)
                vals = big_serve([base, base + 1, base + 2],
                                 [lane, lane, lane], [need, need, need])
                return vals[0], vals[1], vals[2]
            idx = j_ * ew + i_
            lane = jnp.bitwise_and(idx, 127)
            row = jnp.right_shift(idx, 7)
            out = [ZERO, ZERO, ZERO]
            for c in range(3):
                for rr_ in range(enr):
                    brow = jnp.broadcast_to(
                        img_ref[erow0 + c * enr + rr_:
                                erow0 + c * enr + rr_ + 1, :], shape)
                    g = jnp.take_along_axis(brow, lane, axis=1)
                    out[c] = out[c] + jnp.where(row == rr_, g, 0.0)
            return out[0], out[1], out[2]

        def env_radiance(vx, vy, vz, need):
            """Lat-long lookup * 2pi at an (unnormalized) direction
            (GetSample, sphericalEnvironmentLight.h:22-35)."""
            u = (1.0 + atan2_k(vx, -vz) / _PI) / 2.0
            v = acos_k(jnp.clip(vy, -1.0, 1.0)) / _PI
            er, eg, eb = env_fetch(u, v, need)
            s = 2.0 * _PI
            return er * s, eg * s, eb * s

    def sphere_local(s, px, py, pz, vx, vy, vz, is_point):
        """Apply sphere s's packed world->object transform."""
        m = s[0]
        t = 1.0 if is_point else 0.0
        lx = m[0] * px + m[1] * py + m[2] * pz + m[3] * t
        ly = m[4] * px + m[5] * py + m[6] * pz + m[7] * t
        lz = m[8] * px + m[9] * py + m[10] * pz + m[11] * t
        return lx, ly, lz

    def tri_hit(ti, px, py, pz, vx, vy, vz):
        """Cramer's-rule triangle test for triangle `ti` against the block
        (Mesh::IntersectFace semantics, src/mesh.cpp:201-236).
        Returns (t, valid, beta, gamma) — the barycentrics feed UV
        interpolation for image textures (mesh.cpp:244-262).
        Motion blur: the per-face world-space motion
        offsets the ray origin by +motion*time (equivalence argument in
        ops/traverse.py; mesh.cpp:167-170)."""
        if mc.has_motion:
            px = px + gref(ti, 16) * tau
            py = py + gref(ti, 17) * tau
            pz = pz + gref(ti, 18) * tau
        v0x = gref(ti, 0)
        v0y = gref(ti, 1)
        v0z = gref(ti, 2)
        e1x = v0x - gref(ti, 3)
        e1y = v0y - gref(ti, 4)
        e1z = v0z - gref(ti, 5)
        e2x = v0x - gref(ti, 6)
        e2y = v0y - gref(ti, 7)
        e2z = v0z - gref(ti, 8)
        bx = v0x - px
        by = v0y - py
        bz = v0z - pz
        m0 = e2y * vz - vy * e2z
        m1 = e2x * vz - vx * e2z
        m2 = e2x * vy - vx * e2y
        det_a = e1x * m0 - e1y * m1 + e1z * m2
        safe = jnp.where(det_a == 0.0, 1.0, det_a)
        beta = (bx * m0 - by * m1 + bz * m2) / safe
        n0 = by * vz - vy * bz
        n1 = bx * vz - vx * bz
        n2 = bx * vy - vx * by
        gamma = (e1x * n0 - e1y * n1 + e1z * n2) / safe
        q0 = e2y * bz - by * e2z
        q1 = e2x * bz - bx * e2z
        q2 = e2x * by - bx * e2y
        t = (e1x * q0 - e1y * q1 + e1z * q2) / safe
        valid = (
            (det_a != 0.0) & (beta >= 0.0) & (gamma >= 0.0)
            & (beta + gamma <= 1.0) & (t > 0.0)
        )
        return t, valid, beta, gamma

    def sphere_hit(s, px, py, pz, vx, vy, vz):
        """Quadratic sphere test (Sphere::Intersect, src/sphere.cpp:31-72).
        Returns (t, valid, world-normal xyz (unnormalized), local
        hit - center xyz — the latter feeds round-5 spherical UVs)."""
        olx, oly, olz = sphere_local(s, px, py, pz, vx, vy, vz, True)
        dlx, dly, dlz = sphere_local(s, vx, vy, vz, vx, vy, vz, False)
        if mc.has_motion:
            mo = s[5]
            olx = olx + mo[0] * tau
            oly = oly + mo[1] * tau
            olz = olz + mo[2] * tau
        c = s[2]
        rad = s[3]
        ocx, ocy, ocz = olx - c[0], oly - c[1], olz - c[2]
        a = dlx * dlx + dly * dly + dlz * dlz
        b = 2.0 * (dlx * ocx + dly * ocy + dlz * ocz)
        cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        delta = b * b - 4.0 * a * cc
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        denom = jnp.where(a > 0.0, 2.0 * a, 1.0)
        t1 = (-b + sq) / denom
        t2 = (-b - sq) / denom
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        t = jnp.where(lo > 0.0, lo, hi)
        valid = (delta >= 0.0) & (t > 0.0) & (a > 0.0)
        # object-space normal direction, then M^-T (sphere.cpp:66-80)
        prx = ocx + t * dlx
        pry = ocy + t * dly
        prz = ocz + t * dlz
        nm = s[1]
        nwx = nm[0] * prx + nm[1] * pry + nm[2] * prz
        nwy = nm[3] * prx + nm[4] * pry + nm[5] * prz
        nwz = nm[6] * prx + nm[7] * pry + nm[8] * prz
        return t, valid, nwx, nwy, nwz, prx, pry, prz

    FG = STREAM_FINE if mc.stream_geo else CHUNK
    n_chunks = (mc.n_tri + FG - 1) // FG

    def chunk_sweep(px, py, pz, vx, vy, vz, body, init, live_of):
        """Iterate triangles in CHUNK-sized spatially-coherent groups,
        skipping a whole chunk when no lane's ray segment can enter its AABB
        (slab test, BoundingBox semantics of shape.hpp:78-100).  ``live_of``
        maps the running carry to the per-lane reject distance (0 for lanes
        that no longer need triangles, e.g. already-blocked shadow lanes)."""
        if n_chunks <= 1:
            return jax.lax.fori_loop(0, mc.n_tri, body, init)
        ivx = 1.0 / vx
        ivy = 1.0 / vy
        ivz = 1.0 / vz

        def cull(ci, t_b):
            t1 = (chunk_ref[ci, 0] - px) * ivx
            t2 = (chunk_ref[ci, 3] - px) * ivx
            tmin = jnp.minimum(t1, t2)
            tmax = jnp.maximum(t1, t2)
            t1 = (chunk_ref[ci, 1] - py) * ivy
            t2 = (chunk_ref[ci, 4] - py) * ivy
            tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
            tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
            t1 = (chunk_ref[ci, 2] - pz) * ivz
            t2 = (chunk_ref[ci, 5] - pz) * ivz
            tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
            tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
            return (tmax > 0) & (tmax >= tmin) & (tmin < t_b)

        if mc.stream_geo:
            # HBM-streamed, TWO-LEVEL (round 5): one STREAM_CHUNK-face DMA
            # when any of its 128-face sub-chunks survives the fine cull,
            # then per-SUB-chunk culled sweeps over the scratch — the DMA
            # amortizes its latency over 4x the faces while sweep culling
            # keeps the round-4 128-face granularity.  Start/wait/sweep
            # stay inside ONE lax.cond on ONE scratch: splitting them
            # across sibling conds (or double-buffering two scratches)
            # produced stale scratch reads in both the interpreter's state
            # discharge AND compiled Mosaic — measured wrong images,
            # reverted.
            R_ = STREAM_CHUNK // FG

            def sc_body(sci, carry):
                t_b = live_of(carry)
                base_c = sci * R_
                # coarse box first (ctab row n_chunks + sci): one slab
                # test gates this super-chunk's 16 fine culls + DMA
                coarse_enter = jnp.any(cull(n_chunks + sci, t_b))

                def run(c):
                    preds = []
                    for j in range(R_):
                        cj = jnp.minimum(base_c + j, n_chunks - 1)
                        preds.append(jnp.any(cull(cj, t_b))
                                     & (base_c + j < n_chunks))
                    cp = pltpu.make_async_copy(
                        tri_ref.at[pl.ds(sci * STREAM_CHUNK,
                                         STREAM_CHUNK), :],
                        geo_scr, geo_sem)
                    cp.start()
                    cp.wait()
                    _geo["ref"] = geo_scr
                    for j in range(R_):
                        c = jax.lax.cond(
                            preds[j],
                            lambda cc, j=j: jax.lax.fori_loop(
                                j * FG, (j + 1) * FG, body, cc),
                            lambda cc: cc, c)
                    _geo["ref"] = tri_ref
                    return c

                return jax.lax.cond(coarse_enter, run, lambda c: c, carry)

            n_sc = (mc.n_tri + STREAM_CHUNK - 1) // STREAM_CHUNK
            return jax.lax.fori_loop(0, n_sc, sc_body, init)

        def chunk_body(ci, carry):
            enter = cull(ci, live_of(carry))
            lo = ci * CHUNK
            hi = jnp.minimum(lo + CHUNK, mc.n_tri)
            return jax.lax.cond(
                jnp.any(enter),
                lambda c: jax.lax.fori_loop(lo, hi, body, c),
                lambda c: c,
                carry,
            )

        return jax.lax.fori_loop(0, n_chunks, chunk_body, init)

    def trace(px, py, pz, vx, vy, vz, active):
        """Closest hit over all VMEM triangles + const spheres for lanes in
        ``active``.  Returns (t, nx, ny, nz (unit), matf, hit).

        Inactive lanes start with reject distance 0, so they never keep a
        culling chunk alive — as a block's shading tree dies down, whole
        triangle chunks stop being swept."""
        per = bool(mc.perlin_textures) or bool(mc.image_textures)
        n_slots = (5 if (mc.img_ra or mc.img_normal) else 3) if per else 0
        needs_tbn = mc.has_tbn
        tbn_n = 18 if mc.tbn_obj else 6
        needs_uv = bool(mc.img_diff or mc.img_spec or mc.img_ra
                        or mc.img_normal or mc.img_bump)
        tbn_at = 6 + n_slots
        neg1 = jnp.full(shape, -1.0)
        init = (jnp.where(active, BIG, 0.0), ZERO, ZERO, ONE, ZERO, neg1) \
            + (neg1,) * n_slots \
            + ((ZERO,) * tbn_n if needs_tbn else ()) \
            + ((ZERO, ZERO) if needs_uv else ())

        def body(ti, carry):
            t_b, nx, ny, nz, mf, ml = carry[:6]
            t, valid, beta, gamma = tri_hit(ti, px, py, pz, vx, vy, vz)
            better = valid & (t < t_b)
            out = (
                jnp.where(better, t, t_b),
                jnp.where(better, gref(ti, 9), nx),
                jnp.where(better, gref(ti, 10), ny),
                jnp.where(better, gref(ti, 11), nz),
                jnp.where(better, gref(ti, 12), mf),
                jnp.where(better, gref(ti, 13), ml),
            )
            out = out + tuple(
                jnp.where(better, gref(ti, 19 + k), carry[6 + k])
                for k in range(n_slots))
            if needs_tbn:
                out = out + tuple(
                    jnp.where(better, gref(ti, 30 + k), carry[tbn_at + k])
                    for k in range(tbn_n))
            if needs_uv:
                # uv = uv0 + beta (uv1-uv0) + gamma (uv2-uv0), untiled
                # (_gather_tri_uv; tiling happens once on the winner)
                u0 = gref(ti, 24)
                v0 = gref(ti, 25)
                ui = u0 + beta * (gref(ti, 26) - u0) \
                    + gamma * (gref(ti, 28) - u0)
                vi = v0 + beta * (gref(ti, 27) - v0) \
                    + gamma * (gref(ti, 29) - v0)
                out = out + (jnp.where(better, ui, carry[-2]),
                             jnp.where(better, vi, carry[-1]))
            return out

        if mc.n_tri > 0:
            init = chunk_sweep(px, py, pz, vx, vy, vz, body, init,
                               live_of=lambda c: c[0])
        t_b, nx, ny, nz, mf, ml = init[:6]
        tslots = init[6:6 + n_slots] if per else None
        tbn = init[tbn_at:tbn_at + tbn_n] if needs_tbn else None
        uv = init[-2:] if needs_uv else None
        for si, s in enumerate(mc.spheres):
            t, valid, nwx, nwy, nwz, prx, pry, prz = sphere_hit(
                s, px, py, pz, vx, vy, vz)
            s_slots = (mc.sph_tex[si] if mc.sph_tex
                       else (-1, -1, -1, -1, 255.0))
            if any(x >= 0 for x in s_slots[:4]):
                # spherical UV from the local hit (sphere.cpp:138-167;
                # surface_at: phi = atan2(z, x), theta = acos(clip(
                # y/r, ±0.999999)), u = (-phi+pi)/2pi, v = theta/pi)
                phi_s = atan2_k(prz, prx)
                th_s = acos_k(jnp.clip(pry / s[3], -0.999999, 0.999999))
                u_sph = (-phi_s + _PI) / (2.0 * _PI)
                v_sph = th_s / _PI
            else:
                u_sph = v_sph = 0.0
            bti = int(s_slots[3])
            if bti >= 0:
                # sphere BUMP at intersect time, in OBJECT space, exactly
                # like Sphere::Intersect (sphere.cpp:116-169) as
                # implemented by shading.py's sphere path: analytic
                # tangents from the local frame, n_base = cross(bitan,
                # tan), then M^-T to world
                twopi = 2.0 * _PI
                tnx_, tny_, tnz_ = norm3(twopi * prz, ZERO, -twopi * prx)
                cph = jnp.cos(phi_s)
                sph_ = jnp.sin(phi_s)
                sth = jnp.sin(th_s)
                bx_, by_, bz_ = norm3(_PI * pry * cph,
                                      -float(s[3]) * _PI * sth,
                                      _PI * pry * sph_)
                nbx, nby, nbz = norm3(by_ * tnz_ - bz_ * tny_,
                                      bz_ * tnx_ - bx_ * tnz_,
                                      bx_ * tny_ - by_ * tnx_)
                is_img_b = bool(
                    (mc.image_textures and mc.image_textures[bti])
                    or (mc.big_textures and mc.big_textures[bti]))
                if not is_img_b:
                    # perlin bump: local-frame gradient, NO bumpFactor
                    # (sphere.cpp:123-137; shading.py scale=1 for spheres)
                    nsc, cv, _bl, _bf = mc.perlin_textures[bti]
                    beps = 1e-3
                    h0 = perlin_unit(prx, pry, prz, nsc, cv)
                    gx_ = (perlin_unit(prx + beps, pry, prz, nsc, cv)
                           - h0) / beps
                    gy_ = (perlin_unit(prx, pry + beps, prz, nsc, cv)
                           - h0) / beps
                    gz_ = (perlin_unit(prx, pry, prz + beps, nsc, cv)
                           - h0) / beps
                    gpar = gx_ * nbx + gy_ * nby + gz_ * nbz
                    obx, oby, obz = norm3(nbx - (gx_ - gpar * nbx),
                                          nby - (gy_ - gpar * nby),
                                          nbz - (gz_ - gpar * nbz))
                else:
                    # image bump: sphere taps scale by w (not w-1) and the
                    # grey divides by the texture NORMALIZER, not 3
                    # (sphere.cpp:138-167; shading.py grey())
                    meta_sb = (mc.big_textures[bti]
                               if (mc.big_textures and mc.big_textures[bti])
                               else mc.image_textures[bti])
                    iwd, ihd, bf = meta_sb[2], meta_sb[3], meta_sb[6]
                    rescale = 3.0 / float(s_slots[4])
                    iw_ = jnp.clip((u_sph * float(iwd)).astype(jnp.int32),
                                   0, iwd - 1)
                    jh_ = jnp.clip((v_sph * float(ihd)).astype(jnp.int32),
                                   0, ihd - 1)
                    i1 = jnp.minimum(iw_ + 1, iwd - 1)
                    j1 = jnp.minimum(jh_ + 1, ihd - 1)
                    if mc.big_textures and mc.big_textures[bti]:
                        h_uv, h_du, h_dv = big_img_grey3(
                            bti, [(iw_, jh_), (i1, jh_), (iw_, j1)],
                            valid)
                    else:
                        h_uv = img_grey_at(bti, iw_, jh_)
                        h_du = img_grey_at(bti, i1, jh_)
                        h_dv = img_grey_at(bti, iw_, j1)
                    h_uv = h_uv * rescale
                    h_du = h_du * rescale
                    h_dv = h_dv * rescale
                    qux = tnx_ + nbx * ((h_du - h_uv) * bf)
                    quy = tny_ + nby * ((h_du - h_uv) * bf)
                    quz = tnz_ + nbz * ((h_du - h_uv) * bf)
                    qvx = bx_ + nbx * ((h_dv - h_uv) * bf)
                    qvy = by_ + nby * ((h_dv - h_uv) * bf)
                    qvz = bz_ + nbz * ((h_dv - h_uv) * bf)
                    obx, oby, obz = norm3(qvy * quz - qvz * quy,
                                          qvz * qux - qvx * quz,
                                          qvx * quy - qvy * qux)
                    # flip1 only: flip2 is mesh-only (shading.py:237)
                    flip1 = ((obx * nbx <= 0) & (oby * nby <= 0)
                             & (obz * nbz <= 0))
                    obx = jnp.where(flip1, -obx, obx)
                    oby = jnp.where(flip1, -oby, oby)
                    obz = jnp.where(flip1, -obz, obz)
                nm_ = s[1]
                nwx = nm_[0] * obx + nm_[1] * oby + nm_[2] * obz
                nwy = nm_[3] * obx + nm_[4] * oby + nm_[5] * obz
                nwz = nm_[6] * obx + nm_[7] * oby + nm_[8] * obz
            better = valid & (t < t_b) & active
            t_b = jnp.where(better, t, t_b)
            nx = jnp.where(better, nwx, nx)
            ny = jnp.where(better, nwy, ny)
            nz = jnp.where(better, nwz, nz)
            mf = jnp.where(better, float(s[4]), mf)
            ml = jnp.where(better, -1.0, ml)
            if per:
                # round 5: the winning sphere's static texture slots
                # (diffuse, specular, [ra]; the trace's bump already
                # applied above, and the reference's sphere normal-map
                # path is disabled, sphere.cpp:95-115 — both stay -1)
                vals = (float(s_slots[0]), float(s_slots[1]), -1.0,
                        float(s_slots[2]), -1.0)[:n_slots]
                tslots = tuple(
                    jnp.where(better, v_, s_)
                    for v_, s_ in zip(vals, tslots))
            if needs_uv:
                uv = (jnp.where(better, u_sph, uv[0]),
                      jnp.where(better, v_sph, uv[1]))
        hit = t_b < (BIG * 0.5)
        nx, ny, nz = norm3(nx, ny, nz)
        return t_b, nx, ny, nz, mf, ml, hit, tslots, tbn, uv

    def shadow(px, py, pz, vx, vy, vz, limit, gate):
        """Occlusion along unit direction v up to `limit` for lanes in
        ``gate`` (IsInShadow, src/raytracer.cpp:567-583).

        The carry is f32, not bool: Mosaic miscompiles (8,128) i1 vectors as
        loop carries (packed-mask layout mismatch).  Gated-off lanes start
        "already blocked" so they never keep a culling chunk alive."""
        def body(ti, blocked):
            t, valid, _, _ = tri_hit(ti, px, py, pz, vx, vy, vz)
            if mc.has_emissive:
                # CastShadowRay skips emissive meshes (raytracer.cpp:590-593)
                valid = valid & (gref(ti, 14) < 0.5)
            return jnp.maximum(
                blocked, jnp.where(valid & (t < limit), 1.0, 0.0))

        blocked = jnp.where(gate, 0.0, 1.0)
        if mc.n_tri > 0:
            # reject distance = the segment length; skip chunks once every
            # lane is already blocked
            blocked = chunk_sweep(
                px, py, pz, vx, vy, vz, body, blocked,
                live_of=lambda b: jnp.where(b > 0.5, 0.0, limit))
        out = blocked > 0.5
        for s in mc.spheres:
            t, valid = sphere_hit(s, px, py, pz, vx, vy, vz)[:2]
            out = out | (valid & (t < limit))
        return out

    def mat_mask(matf, mtype):
        m = FALSE
        for i, mat in enumerate(mc.materials):
            if mat[0] == mtype:
                m = m | (matf == float(i))
        return m

    def mat_field(matf, getter):
        """Unrolled masked select of a scalar material field."""
        out = jnp.full(shape, getter(mc.materials[0]))
        for i, mat in enumerate(mc.materials[1:], start=1):
            out = jnp.where(matf == float(i), getter(mat), out)
        return out

    def mat_field3(matf, getter):
        return tuple(
            mat_field(matf, lambda m, k=k: getter(m)[k]) for k in range(3)
        )

    # ---- primary rays of this block ----
    ox = ox_ref[:, :]
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]

    if mc.has_motion:
        tau = rnd(jnp.int32(0), mc.n_draws - 1)
    else:
        tau = None

    eps = mc.eps
    diel = mc.has_dielectric
    any_spec = (mc.has_mirror or mc.has_conductor or diel) and mc.max_depth > 0
    # the stack holds dielectric refraction legs and, in PT-with-specular
    # scenes, the GI children of lanes whose specular chain continues
    use_stack = diel or (mc.pt and any_spec)
    k_slots = mc.stack_k
    depth0 = jnp.full(shape, mc.max_depth, jnp.int32)

    # while-carry layout (all (8,128) unless noted):
    #   it scalar | L xyz | cur o xyz, d xyz, w xyz, absorb xyz, medium,
    #   depth i32, active (f32 mask: Mosaic miscompiles i1 loop carries) |
    #   [env scenes: cenv f32 mask — sample env on this ray's miss] |
    #   sp i32 + stack fields (K,8,128) x 14 (+ s_env) (diel only)
    carry = [jnp.int32(0), ZERO, ZERO, ZERO,
             ox, oy, oz, dx, dy, dz, ONE, ONE, ONE,
             ZERO, ZERO, ZERO, ONE, depth0, ONE]
    if mc.env:
        carry += [ZERO]
    if use_stack:
        kz = jnp.zeros((k_slots,) + shape, jnp.float32)
        ki = jnp.zeros((k_slots,) + shape, jnp.int32)
        carry += [jnp.zeros(shape, jnp.int32)] \
            + [kz] * (14 if mc.env else 13) + [ki]

    def cond_fn(c):
        return (c[0] < mc.max_iters) & jnp.any(c[18] > 0.5)

    def body_fn(c):
        (it, lr, lg, lb,
         cox, coy, coz, cdx, cdy, cdz, cwx, cwy, cwz,
         cax, cay, caz, cmed, cdep, cact_f) = c[:19]
        cact = cact_f > 0.5
        base_i = 19
        if mc.env:
            cenv_f = c[19]
            base_i = 20
        if use_stack:
            if mc.env:
                (sp, s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_wx, s_wy, s_wz,
                 s_ax, s_ay, s_az, s_med, s_env, s_dep) = c[base_i:]
            else:
                (sp, s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_wx, s_wy, s_wz,
                 s_ax, s_ay, s_az, s_med, s_dep) = c[base_i:]

        t, nx, ny, nz, matf, mlf, hitv, tslots, hittbn, hituv = trace(
            cox, coy, coz, cdx, cdy, cdz, cact)
        hit = hitv & cact
        t_safe = jnp.where(hit, t, 0.0)

        # Beer attenuation of the popped segment (raytracer.cpp:416-423)
        if diel:
            cwx = cwx * jnp.exp(-cax * t_safe)
            cwy = cwy * jnp.exp(-cay * t_safe)
            cwz = cwz * jnp.exp(-caz * t_safe)

        # miss resolution (raytracer.cpp:49-62): bg texture -> env light ->
        # flat color for PRIMARY misses; secondary misses sample the env
        # only for branches flagged env-on-miss (mirror / dielectric
        # children — integrator.py refl_env), else contribute nothing
        if mc.bg_tex >= 0:
            # replace_background decal (round 5, texture.h:49-52): sample
            # at the pixel-uv input planes, raw values like the wavefront's
            # miss_col (_sample_tex_rgb)
            missp = cact & (~hitv) & (it == 0)
            bu = pu_ref[:, :]
            bv = pv_ref[:, :]
            if _tex_is_big(mc.bg_tex):
                b_r, b_g, b_b = big_img_sample(mc.bg_tex, bu, bv, missp,
                                               raw=True)
            else:
                b_r, b_g, b_b = img_sample(mc.bg_tex, bu, bv, raw=True)
            lr = lr + jnp.where(missp, cwx * b_r, 0.0)
            lg = lg + jnp.where(missp, cwy * b_g, 0.0)
            lb = lb + jnp.where(missp, cwz * b_b, 0.0)
            if mc.env:
                misse = cact & (~hitv) & (it > 0) & (cenv_f > 0.5)
                e_r, e_g, e_b = env_radiance(cdx, cdy, cdz, misse)
                lr = lr + jnp.where(misse, cwx * e_r, 0.0)
                lg = lg + jnp.where(misse, cwy * e_g, 0.0)
                lb = lb + jnp.where(misse, cwz * e_b, 0.0)
        elif mc.env:
            misse = cact & (~hitv) & ((it == 0) | (cenv_f > 0.5))
            e_r, e_g, e_b = env_radiance(cdx, cdy, cdz, misse)
            lr = lr + jnp.where(misse, cwx * e_r, 0.0)
            lg = lg + jnp.where(misse, cwy * e_g, 0.0)
            lb = lb + jnp.where(misse, cwz * e_b, 0.0)
        else:
            missp = cact & (~hitv) & (it == 0)
            lr = lr + jnp.where(missp, cwx * mc.bg[0], 0.0)
            lg = lg + jnp.where(missp, cwy * mc.bg[1], 0.0)
            lb = lb + jnp.where(missp, cwz * mc.bg[2], 0.0)

        # hit point & view direction
        px = cox + t_safe * cdx
        py = coy + t_safe * cdy
        pz = coz + t_safe * cdz
        wox, woy, woz = -cdx, -cdy, -cdz

        # Perlin bump: world-space gradient of the scaled height field,
        # projected off the normal (shading.py::_apply_bump_normal_maps <-
        # mesh.cpp:290-309; identity-transform meshes only, see
        # _textures_eligible).  Applied before everything downstream — GI
        # basis, shadow origins, specular children — like surface_at does.
        if mc.perlin_bump:
            td_f, ts_f, tb_f = tslots[:3]
            beps = 1e-3
            for ti_ in mc.perlin_bump:
                nsc, cv, _bl, bf = mc.perlin_textures[ti_]
                h0 = perlin_unit(px, py, pz, nsc, cv) * bf
                gx_ = (perlin_unit(px + beps, py, pz, nsc, cv) * bf - h0) / beps
                gy_ = (perlin_unit(px, py + beps, pz, nsc, cv) * bf - h0) / beps
                gz_ = (perlin_unit(px, py, pz + beps, nsc, cv) * bf - h0) / beps
                gpar = gx_ * nx + gy_ * ny + gz_ * nz
                bx, by, bz = norm3(nx - (gx_ - gpar * nx),
                                   ny - (gy_ - gpar * ny),
                                   nz - (gz_ - gpar * nz))
                m_ = tb_f == float(ti_)
                nx = jnp.where(m_, bx, nx)
                ny = jnp.where(m_, by, ny)
                nz = jnp.where(m_, bz, nz)
        elif mc.perlin_textures or mc.image_textures:
            td_f, ts_f, tb_f = tslots[:3]

        if (mc.img_diff or mc.img_spec or mc.img_ra or mc.img_normal
                or mc.img_bump):
            # tile the winner's interpolated UV once (mesh.cpp:256-258);
            # no-UV faces carry uv=(0,0), which tiles to itself
            uu = tile_uv_k(hituv[0])
            vv = tile_uv_k(hituv[1])
        if mc.img_ra or mc.img_normal:
            ra_f = tslots[3]
            nm_f = tslots[4]

        # tangent-space normal map (mesh.cpp:264-275; GetTransformedNormal,
        # helperMath.cpp:86-108): sampled rgb/127.5-1 mapped through the
        # per-face TBN columns carried by the trace fold
        if mc.has_tbn and (mc.img_normal or mc.img_bump):
            # TBN frame: identity scenes carry the precomposed world TBN
            # and map against the world normal; tbn_obj scenes (round 5)
            # carry object-space TBN + object normal + per-entity M^-T and
            # transform the mapped normal themselves (mesh.cpp:264-357 +
            # surface_at's nrm_mat transform)
            if mc.tbn_obj:
                (tnx, tny, tnz, tbx, tby, tbz, onx, ony, onz,
                 i00, i01, i02, i10, i11, i12, i20, i21, i22) = hittbn

                def tbn_world(ax_, ay_, az_):
                    return norm3(i00 * ax_ + i01 * ay_ + i02 * az_,
                                 i10 * ax_ + i11 * ay_ + i12 * az_,
                                 i20 * ax_ + i21 * ay_ + i22 * az_)
            else:
                tnx, tny, tnz, tbx, tby, tbz = hittbn
                onx, ony, onz = nx, ny, nz

                def tbn_world(ax_, ay_, az_):
                    return norm3(ax_, ay_, az_)

        if mc.img_normal:
            for ti_ in mc.img_normal:
                m_ = nm_f == float(ti_)
                if _tex_is_big(ti_):
                    sr, sg, sb = big_img_sample(ti_, uu, vv, m_, raw=True)
                else:
                    sr, sg, sb = img_sample(ti_, uu, vv, raw=True)
                sxn, syn, szn = norm3(sr / 127.5 - 1.0, sg / 127.5 - 1.0,
                                      sb / 127.5 - 1.0)
                mpx, mpy, mpz = tbn_world(
                    tnx * sxn + tbx * syn + onx * szn,
                    tny * sxn + tby * syn + ony * szn,
                    tnz * sxn + tbz * syn + onz * szn)
                nx = jnp.where(m_, mpx, nx)
                ny = jnp.where(m_, mpy, ny)
                nz = jnp.where(m_, mpz, nz)

        # image height-field bump (mesh.cpp:310-357): UV-space forward
        # differences on mean-channel greyscale; skipped where a normal map
        # already fired (shading.py::_apply_bump_normal_maps)
        if mc.img_bump:
            for ti_ in mc.img_bump:
                meta_b = _tex_meta(ti_)
                iwd, ihd, bf = meta_b[2], meta_b[3], meta_b[6]
                fw1 = float(iwd - 1)
                fh1 = float(ihd - 1)
                iw_ = jnp.clip((uu * fw1).astype(jnp.int32), 0, iwd - 1)
                jh_ = jnp.clip((vv * fh1).astype(jnp.int32), 0, ihd - 1)
                i1 = jnp.minimum(iw_ + 1, iwd - 1)
                j1 = jnp.minimum(jh_ + 1, ihd - 1)
                if _tex_is_big(ti_):
                    mb_ = tb_f == float(ti_)
                    if mc.img_normal:
                        mb_ = mb_ & (nm_f < 0.0)
                    h_uv, h_du, h_dv = big_img_grey3(
                        ti_, [(iw_, jh_), (i1, jh_), (iw_, j1)], mb_)
                else:
                    h_uv = img_grey_at(ti_, iw_, jh_)
                    h_du = img_grey_at(ti_, i1, jh_)
                    h_dv = img_grey_at(ti_, iw_, j1)
                # the height-field cross + orientation fixups run in the
                # TBN's own space (object for tbn_obj, ==world for
                # identity — mesh.cpp:310-357 does it in object space)
                qux = tnx + onx * ((h_du - h_uv) * bf)
                quy = tny + ony * ((h_du - h_uv) * bf)
                quz = tnz + onz * ((h_du - h_uv) * bf)
                qvx = tbx + onx * ((h_dv - h_uv) * bf)
                qvy = tby + ony * ((h_dv - h_uv) * bf)
                qvz = tbz + onz * ((h_dv - h_uv) * bf)
                nix, niy, niz = norm3(qvy * quz - qvz * quy,
                                      qvz * qux - qvx * quz,
                                      qvx * quy - qvy * qux)
                # orientation fixups (mesh.cpp:345-354)
                flip1 = ((nix * onx <= 0) & (niy * ony <= 0)
                         & (niz * onz <= 0))
                flip2 = ((jnp.abs(nix - onx) > 0.9)
                         | (jnp.abs(niy - ony) > 0.9)
                         | (jnp.abs(niz - onz) > 0.9))
                flip = flip1 | flip2
                nix = jnp.where(flip, -nix, nix)
                niy = jnp.where(flip, -niy, niy)
                niz = jnp.where(flip, -niz, niz)
                nix, niy, niz = tbn_world(nix, niy, niz)
                m_ = tb_f == float(ti_)
                if mc.img_normal:
                    m_ = m_ & (nm_f < 0.0)
                nx = jnp.where(m_, nix, nx)
                ny = jnp.where(m_, niy, ny)
                nz = jnp.where(m_, niz, nz)

        inside = (cmed > 1.00001) if diel else FALSE

        # emissive hit: radiance * 2pi and nothing else (raytracer.cpp:81-84)
        shadeable = hit
        if mc.has_emissive:
            is_em = mat_mask(matf, _EMISSIVE)
            emx, emy, emz = mat_field3(matf, lambda m: m[9])
            gate_em = hit & is_em
            lr = lr + jnp.where(gate_em, cwx * emx * (2.0 * float(np.pi)), 0.0)
            lg = lg + jnp.where(gate_em, cwy * emy * (2.0 * float(np.pi)), 0.0)
            lb = lb + jnp.where(gate_em, cwz * emz * (2.0 * float(np.pi)), 0.0)
            shadeable = hit & (~is_em)

        # replace_all decal short-circuits shading with the RAW texture
        # sample (raytracer.cpp:87-89; integrator.py:233-238): no lighting,
        # no children
        if mc.img_ra:
            for ti_ in mc.img_ra:
                m_ = shadeable & (ra_f == float(ti_))
                if _tex_is_big(ti_):
                    rr_, gg_, bb_ = big_img_sample(ti_, uu, vv, m_,
                                                   raw=True)
                else:
                    rr_, gg_, bb_ = img_sample(ti_, uu, vv, raw=True)
                lr = lr + jnp.where(m_, cwx * rr_, 0.0)
                lg = lg + jnp.where(m_, cwy * gg_, 0.0)
                lb = lb + jnp.where(m_, cwz * bb_, 0.0)
            shadeable = shadeable & (ra_f < 0.0)

        lit = shadeable & (~inside)

        # ---- path tracing: GI sample + NEE double-count suppression ----
        # (ComputeGlobalIllumination, raytracer.cpp:135-191; the GI child is
        # this lane's CONTINUATION — eligible PT scenes are diffuse-only)
        skip_ml = jnp.full(shape, -1.0)
        if mc.pt:
            if mc.pt_rr:
                maxw = jnp.maximum(cwx, jnp.maximum(cwy, cwz))
                prob = jnp.clip(maxw, 1e-4, 1.0)
                kill = (rnd(it, 0) > prob) & (cdep <= 0)
                gi_alive = shadeable & (~kill) & (cdep > -mc.rr_floor)
                rr_scale = jnp.where(cdep <= 0, 1.0 / prob, 1.0)
            else:
                gi_alive = shadeable & (cdep > 0)
                rr_scale = ONE
            r1 = rnd(it, 1)
            r2 = rnd(it, 2)
            phi = (2.0 * float(np.pi)) * r1
            if mc.pt_importance:
                sin_t = jnp.sqrt(r2)  # theta = asin(sqrt(r2))
                cos_t = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
            else:
                cos_t = r2  # theta = acos(r2)
                sin_t = jnp.sqrt(jnp.maximum(1.0 - r2 * r2, 0.0))
            (ubx, uby, ubz), (vbx, vby, vbz) = onb(nx, ny, nz)
            sc = sin_t * jnp.cos(phi)
            ss = sin_t * jnp.sin(phi)
            gdx, gdy, gdz = norm3(
                ubx * sc + nx * cos_t + vbx * ss,
                uby * sc + ny * cos_t + vby * ss,
                ubz * sc + nz * cos_t + vbz * ss,
            )
            gox = px + nx * 1e-4  # hardcoded GI epsilon (raytracer.cpp:174)
            goy = py + ny * 1e-4
            goz = pz + nz * 1e-4
            # trace the GI ray now: the reference suppresses NEE for the
            # mesh light its GI ray hit (raytracer.cpp:180-188, 778-781)
            g_t, _, _, _, _, g_ml, g_hit, _, _, _ = trace(
                gox, goy, goz, gdx, gdy, gdz, gi_alive)
            g_hit = g_hit & gi_alive
            if len(mc.mesh_lights) > 0:
                skip_ml = jnp.where(g_hit & (g_ml >= 0.0), g_ml, -1.0)

        sample_direct = (not mc.pt) or mc.pt_nee

        # ambient (raytracer.cpp:98-100) — like all direct terms, skipped in
        # PT-without-NEE mode (integrator.py: sample_direct gates ambient too)
        if sample_direct and any(a != 0.0 for a in mc.ambient):
            ambx, amby, ambz = mat_field3(matf, lambda m: m[1])
            lr = lr + jnp.where(lit, cwx * (mc.ambient[0] * ambx), 0.0)
            lg = lg + jnp.where(lit, cwy * (mc.ambient[1] * amby), 0.0)
            lb = lb + jnp.where(lit, cwz * (mc.ambient[2] * ambz), 0.0)

        kdx, kdy, kdz = mat_field3(matf, lambda m: m[2])
        ksx, ksy, ksz = mat_field3(matf, lambda m: m[3])
        phong = mat_field(matf, lambda m: m[5])

        # Perlin diffuse / specular modulation: the greyscale sample replaces
        # (or blend-averages) the reflectance before shade_unit closes over
        # it, so direct lighting AND the PT GI weight see the textured value
        # (shading.py::_apply_diffuse_texture / _apply_specular_texture)
        for ti_ in mc.perlin_diff:
            nsc, cv, blend, _bf = mc.perlin_textures[ti_]
            val = perlin_unit(px, py, pz, nsc, cv)
            m_ = td_f == float(ti_)
            kdx = jnp.where(m_, (val + kdx) * 0.5 if blend else val, kdx)
            kdy = jnp.where(m_, (val + kdy) * 0.5 if blend else val, kdy)
            kdz = jnp.where(m_, (val + kdz) * 0.5 if blend else val, kdz)
        for ti_ in mc.perlin_spec:
            nsc, cv, blend, _bf = mc.perlin_textures[ti_]
            val = perlin_unit(px, py, pz, nsc, cv)
            m_ = ts_f == float(ti_)
            ksx = jnp.where(m_, (val + ksx) * 0.5 if blend else val, ksx)
            ksy = jnp.where(m_, (val + ksy) * 0.5 if blend else val, ksy)
            ksz = jnp.where(m_, (val + ksz) * 0.5 if blend else val, ksz)

        # image kd/ks modulation: RGB/255 replaces (or blend-averages) the
        # reflectance (GetDiffuseReflectanceCoeff, raytracer.cpp:478-508;
        # shading.py::diffuse_reflectance / specular_reflectance)
        for ti_ in mc.img_diff:
            blend = _tex_meta(ti_)[1]
            m_ = td_f == float(ti_)
            if _tex_is_big(ti_):
                tr, tg, tb = big_img_sample(ti_, uu, vv, m_)
            else:
                tr, tg, tb = img_sample(ti_, uu, vv)
            kdx = jnp.where(m_, (tr + kdx) * 0.5 if blend else tr, kdx)
            kdy = jnp.where(m_, (tg + kdy) * 0.5 if blend else tg, kdy)
            kdz = jnp.where(m_, (tb + kdz) * 0.5 if blend else tb, kdz)
        for ti_ in mc.img_spec:
            blend = _tex_meta(ti_)[1]
            m_ = ts_f == float(ti_)
            if _tex_is_big(ti_):
                tr, tg, tb = big_img_sample(ti_, uu, vv, m_)
            else:
                tr, tg, tb = img_sample(ti_, uu, vv)
            ksx = jnp.where(m_, (tr + ksx) * 0.5 if blend else tr, ksx)
            ksy = jnp.where(m_, (tg + ksy) * 0.5 if blend else tg, ksy)
            ksz = jnp.where(m_, (tb + ksz) * 0.5 if blend else tb, ksz)

        sox = px + nx * eps
        soy = py + ny * eps
        soz = pz + nz * eps

        has_brdfs = any(m[11] >= 0 for m in mc.materials)

        def shade_unit(wix, wiy, wiz):
            """Shade with UNIT irradiance: the default diffuse+Blinn-Phong
            split (GetDiffuse/GetSpecular, raytracer.cpp:540-554), overridden
            per material by its pluggable BRDF value * cos(theta_i)
            (Raytracer::Shade dispatch, raytracer.cpp:192-206; formulas
            transcribed from ops/brdf.py <- src/brdf*.cpp with STATIC
            per-material parameters)."""
            cos_t = jnp.maximum(0.0, wix * nx + wiy * ny + wiz * nz)
            hx, hy, hz = norm3(wix + wox, wiy + woy, wiz + woz)
            cos_hm = jnp.maximum(0.0, hx * nx + hy * ny + hz * nz)
            spec = powmax(cos_hm, phong)
            vx = kdx * cos_t + ksx * spec
            vy = kdy * cos_t + ksy * spec
            vz = kdz * cos_t + ksz * spec
            if has_brdfs:
                from advanced_cpu_raytracing_tpu.scene.types import BrdfType

                pi = float(np.pi)
                cos_ic = jnp.clip(wix * nx + wiy * ny + wiz * nz, -1.0, 1.0)
                front = cos_ic > 0.0
                cos_pos = jnp.maximum(cos_ic, 0.0)
                cos_den = jnp.maximum(cos_ic, 1e-20)
                ndwi = wix * nx + wiy * ny + wiz * nz
                rlx, rly, rlz = norm3(2.0 * nx * ndwi - wix,
                                      2.0 * ny * ndwi - wiy,
                                      2.0 * nz * ndwi - wiz)
                cos_r = jnp.clip(rlx * wox + rly * woy + rlz * woz, -1.0, 1.0)
                cos_hc = jnp.clip(hx * nx + hy * ny + hz * nz, -1.0, 1.0)
                for i, m in enumerate(mc.materials):
                    if m[11] < 0:
                        continue
                    kind, e, normed, kdf = m[11], m[12], m[13], m[14]
                    kd3, ks3, ior = m[2], m[3], m[6]
                    if kind == int(BrdfType.PHONG):
                        lobe = powmax(cos_r, e) / cos_den
                        val = [kd3[c] + ks3[c] * lobe for c in range(3)]
                    elif kind == int(BrdfType.MODIFIED_PHONG):
                        if normed:
                            lobe = (e + 2.0) / (2.0 * pi) * powmax(cos_r, e)
                            val = [kd3[c] / pi + ks3[c] * lobe
                                   for c in range(3)]
                        else:
                            lobe = powmax(cos_r, e)
                            val = [kd3[c] + ks3[c] * lobe for c in range(3)]
                    elif kind == int(BrdfType.BLINN_PHONG):
                        lobe = powmax(cos_hc, e) / cos_den
                        val = [kd3[c] + ks3[c] * lobe for c in range(3)]
                    elif kind == int(BrdfType.MODIFIED_BLINN_PHONG):
                        if normed:
                            lobe = (e + 8.0) / (8.0 * pi) * powmax(cos_hc, e)
                            val = [kd3[c] / pi + ks3[c] * lobe
                                   for c in range(3)]
                        else:
                            lobe = powmax(cos_hc, e)
                            val = [kd3[c] + ks3[c] * lobe for c in range(3)]
                    else:  # TorranceSparrow (brdfTorranceSparrow.cpp:15-66)
                        d_t = (e + 2.0) / (2.0 * pi) * powmax(cos_hc, e)
                        r0 = (ior - 1.0) ** 2 / max((ior + 1.0) ** 2, 1e-20)
                        hdwo = hx * wox + hy * woy + hz * woz
                        om = jnp.maximum(1.0 - hdwo, 0.0)
                        f_t = r0 + (1.0 - r0) * om * om * om * om * om
                        ndwo = nx * wox + ny * woy + nz * woz
                        wodh = jnp.where(hdwo == 0.0, 1e-20, hdwo)
                        g_t = jnp.minimum(1.0, jnp.minimum(
                            2.0 * cos_hc * ndwo / wodh,
                            2.0 * cos_hc * ndwi / wodh))
                        kd_c = ((1.0 - f_t) / pi) if kdf else (1.0 / pi)
                        den = 4.0 * jnp.where(ndwi * ndwo == 0.0, 1e-20,
                                              ndwi * ndwo)
                        lobe = d_t * f_t * g_t / den
                        val = [kd3[c] * kd_c + ks3[c] * lobe
                               for c in range(3)]
                    sel = matf == float(i)
                    gated = [jnp.where(front, v, 0.0) * cos_pos for v in val]
                    vx = jnp.where(sel, gated[0], vx)
                    vy = jnp.where(sel, gated[1], vy)
                    vz = jnp.where(sel, gated[2], vz)
            return vx, vy, vz

        def add_light(lr, lg, lb, wix, wiy, wiz, irr_x, irr_y, irr_z, gate):
            vx, vy, vz = shade_unit(wix, wiy, wiz)
            lr = lr + jnp.where(gate, cwx * irr_x * vx, 0.0)
            lg = lg + jnp.where(gate, cwy * irr_y * vy, 0.0)
            lb = lb + jnp.where(gate, cwz * irr_z * vz, 0.0)
            return lr, lg, lb

        for lp, li in (mc.point_lights if sample_direct else ()):
            tlx = lp[0] - px
            tly = lp[1] - py
            tlz = lp[2] - pz
            d2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
            dist = jnp.sqrt(d2)
            inv = 1.0 / dist
            wix, wiy, wiz = tlx * inv, tly * inv, tlz * inv
            blocked = shadow(sox, soy, soz, wix, wiy, wiz, dist, lit)
            lr, lg, lb = add_light(
                lr, lg, lb, wix, wiy, wiz,
                li[0] / d2, li[1] / d2, li[2] / d2, lit & (~blocked))

        for ld, lrad in (mc.dir_lights if sample_direct else ()):
            wix = jnp.full(shape, ld[0])
            wiy = jnp.full(shape, ld[1])
            wiz = jnp.full(shape, ld[2])
            blocked = shadow(sox, soy, soz, wix, wiy, wiz,
                             jnp.full(shape, BIG), lit)
            lr, lg, lb = add_light(
                lr, lg, lb, wix, wiy, wiz,
                jnp.full(shape, lrad[0]), jnp.full(shape, lrad[1]),
                jnp.full(shape, lrad[2]), lit & (~blocked))

        # spot lights (raytracer.cpp:767-776, spotLight.h:33-57)
        for sl in (mc.spot_lights if sample_direct else ()):
            lpos, ldir, lint, chc, chf, cov, fall = sl
            tlx = lpos[0] - px
            tly = lpos[1] - py
            tlz = lpos[2] - pz
            d2s = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
            dist = jnp.sqrt(d2s)
            inv = 1.0 / dist
            wix, wiy, wiz = tlx * inv, tly * inv, tlz * inv
            cos_a = jnp.clip(
                -(ldir[0] * wix + ldir[1] * wiy + ldir[2] * wiz), -1.0, 1.0)
            irr_s = 1.0 / d2s
            # all cone tests in COSINE space (arccos is strictly decreasing;
            # Mosaic has no acos lowering): alpha > fall/2 <=> cos_a <
            # cos(fall/2), alpha <= 0 <=> cos_a >= 1
            # falloff: ((cos a - cos(cov/2)) / (cos(fall/2) - cos(cov/2)))^4
            frac = jnp.maximum(
                (cos_a - chc) / max(chf - chc, 1e-9), 0.0)
            smooth = frac * frac * frac * frac
            scale = jnp.where(cos_a < chf, smooth, 1.0)
            scale = jnp.where((cos_a >= 1.0) | (cos_a < chc), 0.0, scale)
            blocked = shadow(sox, soy, soz, wix, wiy, wiz, dist, lit)
            lr, lg, lb = add_light(
                lr, lg, lb, wix, wiy, wiz,
                lint[0] * irr_s * scale, lint[1] * irr_s * scale,
                lint[2] * irr_s * scale, lit & (~blocked))

        # area lights (raytracer.cpp:720-740, areaLight.h:34-41): uniform
        # rectangle sample, two-sided cosine
        for ai, al in enumerate(mc.area_lights if sample_direct else ()):
            apos, anrm, arad, ext, area, au, av = al
            base = 3 + 3 * len(mc.mesh_lights) + 2 * ai
            o1 = rnd(it, base) - 0.5
            o2 = rnd(it, base + 1) - 0.5
            sxp = apos[0] + au[0] * (ext * o1) + av[0] * (ext * o2)
            syp = apos[1] + au[1] * (ext * o1) + av[1] * (ext * o2)
            szp = apos[2] + au[2] * (ext * o1) + av[2] * (ext * o2)
            tlx, tly, tlz = sxp - px, syp - py, szp - pz
            d2a = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
            dist = jnp.sqrt(d2a)
            inv = 1.0 / dist
            wix, wiy, wiz = tlx * inv, tly * inv, tlz * inv
            l_cos = jnp.abs(anrm[0] * wix + anrm[1] * wiy + anrm[2] * wiz)
            irr_a = area * l_cos / d2a
            blocked = shadow(sox, soy, soz, wix, wiy, wiz, dist, lit)
            lr, lg, lb = add_light(
                lr, lg, lb, wix, wiy, wiz,
                arad[0] * irr_a, arad[1] * irr_a, arad[2] * irr_a,
                lit & (~blocked))

        # mesh lights (raytracer.cpp:778-803, meshLight.h:27-50): random face
        # by area-independent uniform pick, sqrt-warped barycentric point,
        # irradiance = radiance * (faceArea/surfaceArea) * 2pi; the lane
        # whose GI ray hit this light skips it (NEE suppression)
        for li_idx, (lrad, faces) in enumerate(
                mc.mesh_lights if sample_direct else ()):
            count = len(faces)
            uf = rnd(it, 3 + 3 * li_idx)
            fsel = jnp.minimum((uf * float(count)).astype(jnp.int32),
                               count - 1)
            avx = avy = avz = bvx = bvy = bvz = cvx = cvy = cvz = ZERO
            wgt = ZERO
            for fi, (row, wfac, c9) in enumerate(faces):
                selm = fsel == fi
                avx = jnp.where(selm, c9[0], avx)
                avy = jnp.where(selm, c9[1], avy)
                avz = jnp.where(selm, c9[2], avz)
                bvx = jnp.where(selm, c9[3], bvx)
                bvy = jnp.where(selm, c9[4], bvy)
                bvz = jnp.where(selm, c9[5], bvz)
                cvx = jnp.where(selm, c9[6], cvx)
                cvy = jnp.where(selm, c9[7], cvy)
                cvz = jnp.where(selm, c9[8], cvz)
                wgt = jnp.where(selm, wfac, wgt)
            b1 = rnd(it, 3 + 3 * li_idx + 1)
            b2 = rnd(it, 3 + 3 * li_idx + 2)
            sq = jnp.sqrt(b1)
            qx = bvx * (1.0 - b2) + cvx * b2
            qy = bvy * (1.0 - b2) + cvy * b2
            qz = bvz * (1.0 - b2) + cvz * b2
            tx = avx * (1.0 - sq) + qx * sq - px
            ty = avy * (1.0 - sq) + qy * sq - py
            tz = avz * (1.0 - sq) + qz * sq - pz
            d2m = jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-20)
            dist = jnp.sqrt(d2m)
            inv = 1.0 / dist
            wix, wiy, wiz = tx * inv, ty * inv, tz * inv
            not_skipped = skip_ml != float(li_idx)
            gate_in = lit & not_skipped
            blocked = shadow(sox, soy, soz, wix, wiy, wiz, dist, gate_in)
            f2pi = 2.0 * float(np.pi)
            lr, lg, lb = add_light(
                lr, lg, lb, wix, wiy, wiz,
                lrad[0] * wgt * f2pi, lrad[1] * wgt * f2pi,
                lrad[2] * wgt * f2pi, gate_in & (~blocked))

        # env light direct term (raytracer.cpp:741-755, lights.py:190-199):
        # rejection-sample an upper-hemisphere direction (16 candidates,
        # first valid, fallback = the normal; candidates stay UNNORMALIZED
        # like the reference), fetch the lat-long radiance along it, but
        # shade with the NORMAL as w_i (reference quirk, lights.py:198);
        # no shadow ray (the reference leaves it TODO)
        if mc.env and sample_direct:
            base_e = 3 + 3 * len(mc.mesh_lights) + 2 * len(mc.area_lights)
            ex, ey, ez = nx, ny, nz
            accepted = FALSE
            for ci in range(16):
                cxv = 2.0 * rnd(it, base_e + 3 * ci) - 1.0
                cyv = 2.0 * rnd(it, base_e + 3 * ci + 1) - 1.0
                czv = 2.0 * rnd(it, base_e + 3 * ci + 2) - 1.0
                ok = ((cxv * cxv + cyv * cyv + czv * czv <= 1.0)
                      & (cxv * nx + cyv * ny + czv * nz > 0.0))
                take = ok & (~accepted)
                ex = jnp.where(take, cxv, ex)
                ey = jnp.where(take, cyv, ey)
                ez = jnp.where(take, czv, ez)
                accepted = accepted | ok
            er, eg, eb = env_radiance(ex, ey, ez, lit)
            lr, lg, lb = add_light(lr, lg, lb, nx, ny, nz, er, eg, eb, lit)

        # ---- children (reflection continues in-register; refraction pushes) --
        new_act = FALSE
        nox, noy, noz = px, py, pz
        ndx, ndy, ndz = wox, woy, woz
        nwx, nwy, nwz = cwx, cwy, cwz
        nax, nay, naz = ZERO, ZERO, ZERO
        nmed = ONE
        ncenv = ZERO  # env-on-miss flag of the continuation ray

        if mc.pt:
            # GI child weight: Shade(w_i=gi, unit Li) * 2pi * rr_scale
            # (raytracer.cpp:188,202); the reference recurses only when the
            # GI ray HIT something
            gvx, gvy, gvz = shade_unit(gdx, gdy, gdz)
            fac = (2.0 * float(np.pi)) * rr_scale
            gi_wx = cwx * gvx * fac
            gi_wy = cwy * gvy * fac
            gi_wz = cwz * gvz * fac
            if not any_spec:
                # diffuse-only PT: the GI sample IS the continuation
                new_act = g_hit
                nox, noy, noz = gox, goy, goz
                ndx, ndy, ndz = gdx, gdy, gdz
                nwx, nwy, nwz = gi_wx, gi_wy, gi_wz
                nmed = cmed

        if any_spec:
            can = cdep > 0
            ndotwo = nx * wox + ny * woy + nz * woz
            rx, ry, rz = norm3(
                2.0 * nx * ndotwo - wox,
                2.0 * ny * ndotwo - woy,
                2.0 * nz * ndotwo - woz,
            )
            if mc.has_rough:
                # glossy perturbation (Raytracer::Reflect, raytracer.cpp:
                # 424-440): r' = unit(r + (u*psi1 + v*psi2)*roughness)
                rough = mat_field(matf, lambda m: m[10])
                base_r = (3 + 3 * len(mc.mesh_lights)
                          + 2 * len(mc.area_lights)
                          + (48 if mc.env else 0))
                rp1 = rnd(it, base_r) - 0.5
                rp2 = rnd(it, base_r + 1) - 0.5
                is_rough = rough > 0.001

                def perturb(ax_, ay_, az_, p1, p2):
                    (ux_, uy_, uz_), (vx_, vy_, vz_) = onb(
                        *norm3(ax_, ay_, az_))
                    qx, qy, qz = norm3(
                        ax_ + (ux_ * p1 + vx_ * p2) * rough,
                        ay_ + (uy_ * p1 + vy_ * p2) * rough,
                        az_ + (uz_ * p1 + vz_ * p2) * rough,
                    )
                    bx_, by_, bz_ = norm3(ax_, ay_, az_)
                    return (jnp.where(is_rough, qx, bx_),
                            jnp.where(is_rough, qy, by_),
                            jnp.where(is_rough, qz, bz_))

                rx, ry, rz = perturb(rx, ry, rz, rp1, rp2)

            if mc.has_mirror:
                mirx, miry, mirz = mat_field3(matf, lambda m: m[4])
                mm = shadeable & mat_mask(matf, _MIRROR) & can
                new_act = new_act | mm
                nox = jnp.where(mm, px + nx * eps, nox)
                noy = jnp.where(mm, py + ny * eps, noy)
                noz = jnp.where(mm, pz + nz * eps, noz)
                ndx = jnp.where(mm, rx, ndx)
                ndy = jnp.where(mm, ry, ndy)
                ndz = jnp.where(mm, rz, ndz)
                nwx = jnp.where(mm, cwx * mirx, nwx)
                nwy = jnp.where(mm, cwy * miry, nwy)
                nwz = jnp.where(mm, cwz * mirz, nwz)
                if mc.env:
                    # mirror miss samples the env (raytracer.cpp:461-469)
                    ncenv = jnp.where(mm, 1.0, ncenv)

            if mc.has_conductor:
                # conductor Fresnel (raytracer.cpp:208-254)
                mirx, miry, mirz = mat_field3(matf, lambda m: m[4])
                n2 = mat_field(matf, lambda m: m[6])
                k2 = mat_field(matf, lambda m: m[7])
                cos_t = ndotwo
                n2k2 = n2 * n2 + k2 * k2
                two = 2.0 * n2 * cos_t
                cos2 = cos_t * cos_t
                rs = (n2k2 - two + cos2) / jnp.maximum(n2k2 + two + cos2, 1e-20)
                rp = (n2k2 * cos2 - two + 1.0) / jnp.maximum(
                    n2k2 * cos2 + two + 1.0, 1e-20)
                ratio = 0.5 * (rs + rp)
                cm = shadeable & mat_mask(matf, _CONDUCTOR) & can & (ratio > 1e-4)
                new_act = new_act | cm
                nox = jnp.where(cm, px + nx * eps, nox)
                noy = jnp.where(cm, py + ny * eps, noy)
                noz = jnp.where(cm, pz + nz * eps, noz)
                ndx = jnp.where(cm, rx, ndx)
                ndy = jnp.where(cm, ry, ndy)
                ndz = jnp.where(cm, rz, ndz)
                nwx = jnp.where(cm, cwx * mirx * ratio, nwx)
                nwy = jnp.where(cm, cwy * miry * ratio, nwy)
                nwz = jnp.where(cm, cwz * mirz * ratio, nwz)

            if diel:
                # dielectric Fresnel split (raytracer.cpp:261-415), matching
                # render/integrator.py::_process_hit exactly
                is_diel = mat_mask(matf, _DIELECTRIC)
                ior = mat_field(matf, lambda m: m[6])
                abx, aby, abz = mat_field3(matf, lambda m: m[8])
                cos0 = -(cdx * nx + cdy * ny + cdz * nz)
                entering = cos0 > 0.0
                sgn = jnp.where(entering, 1.0, -1.0)
                nmx, nmy, nmz = nx * sgn, ny * sgn, nz * sgn
                cos_i = jnp.abs(cos0)
                n1 = jnp.where(entering, cmed, ior)
                n2d = jnp.where(entering, ior, 1.0)
                obj_n = jnp.where(entering, ior, 1.0)
                ratio_n = n1 / jnp.maximum(n2d, 1e-20)
                sin2 = 1.0 - cos_i * cos_i
                crit = ratio_n * ratio_n * sin2
                tir = crit > 1.0
                # reflect about the oriented normal
                ndw = nmx * wox + nmy * woy + nmz * woz
                rdx, rdy, rdz = norm3(
                    2.0 * nmx * ndw - wox,
                    2.0 * nmy * ndw - woy,
                    2.0 * nmz * ndw - woz,
                )
                if mc.has_rough:
                    rdx, rdy, rdz = perturb(rdx, rdy, rdz, rp1, rp2)

                # TIR: reflect only, weight 1, medium kept (292-311)
                is_tir = shadeable & is_diel & tir & can
                new_act = new_act | is_tir
                tin = is_tir & (cmed > 1.0001)
                nox = jnp.where(is_tir, px + nmx * eps, nox)
                noy = jnp.where(is_tir, py + nmy * eps, noy)
                noz = jnp.where(is_tir, pz + nmz * eps, noz)
                ndx = jnp.where(is_tir, rdx, ndx)
                ndy = jnp.where(is_tir, rdy, ndy)
                ndz = jnp.where(is_tir, rdz, ndz)
                nax = jnp.where(tin, abx, nax)
                nay = jnp.where(tin, aby, nay)
                naz = jnp.where(tin, abz, naz)
                nmed = jnp.where(is_tir, cmed, nmed)

                # partial reflect + refract (313-410)
                cos_p = jnp.sqrt(jnp.maximum(1.0 - crit, 0.0))
                n2cos = n2d * cos_i
                n1cosp = n1 * cos_p
                rpar = (n2cos - n1cosp) / jnp.maximum(n2cos + n1cosp, 1e-20)
                rperp = (n1 * cos_i - n2d * cos_p) / jnp.maximum(
                    n1 * cos_i + n2d * cos_p, 1e-20)
                r_refl = 0.5 * (rpar * rpar + rperp * rperp)
                r_refr = 1.0 - r_refl

                is_rl = shadeable & is_diel & (~tir) & can
                new_act = new_act | is_rl
                rin = is_rl & (obj_n > 1.00001)
                nox = jnp.where(is_rl, px + nmx * eps, nox)
                noy = jnp.where(is_rl, py + nmy * eps, noy)
                noz = jnp.where(is_rl, pz + nmz * eps, noz)
                ndx = jnp.where(is_rl, rdx, ndx)
                ndy = jnp.where(is_rl, rdy, ndy)
                ndz = jnp.where(is_rl, rdz, ndz)
                nwx = jnp.where(is_rl, cwx * r_refl, nwx)
                nwy = jnp.where(is_rl, cwy * r_refl, nwy)
                nwz = jnp.where(is_rl, cwz * r_refl, nwz)
                nax = jnp.where(rin, abx, nax)
                nay = jnp.where(rin, aby, nay)
                naz = jnp.where(rin, abz, naz)
                nmed = jnp.where(is_rl, obj_n, nmed)
                if mc.env:
                    # partial-reflection leg samples the env on miss
                    # (integrator.py:418/428); TIR and conductors do not
                    ncenv = jnp.where(is_rl, 1.0, ncenv)

                # refraction leg -> stack push (perturbed on the RAW vector
                # like Raytracer's refract path, raytracer.cpp:366-375)
                f0x = (cdx + nmx * cos_i) * ratio_n - nmx * cos_p
                f0y = (cdy + nmy * cos_i) * ratio_n - nmy * cos_p
                f0z = (cdz + nmz * cos_i) * ratio_n - nmz * cos_p
                if mc.has_rough:
                    fp1 = rnd(it, base_r + 2) - 0.5
                    fp2 = rnd(it, base_r + 3) - 0.5
                    fdx, fdy, fdz = perturb(f0x, f0y, f0z, fp1, fp2)
                else:
                    fdx, fdy, fdz = norm3(f0x, f0y, f0z)
                fin = obj_n > 1.001
                iota_k = jax.lax.broadcasted_iota(
                    jnp.int32, (k_slots,) + shape, 0)
                ksel = (iota_k == sp[None]) & is_rl[None]

                def push(arr, val):
                    return jnp.where(ksel, val[None], arr)

                s_ox = push(s_ox, px - nmx * eps)
                s_oy = push(s_oy, py - nmy * eps)
                s_oz = push(s_oz, pz - nmz * eps)
                s_dx = push(s_dx, fdx)
                s_dy = push(s_dy, fdy)
                s_dz = push(s_dz, fdz)
                s_wx = push(s_wx, cwx * r_refr)
                s_wy = push(s_wy, cwy * r_refr)
                s_wz = push(s_wz, cwz * r_refr)
                s_ax = push(s_ax, jnp.where(fin, abx, 0.0))
                s_ay = push(s_ay, jnp.where(fin, aby, 0.0))
                s_az = push(s_az, jnp.where(fin, abz, 0.0))
                s_med = push(s_med, obj_n)
                if mc.env:
                    # refraction leg samples the env on miss
                    # (integrator.py:440)
                    s_env = push(s_env, ONE)
                s_dep = jnp.where(ksel, (cdep - 1)[None], s_dep)
                sp = sp + is_rl.astype(jnp.int32)

        # ---- PT with specular: GI child pushes where a specular chain
        # continues, else continues in-register (jnp _process_hit pushes
        # both; order only affects fp summation) ----
        if mc.pt and any_spec:
            gi_cont = g_hit & (~new_act)
            gi_push = g_hit & new_act
            nox = jnp.where(gi_cont, gox, nox)
            noy = jnp.where(gi_cont, goy, noy)
            noz = jnp.where(gi_cont, goz, noz)
            ndx = jnp.where(gi_cont, gdx, ndx)
            ndy = jnp.where(gi_cont, gdy, ndy)
            ndz = jnp.where(gi_cont, gdz, ndz)
            nwx = jnp.where(gi_cont, gi_wx, nwx)
            nwy = jnp.where(gi_cont, gi_wy, nwy)
            nwz = jnp.where(gi_cont, gi_wz, nwz)
            nax = jnp.where(gi_cont, 0.0, nax)
            nay = jnp.where(gi_cont, 0.0, nay)
            naz = jnp.where(gi_cont, 0.0, naz)
            nmed = jnp.where(gi_cont, cmed, nmed)
            iota_g = jax.lax.broadcasted_iota(
                jnp.int32, (k_slots,) + shape, 0)
            gsel = (iota_g == sp[None]) & gi_push[None]

            def gpush(arr, val):
                return jnp.where(gsel, val[None], arr)

            s_ox = gpush(s_ox, gox)
            s_oy = gpush(s_oy, goy)
            s_oz = gpush(s_oz, goz)
            s_dx = gpush(s_dx, gdx)
            s_dy = gpush(s_dy, gdy)
            s_dz = gpush(s_dz, gdz)
            s_wx = gpush(s_wx, gi_wx)
            s_wy = gpush(s_wy, gi_wy)
            s_wz = gpush(s_wz, gi_wz)
            s_ax = gpush(s_ax, ZERO)
            s_ay = gpush(s_ay, ZERO)
            s_az = gpush(s_az, ZERO)
            s_med = gpush(s_med, cmed)
            if mc.env:
                s_env = gpush(s_env, ZERO)  # GI misses add nothing
            s_dep = jnp.where(gsel, (cdep - 1)[None], s_dep)
            sp = sp + gi_push.astype(jnp.int32)
            new_act = new_act | gi_cont
            if mc.env:
                ncenv = jnp.where(gi_cont, 0.0, ncenv)

        # ---- pop for lanes without a continuation ----
        if use_stack:
            need = (~new_act) & (sp > 0)
            top = jnp.maximum(sp - 1, 0)
            iota_k = jax.lax.broadcasted_iota(jnp.int32, (k_slots,) + shape, 0)
            psel = iota_k == top[None]

            def pop(arr):
                return jnp.sum(jnp.where(psel, arr, 0), axis=0)

            nox = jnp.where(need, pop(s_ox), nox)
            noy = jnp.where(need, pop(s_oy), noy)
            noz = jnp.where(need, pop(s_oz), noz)
            ndx = jnp.where(need, pop(s_dx), ndx)
            ndy = jnp.where(need, pop(s_dy), ndy)
            ndz = jnp.where(need, pop(s_dz), ndz)
            nwx = jnp.where(need, pop(s_wx), nwx)
            nwy = jnp.where(need, pop(s_wy), nwy)
            nwz = jnp.where(need, pop(s_wz), nwz)
            nax = jnp.where(need, pop(s_ax), nax)
            nay = jnp.where(need, pop(s_ay), nay)
            naz = jnp.where(need, pop(s_az), naz)
            nmed = jnp.where(need, pop(s_med), nmed)
            if mc.env:
                ncenv = jnp.where(need, pop(s_env), ncenv)
            ndep = jnp.where(need, pop(s_dep), cdep - 1)
            sp = sp - need.astype(jnp.int32)
            act = new_act | need
        else:
            ndep = cdep - 1
            act = new_act

        out = [it + 1, lr, lg, lb,
               nox, noy, noz, ndx, ndy, ndz, nwx, nwy, nwz,
               nax, nay, naz, nmed, ndep, jnp.where(act, 1.0, 0.0)]
        if mc.env:
            out += [ncenv]
        if use_stack:
            out += [sp, s_ox, s_oy, s_oz, s_dx, s_dy, s_dz,
                    s_wx, s_wy, s_wz, s_ax, s_ay, s_az, s_med]
            if mc.env:
                out += [s_env]
            out += [s_dep]
        return tuple(out)

    final = jax.lax.while_loop(cond_fn, body_fn, tuple(carry))
    lx_ref[:, :] = final[1]
    ly_ref[:, :] = final[2]
    lz_ref[:, :] = final[3]


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def _pad_rows(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.pad(x, ((0, pad),), constant_values=1.0)


def mega_trace_flat(mc: MegaConsts, tri_tab, chunk_tab, o, d,
                    interpret: bool = False, seed=0, rng_key=None,
                    img_tab=None, pix_uv=None):
    """Radiance for rays o/d (R,3) via the fused kernel, returned as three
    flat (R,) component arrays — flat layouts tile perfectly on TPU, while
    (R,3) arrays pad the minor dim 3 -> 128.

    Whitted scenes are deterministic (seed unused).  PT / mesh-light scenes
    draw from the on-chip PRNG seeded with (seed, block id); in
    ``mc.host_rng`` mode (interpret/tests — pltpu.prng has no interpreter
    lowering) the randoms come from a jax.random table built from
    ``rng_key``."""
    r = o.shape[0]
    r_pad = ((r + TILE - 1) // TILE) * TILE
    n_rows = r_pad // LANES
    cols = [
        _pad_rows(arr[:, k], r_pad).reshape(n_rows, LANES)
        for arr in (o, d)
        for k in range(3)
    ]
    grid = (n_rows // ROWS,)
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # streamed geometry stays in HBM; the kernel DMAs surviving chunks
    geo_spec = (pl.BlockSpec(memory_space=pltpu.ANY) if mc.stream_geo
                else tri_spec)
    out_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 3

    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    if mc.host_rng and mc.n_draws > 0:
        assert rng_key is not None, "host_rng mode needs an rng_key"
        depth = mc.max_iters * max(mc.n_draws, 1)
        rng_tab = jax.random.uniform(
            rng_key, (depth, n_rows, LANES), jnp.float32)
    else:
        depth = 1
        rng_tab = jnp.zeros((1, n_rows, LANES), jnp.float32)
    rng_spec = pl.BlockSpec((depth, ROWS, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    has_big = bool(mc.big_textures) or mc.env_big
    big_tab = None
    if isinstance(img_tab, (tuple, list)):
        img_tab, big_tab = img_tab

    extra_in, extra_specs = [], []
    if mc.perlin_textures:
        extra_in.append(jnp.asarray(_perm512_table()))
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if mc.image_textures or mc.env:
        assert img_tab is not None, \
            "image-textured / env-lit mc needs its img_tab"
        extra_in.append(img_tab)
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if has_big:
        # megapixel/HDR texel tiles stay in HBM; the kernel DMAs
        # _BIG_WN-row windows on demand (windowed gather)
        assert big_tab is not None, "big-textured mc needs its big table"
        extra_in.append(big_tab)
        extra_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if mc.bg_tex >= 0:
        # replace_background decal: per-ray pixel-uv planes
        # (texture.h:49-52 — u = px/width, v = py/height)
        assert pix_uv is not None, "bg-textured mc needs its pixel uv"
        for arr in pix_uv:
            extra_in.append(_pad_rows(arr, r_pad).reshape(n_rows, LANES))
            extra_specs.append(ray_spec)

    scratch_shapes = []
    if mc.stream_geo:
        scratch_shapes = [
            pltpu.VMEM((STREAM_CHUNK, int(tri_tab.shape[1])), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    if has_big:
        scratch_shapes += [
            pltpu.VMEM((_BIG_WN, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]

    lx, ly, lz = pl.pallas_call(
        functools.partial(_kernel, mc=mc),
        grid=grid,
        in_specs=([ray_spec] * 6 + [geo_spec, tri_spec]
                  + [seed_spec, rng_spec] + extra_specs),
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*cols, tri_tab, chunk_tab, seed_arr, rng_tab, *extra_in)
    return lx.reshape(-1)[:r], ly.reshape(-1)[:r], lz.reshape(-1)[:r]


@functools.partial(jax.jit, static_argnames=("mc", "interpret"))
def mega_trace(mc: MegaConsts, tri_tab, chunk_tab, o, d,
               interpret: bool = False, seed=0, rng_key=None, img_tab=None,
               pix_uv=None):
    """(R,3) radiance via the fused kernel (see mega_trace_flat)."""
    lx, ly, lz = mega_trace_flat(mc, tri_tab, chunk_tab, o, d, interpret,
                                 seed, rng_key, img_tab, pix_uv)
    return jnp.stack([lx, ly, lz], axis=-1)
