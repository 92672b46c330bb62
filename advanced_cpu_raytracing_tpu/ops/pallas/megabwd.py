"""Fused forward+BACKWARD Pallas kernel: the differentiable production path.

The jnp wavefront (render/integrator.py, differentiable=True) pays ~20 ms of
HBM round trips per bounce at 260k lanes and its reverse sweep doubles that —
0.8-0.95 Mrays/s fwd+bwd at 1080p on TPU v5e.  This kernel runs the ENTIRE
Whitted chain forward AND its reverse-mode adjoint in one Pallas dispatch:

  * the forward chain is unrolled over depth (max_depth+1 segments); each
    segment traces the VMEM-resident scene (same chunk-culled fold as
    ops/pallas/megakernel.py, additionally carrying the winner's vertices
    and table row) and evaluates one differentiable "step" — hit solve,
    direct lighting, specular chain factor;
  * the backward sweep is NOT hand-derived: each step is a pure jnp
    function, and ``jax.vjp`` runs on it AT TRACE TIME inside the kernel, so
    the adjoint lowers to ordinary VPU ops Mosaic can compile.  Correctness
    oracle: jax.grad of the jnp wavefront (tests/test_megabwd.py);
  * gradient semantics match the jnp path exactly (stop-gradient-on-topology,
    diff/params.py): WHICH primitive wins, and shadow visibility, are
    constants; (t, hit point, irradiance, shading) are differentiable; mesh
    shading normals are the constant ``pack.tri_normal`` table and sphere
    geometry (center/transform) is packed constants, so vertex gradients
    flow through the triangle Cramer solve only — exactly like
    ops/traverse.py::closest_hit's winner recompute;
  * per-lane parameter cotangents (winner-vertex 9-vector, kd/ks/ambient/
    mirror/phong) stream to HBM keyed by (tri-table row, material id) and a
    tiny one-hot matmul epilogue reduces them on the MXU — the TPU-shaped
    replacement for scatter-add, which Mosaic cannot express and XLA
    serializes; scalar cotangents (light intensities, background) reduce
    in-kernel across the sequential grid.

Exposed as ``make_diff_render`` — a jax.custom_vjp whose primal runs the
fwd-only variant (same kernel, reverse sweep compiled out) and whose bwd
runs the fused kernel + epilogue.  Parameters enter as TRACED tables (the
megakernel bakes them as constants — fine for rendering, a recompile per
optimizer step for training), so optimization loops reuse one executable.

Eligibility (``bwd_eligible``): Whitted AND path tracing (any material
mix — round 5's stochastic single-child estimator handles PT + specular,
and Russian roulette unrolls to the measured 17-segment maximum),
mirror/conductor chains, dielectric chains (stochastic single-path,
below), point / directional / spot / area / mesh lights + ambient,
emissive-material hits, and diffuse image textures as DIFFERENTIABLE
LEAVES (round 5: the texel table is a traced input; per-tap cotangents
stream back keyed by global texel index and reduce on the MXU, enabling
inverse TEXTURE recovery — tools/inverse_render.py --texture).  Still
wavefront-only: specular-slot textures, perlin/normal/bump gradients,
env lights, motion, roughness, custom BRDFs; the same VMEM face budget
as the megakernel, table rows <= _BWD_MAX_ROWS so the epilogue one-hot
stays small.  Reference behavior covered: raytracer.cpp:65-134
(PerformShading dispatch), 81-84 (emissive hit), 135-191 (GI bounce +
NEE suppression + RR), 208-254 (conductor Fresnel), 261-415 (dielectric
Fresnel + Beer), 442-472 (mirror), 478-508 (texture-modulated kd),
540-554 (GetDiffuse/GetSpecular), 701-806 (direct lighting incl. spot
spotLight.h:33-57, area areaLight.h:34-41 and mesh meshLight.h:27-50),
567-583 (IsInShadow).

Stochastic choices stay a LINEAR chain: dielectric hits sample ONE child
(reflect with probability r_refl, else refract — the Fresnel weight cancels
against the selection probability, integrator.py stochastic_dielectric),
and a PT hit that also spawns a specular child picks ONE with a replayed
fair coin and doubles its weight (integrator.py stochastic_spec_gi,
round 5), so the unrolled-segment structure survives and iterations stay
O(depth), not O(2^depth).  Area-light offsets, mesh-light picks,
dielectric branch uniforms, GI directions, RR kill draws and the
spec-vs-GI coins are INPUTS produced by ``wavefront_rng`` — which replays
trace_radiance's exact key-split schedule — so kernel and jnp-wavefront
oracle make identical per-lane stochastic decisions and gradients match
lane-for-lane (tests/test_megabwd.py; asserted on hardware by the
`pytest -m tpu` tier).  Beer's law ``exp(-c*t)`` runs inside the
differentiable step (t is differentiable; the absorption constant and
medium tracking are stop-grad facts from the forward sweep).
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

# Kept equal to integrator.RR_DEPTH_FLOOR (estimator semantics); asserted
# in build_bwd_consts so a drift breaks loudly instead of desynchronizing
# the unrolled segment count / RNG replay from the wavefront oracle.
_RR_FLOOR = 8

ROWS, LANES = 8, 128
TILE = ROWS * LANES
BIG = 3.0e37
CHUNK = 128

_MIRROR = int(MaterialType.MIRROR)
_CONDUCTOR = int(MaterialType.CONDUCTOR)
_DIELECTRIC = int(MaterialType.DIELECTRIC)
_EMISSIVE = int(MaterialType.EMISSIVE)
_DEFAULT = int(MaterialType.DEFAULT)
TWO_PI = float(2.0 * np.pi)

# Stream layout per depth (per-lane f32 planes written to HBM):
#   0 row | 1 matf | 2:11 dv0/dv1/dv2 | 11:14 dkd | 14:17 dks | 17:20 damb
#   | 20:23 dmir | 23 dphong | 24:27 drad
#   | per mesh light i: 27+10i sampled row | 28+10i:37+10i d(light-face v9)
_C_BASE = 27


def _c_of(bc) -> int:
    # + texture streams (round 5): 4 tap keys + 4 taps x rgb cotangents
    return _C_BASE + 10 * len(bc.mlights) + (16 if any(bc.tex) else 0)


def _tex_stream_base(bc) -> int:
    return _C_BASE + 10 * len(bc.mlights)
# epilogue one-hot sizes: tri-table rows and materials
_BWD_MAX_ROWS = 4096
_BWD_MAX_MATS = 32
# differentiable-texture budget (round 5): total texels across the scene's
# diffuse textures; texel cotangents reduce on the MXU via the same
# one-hot pattern as tri rows, keyed by global texel index
_BWD_MAX_TEXELS = 4096


@dataclass(frozen=True)
class BwdConsts:
    """Scene facts baked into the kernel (params are NOT here — they are
    traced inputs)."""

    n_tri: int
    n_mat: int
    mat_types: tuple  # per material: MaterialType int
    cond_nk: tuple  # per material: (ior, absorption_index) — not params
    diel_abs: tuple  # per material: Beer absorption 3-vector — not a param
    spheres: tuple  # (minv12, nrm9, center3, radius, mat) — packed constants
    pl_pos: tuple  # ((3,),)*P — positions are not params
    dl_wi: tuple  # unit vector TOWARD each directional light
    spots: tuple  # (pos3, dir3, cos_half_cov, cos_half_fall, cov°, fall°)
    areas: tuple  # (pos3, u3, v3, normal3, extent, area)
    mlights: tuple  # per mesh light: ((tri-table row, area weight), ...)
    ambient: tuple  # ambient LIGHT (const; mat_ambient is the param)
    eps: float
    max_depth: int
    has_mirror: bool
    has_conductor: bool
    has_dielectric: bool
    has_emissive: bool
    with_bwd: bool
    # path tracing (GI continuation)
    pt: bool = False
    pt_importance: bool = False
    pt_nee: bool = True
    # Russian roulette: extra segments past depth 0 (integrator.py
    # RR_DEPTH_FLOOR), replayed kill draws, differentiable 1/prob reweight
    pt_rr: bool = False
    rr_floor: int = 0
    # PT + specular mixtures (round 5): where a hit spawns BOTH a GI child
    # and a specular child, a replayed fair coin picks one and doubles its
    # weight (integrator.py stochastic_spec_gi) — the chain stays linear;
    # each segment runs TWO traces (continuation + GI), merged lane-wise
    pt_spec: bool = False
    # differentiable image textures (round 5): per texture index, () or
    # (interp, blend, w, h, n_rows, row0, flat0, img) into the TRACED
    # texel table (three channel blocks per image, row-masked gather);
    # texel cotangents stream back keyed by flat0 + j*w + i and reduce on
    # the MXU — "differentiable w.r.t. ... textures" (BASELINE.json)
    tex: tuple = ()
    n_texels: int = 0
    tex_rows: int = 0


def bc_depth(bc) -> int:
    """Chain segments: primary + max_depth bounces (+ RR floor)."""
    return bc.max_depth + 1 + (bc.rr_floor if bc.pt_rr else 0)


def bwd_eligible(static, opts, pack=None) -> bool:
    """Static gate for the fused fwd+bwd kernel (see module docstring)."""
    ml_ok = static.n_mesh_lights == 0 or (
        pack is not None and static.n_mesh_lights <= 2
        and int(np.asarray(pack.ml_face_count).max()) <= 32)
    # PT chains stay linear for any material mix (round 5): specular hits
    # use the stochastic single-child estimator (replayed coin picks GI vs
    # specular, weight doubles — integrator.py stochastic_spec_gi), so
    # every node still pushes at most one child.  RR (replayed kill draws
    # + differentiable 1/prob reweight) adds RR_DEPTH_FLOOR unrolled
    # segments, measured fine at the maximum 17 (depth 8 + floor 8 +
    # primary): 45 s Mosaic compile, 0.6 GB peak RSS, finite grads
    # (tools/rr_depth_probe.py, round 5) — so the reference's
    # RR-at-any-depth (raytracer.cpp:137-147) is covered up to the global
    # depth cap below and needs no extra gate.
    #
    # round 5: diffuse image textures are differentiable leaves (the texel
    # table is a traced input; cotangents stream per tap) — small images,
    # replace_kd/blend_kd decals, mesh-attached only
    tex_ok = static.n_textures == 0 or (
        pack is not None and _bwd_tex_ok(static, pack))
    return (
        opts.max_depth <= 8
        and tex_ok
        and static.n_env == 0
        and ml_ok
        and not static.has_motion
        and not static.has_rough
        and getattr(static, "n_brdfs", 0) == 0
        and static.n_point <= 4
        and static.n_directional <= 4
        and static.n_area <= 2
        and static.n_spot <= 2
        and static.n_spheres <= 8
        and static.n_materials <= _BWD_MAX_MATS
        and (static.n_faces == 0 or
             (0 < static.n_work_items <= _BWD_MAX_ROWS))
        and (static.n_work_items > 0 or static.n_spheres > 0)
    )


def _bwd_tex_ok(static, pack) -> bool:
    """Differentiable-texture gate: image kind, diffuse decals
    (replace_kd / blend_kd), <= _BWD_MAX_TEXELS total, mesh-attached, no
    bg decal.  Everything else keeps the jnp wavefront."""
    if static.n_textures > 4:
        return False
    if getattr(static, "bg_tex", -1) >= 0:
        return False
    kind = np.asarray(pack.tex_kind)
    decal = np.asarray(pack.tex_decal)
    ok = {int(DecalMode.REPLACE_KD), int(DecalMode.BLEND_KD)}
    total = 0
    seen = set()
    for i in range(static.n_textures):
        if kind[i] != 0 or int(decal[i]) not in ok:
            return False
        img = int(np.asarray(pack.tex_img)[i])
        if img < 0:
            return False
        if img not in seen:
            seen.add(img)
            total += int(np.asarray(pack.img_w)[img]) \
                * int(np.asarray(pack.img_h)[img])
    if total > _BWD_MAX_TEXELS:
        return False
    if static.n_spheres and (np.asarray(pack.sph_tex) >= 0).any():
        return False
    return True


def build_bwd_consts(pack, opts, with_bwd: bool) -> BwdConsts:
    from advanced_cpu_raytracing_tpu.render.integrator import RR_DEPTH_FLOOR

    assert _RR_FLOOR == RR_DEPTH_FLOOR, (_RR_FLOOR, RR_DEPTH_FLOOR)
    st = pack.static

    def tup(a):
        return tuple(float(x) for x in np.asarray(a).reshape(-1))

    spheres = tuple(
        (tup(np.asarray(pack.sph_minv)[i]), tup(np.asarray(pack.sph_nrm)[i]),
         tup(np.asarray(pack.sph_center)[i]),
         float(np.asarray(pack.sph_radius)[i]),
         int(np.asarray(pack.sph_material)[i]))
        for i in range(st.n_spheres))
    dl_wi = []
    for i in range(st.n_directional):
        dv = np.asarray(pack.dl_dir)[i].astype(np.float64)
        dv = -dv / max(np.linalg.norm(dv), 1e-30)
        dl_wi.append(tup(dv))
    mat_types = tuple(int(x) for x in np.asarray(pack.mat_type))
    cond_nk = tuple(
        (float(np.asarray(pack.mat_ior)[i]),
         float(np.asarray(pack.mat_cond_k)[i]))
        for i in range(st.n_materials))
    diel_abs = tuple(tup(np.asarray(pack.mat_absorption)[i])
                     for i in range(st.n_materials))
    spots = tuple(
        (tup(np.asarray(pack.sl_pos)[i]), tup(np.asarray(pack.sl_dir)[i]),
         float(np.asarray(pack.sl_cos_half_cov)[i]),
         float(np.asarray(pack.sl_cos_half_fall)[i]),
         float(np.asarray(pack.sl_coverage_deg)[i]),
         float(np.asarray(pack.sl_falloff_deg)[i]))
        for i in range(st.n_spot))
    areas = tuple(
        (tup(np.asarray(pack.al_pos)[i]), tup(np.asarray(pack.al_u)[i]),
         tup(np.asarray(pack.al_v)[i]), tup(np.asarray(pack.al_normal)[i]),
         float(np.asarray(pack.al_extent)[i]),
         float(np.asarray(pack.al_area)[i]))
        for i in range(st.n_area))
    # mesh lights: (tri-table row, faceArea/surfaceArea) per face, so the
    # sampled-point gather unrolls over static rows (meshLight.h:27-50,
    # lights.py:139-165; same encoding as megakernel.py build_mega)
    mlights = []
    if st.n_mesh_lights and st.n_work_items:
        wi_ent_np = np.asarray(pack.wi_ent)[:st.n_work_items]
        wi_face_np = np.asarray(pack.wi_face)[:st.n_work_items]
        tri_area_np = np.asarray(pack.tri_area)
        for i in range(st.n_mesh_lights):
            ent = int(np.asarray(pack.ml_ent)[i])
            area = float(np.asarray(pack.ml_area)[i])
            rows = np.where(wi_ent_np == ent)[0]
            mlights.append(tuple(
                (int(rw), float(tri_area_np[wi_face_np[rw]]
                                / max(area, 1e-20)))
                for rw in rows))
    # differentiable textures (round 5): channel-block layout per image
    # (R rows, G rows, B rows at [row0, row0+3*n_rows)), global texel key
    # = flat0 + j*w + i; images shared by several textures pack once
    tex_entries: list = []
    n_texels = 0
    tex_rows = 0
    if st.n_textures and _bwd_tex_ok(st, pack):
        interp_np = np.asarray(pack.tex_interp)
        decal_np = np.asarray(pack.tex_decal)
        timg = np.asarray(pack.tex_img)
        img_info: dict = {}
        for i in range(st.n_textures):
            img = int(timg[i])
            iw = int(np.asarray(pack.img_w)[img])
            ih = int(np.asarray(pack.img_h)[img])
            nr = -(-(iw * ih) // LANES)
            if img not in img_info:
                img_info[img] = (tex_rows, n_texels)
                tex_rows += 3 * nr
                n_texels += iw * ih
            r0, f0 = img_info[img]
            tex_entries.append((
                int(interp_np[i]),
                int(int(decal_np[i]) == int(DecalMode.BLEND_KD)),
                iw, ih, nr, r0, f0, img))

    return BwdConsts(
        n_tri=st.n_work_items, n_mat=st.n_materials, mat_types=mat_types,
        cond_nk=cond_nk, diel_abs=diel_abs, spheres=spheres,
        pl_pos=tuple(tup(np.asarray(pack.pl_pos)[i])
                     for i in range(st.n_point)),
        dl_wi=tuple(dl_wi), spots=spots, areas=areas,
        mlights=tuple(mlights),
        ambient=tup(pack.ambient_light),
        eps=float(np.asarray(pack.shadow_eps)),
        max_depth=int(opts.max_depth),
        has_mirror=st.has_mirror, has_conductor=st.has_conductor,
        has_dielectric=st.has_dielectric, has_emissive=st.has_emissive_mat,
        with_bwd=with_bwd,
        pt=bool(opts.path_tracing),
        pt_importance=bool(opts.importance_sampling),
        pt_nee=bool(opts.next_event_estimation),
        pt_rr=bool(opts.path_tracing and opts.russian_roulette),
        rr_floor=_RR_FLOOR,
        pt_spec=bool(opts.path_tracing
                     and (st.has_mirror or st.has_conductor
                          or st.has_dielectric)),
        tex=tuple(tex_entries),
        n_texels=n_texels,
        tex_rows=tex_rows,
    )


def wavefront_rng(key, r: int, D: int, n_area: int, need_diel: bool,
                  ml_counts: tuple = (), need_gi: bool = False,
                  need_rr: bool = False, need_sg: bool = False):
    """Replay trace_radiance's key-split schedule so the kernel consumes
    the SAME area-light offsets, mesh-light face picks + barycentric
    uniforms, dielectric branch uniforms, and (path tracing) GI direction
    uniforms as the jnp wavefront with the same top-level key.

    Schedule transcribed from integrator.py: trace_radiance splits
    (key -> k_time, k_lens, k_loop); each loop iteration splits
    (key -> key, k_it) then _process_hit splits k_it 9 ways; area light i
    chains splits off k_dl (lights.py:86), mesh light i splits 3 ways
    (lights.py:141), and the stochastic-dielectric choice draws from k_rl
    (integrator.py:402).  A linear specular chain pops segment k at loop
    iteration k, so plane k here lines up with the oracle's iteration k.

    Returns (uab (D*n_area*2, r), uml (D*n_ml*3, r), ud (D or 0, r),
    ugi (D*2 or 0, r)) f32; uml planes per (segment, light) are
    [fsel (float of int), r12a, r12b]; ugi planes per segment are
    [r12[:,0] (phi), r12[:,1] (theta)] from _process_hit's k_gi draw
    (integrator.py:261); with need_rr, D Russian-roulette kill draws
    (k_rr, integrator.py:255) are APPENDED after the 2*D gi planes
    (plane 2*D + k is segment k's draw); with need_sg, D spec-vs-GI coin
    draws (k_c, stochastic_spec_gi) follow after those.
    """
    key, _k_time, _k_lens, k_loop = jax.random.split(key, 4)
    offs, mls, uds, gis, rrs, sgs = [], [], [], [], [], []
    k = k_loop
    for _ in range(D):
        k, k_it = jax.random.split(k)
        (_, _k_gi, _k_rr, k_dl, _k_m, _k_c, _k_t, k_rl,
         _k_rf) = jax.random.split(k_it, 9)
        if need_gi:
            r12 = jax.random.uniform(_k_gi, (r, 2))
            gis.append(r12[:, 0])
            gis.append(r12[:, 1])
        if need_rr:
            rrs.append(jax.random.uniform(_k_rr, (r,)))
        if need_sg:
            sgs.append(jax.random.uniform(_k_c, (r,)))
        kk = k_dl
        for _i in range(n_area):
            kk, sub = jax.random.split(kk)
            o2 = jax.random.uniform(sub, (r, 2), minval=-0.5, maxval=0.5)
            offs.append(o2[:, 0])
            offs.append(o2[:, 1])
        for count in ml_counts:
            kk, k1, k2 = jax.random.split(kk, 3)
            fsel = jax.random.randint(k1, (r,), 0, max(count, 1))
            r12 = jax.random.uniform(k2, (r, 2))
            mls.append(fsel.astype(jnp.float32))
            mls.append(r12[:, 0])
            mls.append(r12[:, 1])
        if need_diel:
            uds.append(jax.random.uniform(k_rl, (r,)))
    uab = (jnp.stack(offs) if offs else jnp.zeros((0, r), jnp.float32))
    uml = (jnp.stack(mls) if mls else jnp.zeros((0, r), jnp.float32))
    ud = (jnp.stack(uds) if uds else jnp.zeros((0, r), jnp.float32))
    ugi = (jnp.stack(gis + rrs + sgs) if (gis or rrs or sgs)
           else jnp.zeros((0, r), jnp.float32))
    return uab.astype(jnp.float32), uml.astype(jnp.float32), \
        ud.astype(jnp.float32), ugi.astype(jnp.float32)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(*refs, bc: BwdConsts):
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     gx_ref, gy_ref, gz_ref,
     tri_ref, chunk_ref, mat_ref, pl_ref, dl_ref, sl_ref, al_ref, ml_ref,
     bg_ref) = refs[:18]
    idx = 18
    if bc.areas:
        uab_ref = refs[idx]
        idx += 1
    if bc.mlights:
        uml_ref = refs[idx]
        idx += 1
    if bc.has_dielectric:
        ud_ref = refs[idx]
        idx += 1
    if bc.pt:
        ugi_ref = refs[idx]
        idx += 1
    if any(bc.tex):
        tex_ref = refs[idx]  # TRACED texel table (channel blocks, round 5)
        idx += 1
    outs = refs[idx:]
    if bc.with_bwd:
        (lx_ref, ly_ref, lz_ref, stream_ref, smalls_ref,
         box_ref, boy_ref, boz_ref, bdx_ref, bdy_ref, bdz_ref) = outs
    else:
        lx_ref, ly_ref, lz_ref = outs
    shape = (ROWS, LANES)
    ZERO = jnp.zeros(shape, jnp.float32)
    ONE = jnp.ones(shape, jnp.float32)
    FALSE = jnp.zeros(shape, jnp.bool_)
    D = bc_depth(bc)  # primary + max_depth bounces (+ RR floor segments)
    eps = bc.eps
    P, Pd = len(bc.pl_pos), len(bc.dl_wi)
    Ps, Pa, Pm = len(bc.spots), len(bc.areas), len(bc.mlights)
    _C = _c_of(bc)

    def norm3(x, y, z):
        inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
        return x * inv, y * inv, z * inv

    def powmax(base, e):
        pos = base > 0.0
        safe = jnp.where(pos, base, 1.0)
        val = jnp.exp(e * jnp.log(safe))
        return jnp.where(pos, val, jnp.where(e == 0.0, 1.0, 0.0))

    def _tile_uv(x):
        """UV tiling (ops/texture.py::tile_uv; mesh.cpp:382-389).
        Differentiable a.e. (grad 1 through x - floor(x))."""
        frac = x - jnp.floor(x)
        frac = jnp.where(frac < 0.0001, 1.0, frac)
        return jnp.where(x > 1.0001, frac, x)

    def onb(nx, ny, nz):
        """Axis-swap orthonormal basis (GetOrthonormalBasis,
        helperMath.cpp:59-85; tie-breaking matches
        utils/math3d.py::orthonormal_basis and the megakernel)."""
        ax, ay, az = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
        use_x = (ax < ay) & (ax < az)
        use_y = (~(ax < ay)) & (ay < az)
        use_z = ~(use_x | use_y)
        rpx = jnp.where(use_x, 1.0, nx)
        rpy = jnp.where(use_y, 1.0, ny)
        rpz = jnp.where(use_z, 1.0, nz)
        ux = rpy * nz - rpz * ny
        uy = rpz * nx - rpx * nz
        uz = rpx * ny - rpy * nx
        ux, uy, uz = norm3(ux, uy, uz)
        vx_ = ny * uz - nz * uy
        vy_ = nz * ux - nx * uz
        vz_ = nx * uy - ny * ux
        vx_, vy_, vz_ = norm3(vx_, vy_, vz_)
        return (ux, uy, uz), (vx_, vy_, vz_)

    def gi_direction(nx, ny, nz, r1, r2):
        """Sampled GI direction over the hemisphere about n
        (ComputeGlobalIllumination, raytracer.cpp:143-173; transcribed
        from integrator.py:261-274 so kernel and oracle agree
        lane-for-lane on the replayed (r1, r2))."""
        phi = TWO_PI * r1
        if bc.pt_importance:
            sin_t = jnp.sqrt(r2)  # theta = asin(sqrt(r2))
            cos_t = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
        else:
            cos_t = r2  # theta = acos(r2)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - r2 * r2, 0.0))
        (ubx, uby, ubz), (vbx, vby, vbz) = onb(nx, ny, nz)
        sc = sin_t * jnp.cos(phi)
        ss = sin_t * jnp.sin(phi)
        return norm3(ubx * sc + nx * cos_t + vbx * ss,
                     uby * sc + ny * cos_t + vby * ss,
                     ubz * sc + nz * cos_t + vbz * ss)

    # ---- non-differentiable scene sweep machinery (megakernel twins) ----
    def tri_hit(ti, px, py, pz, vx, vy, vz):
        v0x = tri_ref[ti, 0]
        v0y = tri_ref[ti, 1]
        v0z = tri_ref[ti, 2]
        e1x = v0x - tri_ref[ti, 3]
        e1y = v0y - tri_ref[ti, 4]
        e1z = v0z - tri_ref[ti, 5]
        e2x = v0x - tri_ref[ti, 6]
        e2y = v0y - tri_ref[ti, 7]
        e2z = v0z - tri_ref[ti, 8]
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
        valid = ((det_a != 0.0) & (beta >= 0.0) & (gamma >= 0.0)
                 & (beta + gamma <= 1.0) & (t > 0.0))
        return t, valid, beta, gamma

    def sphere_local(s, px, py, pz, is_point):
        m = s[0]
        t = 1.0 if is_point else 0.0
        return (m[0] * px + m[1] * py + m[2] * pz + m[3] * t,
                m[4] * px + m[5] * py + m[6] * pz + m[7] * t,
                m[8] * px + m[9] * py + m[10] * pz + m[11] * t)

    def sphere_t(s, px, py, pz, vx, vy, vz):
        """Differentiable quadratic solve (Sphere::Intersect,
        src/sphere.cpp:31-72); also used non-diff in the sweep."""
        olx, oly, olz = sphere_local(s, px, py, pz, True)
        dlx, dly, dlz = sphere_local(s, vx, vy, vz, False)
        c = s[2]
        rad = s[3]
        ocx, ocy, ocz = olx - c[0], oly - c[1], olz - c[2]
        a = dlx * dlx + dly * dly + dlz * dlz
        b = 2.0 * (dlx * ocx + dly * ocy + dlz * ocz)
        cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        delta = b * b - 4.0 * a * cc
        sq = jnp.sqrt(jnp.where(delta > 0.0, delta, 1.0))
        sq = jnp.where(delta > 0.0, sq, 0.0)
        denom = jnp.where(a > 0.0, 2.0 * a, 1.0)
        t1 = (-b + sq) / denom
        t2 = (-b - sq) / denom
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        t = jnp.where(lo > 0.0, lo, hi)
        valid = (delta >= 0.0) & (t > 0.0) & (a > 0.0)
        return t, valid

    def sphere_normal(s, px, py, pz, vx, vy, vz, t):
        """Unit world normal at parameter t (differentiable)."""
        olx, oly, olz = sphere_local(s, px, py, pz, True)
        dlx, dly, dlz = sphere_local(s, vx, vy, vz, False)
        c = s[2]
        prx = olx + t * dlx - c[0]
        pry = oly + t * dly - c[1]
        prz = olz + t * dlz - c[2]
        nm = s[1]
        return norm3(nm[0] * prx + nm[1] * pry + nm[2] * prz,
                     nm[3] * prx + nm[4] * pry + nm[5] * prz,
                     nm[6] * prx + nm[7] * pry + nm[8] * prz)

    def sel_sphere_consts(sphf):
        """Per-lane constants of the WINNING sphere (masked selects).

        The differentiable step then runs ONE quadratic solve instead of
        unrolling every sphere — without this, the per-sphere vjp graphs
        multiply and XLA's compile time explodes (hours on CPU at 5
        spheres x depth 3)."""
        m = [ONE if j in (0, 5, 10) else ZERO for j in range(12)]
        nm = [ONE if j in (0, 4, 8) else ZERO for j in range(9)]
        c = [ZERO, ZERO, ZERO]
        rad = ONE
        for si, s in enumerate(bc.spheres):
            sm = sphf == float(si)
            m = [jnp.where(sm, s[0][j], m[j]) for j in range(12)]
            nm = [jnp.where(sm, s[1][j], nm[j]) for j in range(9)]
            c = [jnp.where(sm, s[2][j], c[j]) for j in range(3)]
            rad = jnp.where(sm, s[3], rad)
        return (tuple(m), tuple(nm), tuple(c), rad, 0)

    n_chunks = (bc.n_tri + CHUNK - 1) // CHUNK

    def chunk_sweep(px, py, pz, vx, vy, vz, body, init, live_of):
        if n_chunks <= 1:
            return jax.lax.fori_loop(0, bc.n_tri, body, init)
        ivx = 1.0 / vx
        ivy = 1.0 / vy
        ivz = 1.0 / vz

        def chunk_body(ci, carry):
            t_b = live_of(carry)
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
            enter = (tmax > 0) & (tmax >= tmin) & (tmin < t_b)
            lo = ci * CHUNK
            hi = jnp.minimum(lo + CHUNK, bc.n_tri)
            return jax.lax.cond(
                jnp.any(enter),
                lambda c: jax.lax.fori_loop(lo, hi, body, c),
                lambda c: c, carry)

        return jax.lax.fori_loop(0, n_chunks, chunk_body, init)

    has_dtex = any(bc.tex)

    def trace(px, py, pz, vx, vy, vz, active):
        """Closest hit carrying the winner's vertices + table row (+ the
        diffuse-texture slot, interpolated UV and per-vertex UVs for
        differentiable-texture scenes, round 5).

        Returns dict of stored (stop-grad) facts for one chain segment."""
        neg1 = jnp.full(shape, -1.0)
        init = (jnp.where(active, BIG, 0.0), neg1,  # t, row
                ZERO, ZERO, ONE,  # n (tri const normal)
                ZERO,  # matf
                ZERO, ZERO, ZERO, ZERO, ZERO, ZERO, ZERO, ZERO, ZERO)  # v9
        if has_dtex:
            # td slot + interpolated uv + uv012 (tri cols 19, 24:30)
            init = init + (neg1, ZERO, ZERO) + (ZERO,) * 6

        def body(ti, carry):
            t_b = carry[0]
            t, valid, beta, gamma = tri_hit(ti, px, py, pz, vx, vy, vz)
            better = valid & (t < t_b)

            def sel(cur, new):
                return jnp.where(better, new, cur)

            out = (sel(t_b, t), sel(carry[1], ti.astype(jnp.float32)),
                   sel(carry[2], tri_ref[ti, 9]),
                   sel(carry[3], tri_ref[ti, 10]),
                   sel(carry[4], tri_ref[ti, 11]),
                   sel(carry[5], tri_ref[ti, 12])) + tuple(
                sel(carry[6 + j], tri_ref[ti, j]) for j in range(9))
            if has_dtex:
                u0 = tri_ref[ti, 24]
                v0 = tri_ref[ti, 25]
                ui = u0 + beta * (tri_ref[ti, 26] - u0) \
                    + gamma * (tri_ref[ti, 28] - u0)
                vi = v0 + beta * (tri_ref[ti, 27] - v0) \
                    + gamma * (tri_ref[ti, 29] - v0)
                out = out + (sel(carry[15], tri_ref[ti, 19]),
                             sel(carry[16], ui), sel(carry[17], vi)) \
                    + tuple(sel(carry[18 + j], tri_ref[ti, 24 + j])
                            for j in range(6))
            return out

        if bc.n_tri > 0:
            init = chunk_sweep(px, py, pz, vx, vy, vz, body, init,
                               live_of=lambda c: c[0])
        t_b, row = init[0], init[1]
        nx, ny, nz = init[2], init[3], init[4]
        matf = init[5]
        v9 = list(init[6:15])
        sphf = jnp.full(shape, -1.0)
        for si, s in enumerate(bc.spheres):
            t, valid = sphere_t(s, px, py, pz, vx, vy, vz)
            better = valid & (t < t_b) & active
            t_b = jnp.where(better, t, t_b)
            row = jnp.where(better, -1.0, row)
            sphf = jnp.where(better, float(si), sphf)
            matf = jnp.where(better, float(s[4]), matf)
        hit = t_b < (BIG * 0.5)
        st_ = dict(t0=t_b, row=row, sphf=sphf, matf=matf, hit=hit,
                   n_tri=(nx, ny, nz), v9=v9)
        if has_dtex:
            # eligible spheres are untextured (_bwd_tex_ok); a sphere
            # winner overwrote row with -1 but the td slot must clear too
            st_["td"] = jnp.where(st_["row"] >= 0.0, init[15], -1.0)
            st_["tex_uv"] = (init[16], init[17])
            st_["uv012"] = tuple(init[18:24])
        return st_

    def merge_st(m, a, b):
        """Lane-wise trace-dict select: ``a`` where ``m`` else ``b``
        (pt_spec: lanes that took the GI child reuse the previous
        segment's GI trace, specular-chain lanes get a fresh one).
        Bool fields select through f32 — Mosaic mishandles some (8,128)
        i1 vector selects (the same class as the i1 loop-carry quirk)."""
        def sel(x, y):
            if x.dtype == jnp.bool_:
                return jnp.where(m, x.astype(jnp.float32),
                                 y.astype(jnp.float32)) > 0.5
            return jnp.where(m, x, y)

        out = {}
        for key_ in a:
            va, vb = a[key_], b[key_]
            if isinstance(va, (tuple, list)):
                out[key_] = type(va)(sel(x, y) for x, y in zip(va, vb))
            else:
                out[key_] = sel(va, vb)
        return out

    def shadow(px, py, pz, vx, vy, vz, limit, gate):
        def body(ti, blocked):
            t, valid = tri_hit(ti, px, py, pz, vx, vy, vz)[:2]
            if bc.has_emissive:
                # CastShadowRay skips emissive meshes (raytracer.cpp:590-593)
                valid = valid & (tri_ref[ti, 14] < 0.5)
            return jnp.maximum(
                blocked, jnp.where(valid & (t < limit), 1.0, 0.0))

        blocked = jnp.where(gate, 0.0, 1.0)
        if bc.n_tri > 0:
            blocked = chunk_sweep(
                px, py, pz, vx, vy, vz, body, blocked,
                live_of=lambda b: jnp.where(b > 0.5, 0.0, limit))
        out = blocked > 0.5
        for s in bc.spheres:
            t, valid = sphere_t(s, px, py, pz, vx, vy, vz)
            out = out | (valid & (t < limit))
        return out

    def mat_mask(matf, mtype):
        m = FALSE
        for i, mt in enumerate(bc.mat_types):
            if mt == mtype:
                m = m | (matf == float(i))
        return m

    # ---- traced parameter tables ----
    mat = mat_ref[:, :]  # (M, 16): amb3 kd3 ks3 mir3 phong rad3
    pl_scal = tuple(pl_ref[i, c] for i in range(P) for c in range(3))
    dl_scal = tuple(dl_ref[i, c] for i in range(Pd) for c in range(3))
    sl_scal = tuple(sl_ref[i, c] for i in range(Ps) for c in range(3))
    al_scal = tuple(al_ref[i, c] for i in range(Pa) for c in range(3))
    ml_scal = tuple(ml_ref[i, c] for i in range(Pm) for c in range(3))
    bg_scal = tuple(bg_ref[0, c] for c in range(3))

    def matsel(matf, col):
        out = jnp.full(shape, 0.0) + mat[0, col]
        for i in range(1, bc.n_mat):
            out = jnp.where(matf == float(i), mat[i, col], out)
        return out

    # ---- one differentiable chain step ----
    def make_step(k, st):
        """st: stored stop-grad facts for segment k.  The returned function
        is pure jnp over its DIFFERENTIABLE leaves; jax.vjp of it supplies
        the adjoint.  Transcribes PerformShading for the chain case
        (raytracer.cpp:65-134) exactly like the jnp wavefront."""
        is_tri = st["row"] >= 0.0
        hit = st["hit"]
        lit = st["lit"]
        ntx, nty, ntz = st["n_tri"]
        if bc.spheres:
            s_sel = sel_sphere_consts(st["sphf"])
            is_sph = st["sphf"] >= 0.0

        def step(o3, d3, w3, v9, lv9s, kd3, ks3, amb3, mir3, phong, rad3,
                 texv, pls, dls, sls, als, mls, bgs):
            ox_, oy_, oz_ = o3
            dx_, dy_, dz_ = d3
            wx_, wy_, wz_ = w3
            # --- differentiable t on the stored winner ---
            v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = v9
            e1x, e1y, e1z = v0x - v1x, v0y - v1y, v0z - v1z
            e2x, e2y, e2z = v0x - v2x, v0y - v2y, v0z - v2z
            bx, by, bz = v0x - ox_, v0y - oy_, v0z - oz_
            m0 = e2y * dz_ - dy_ * e2z
            m1 = e2x * dz_ - dx_ * e2z
            m2 = e2x * dy_ - dx_ * e2y
            det_a = e1x * m0 - e1y * m1 + e1z * m2
            safe = jnp.where(det_a == 0.0, 1.0, det_a)
            q0 = e2y * bz - by * e2z
            q1 = e2x * bz - bx * e2z
            q2 = e2x * by - bx * e2y
            t = (e1x * q0 - e1y * q1 + e1z * q2) / safe
            t = jnp.where(is_tri, t, 0.0)
            nx, ny, nz = (jnp.where(is_tri, ntx, 0.0),
                          jnp.where(is_tri, nty, 0.0),
                          jnp.where(is_tri, ntz, 1.0))
            if bc.spheres:
                # ONE solve on the per-lane selected winner constants
                ts, _ = sphere_t(s_sel, ox_, oy_, oz_, dx_, dy_, dz_)
                ts_safe = jnp.where(is_sph, ts, 0.0)
                snx, sny, snz = sphere_normal(
                    s_sel, ox_, oy_, oz_, dx_, dy_, dz_, ts_safe)
                t = jnp.where(is_sph, ts, t)
                nx = jnp.where(is_sph, snx, nx)
                ny = jnp.where(is_sph, sny, ny)
                nz = jnp.where(is_sph, snz, nz)
            t = jnp.where(hit, t, 0.0)
            px = ox_ + t * dx_
            py = oy_ + t * dy_
            pz = oz_ + t * dz_
            wox, woy, woz = -dx_, -dy_, -dz_

            # differentiable texture modulation (round 5;
            # diffuse_reflectance, raytracer.cpp:478-508): uv recomputed
            # differentiably through the winner's barycentrics (verts
            # gradients flow through uv exactly like the oracle's
            # _gather_tri_uv -> sample_bilinear), texel VALUES are the
            # ``texv`` leaves, bilinear weights differentiable, nearest
            # taps stop-grad — the oracle's own semantics
            if has_dtex:
                beta_d = (bx * m0 - by * m1 + bz * m2) / safe
                nn0 = by * dz_ - dy_ * bz
                nn1 = bx * dz_ - dx_ * bz
                nn2 = bx * dy_ - dx_ * by
                gamma_d = (e1x * nn0 - e1y * nn1 + e1z * nn2) / safe
                uv012 = st["uv012"]
                u_d = _tile_uv(uv012[0] + beta_d * (uv012[2] - uv012[0])
                               + gamma_d * (uv012[4] - uv012[0]))
                v_d = _tile_uv(uv012[1] + beta_d * (uv012[3] - uv012[1])
                               + gamma_d * (uv012[5] - uv012[1]))
                td_f = st["td"]
                kd_eff = list(kd3)
                for ti_, meta in enumerate(bc.tex):
                    if not meta:
                        continue
                    interp, blend, iw, ih, _nr, _r0, _f0, _img = meta
                    m_t = td_f == float(ti_)
                    if interp == 0:
                        tap = [texv[0], texv[1], texv[2]]
                    else:
                        fw, fh = float(iw), float(ih)
                        fi = jnp.clip(u_d * fw, 0.0, fw - 1.0)
                        fj = jnp.clip(v_d * fh, 0.0, fh - 1.0)
                        dxw = fi - jnp.floor(fi)
                        dyw = fj - jnp.floor(fj)
                        w00 = (1.0 - dxw) * (1.0 - dyw)
                        w10 = dxw * (1.0 - dyw)
                        w01 = (1.0 - dxw) * dyw
                        w11 = dxw * dyw
                        tap = [w00 * texv[c] + w10 * texv[3 + c]
                               + w01 * texv[6 + c] + w11 * texv[9 + c]
                               for c in range(3)]
                    s_ = 1.0 / 255.0
                    for c in range(3):
                        val = tap[c] * s_
                        if blend:
                            val = (val + kd3[c]) * 0.5
                        kd_eff[c] = jnp.where(m_t, val, kd_eff[c])
                kd_eff = tuple(kd_eff)
            else:
                kd_eff = kd3

            # Beer's law at pop time (raytracer.cpp:416-423, folded in like
            # integrator.py:210-212): absorption constant chosen by the
            # PARENT segment's topology (stop-grad), t differentiable.
            # Miss lanes have t = 0 -> atten = 1, so this is unconditional.
            if bc.has_dielectric and k > 0:
                ab = st["absorb3"]
                wx_ = wx_ * jnp.exp(-ab[0] * t)
                wy_ = wy_ * jnp.exp(-ab[1] * t)
                wz_ = wz_ * jnp.exp(-ab[2] * t)

            lr = lg = lb = ZERO
            if k == 0:
                mp = st["miss_primary"]
                lr = lr + jnp.where(mp, wx_ * bgs[0], 0.0)
                lg = lg + jnp.where(mp, wy_ * bgs[1], 0.0)
                lb = lb + jnp.where(mp, wz_ * bgs[2], 0.0)

            # emissive hit: radiance * 2pi, nothing else (raytracer.cpp:81-84)
            if bc.has_emissive:
                em = st["is_em"]
                lr = lr + jnp.where(em, wx_ * rad3[0] * TWO_PI, 0.0)
                lg = lg + jnp.where(em, wy_ * rad3[1] * TWO_PI, 0.0)
                lb = lb + jnp.where(em, wz_ * rad3[2] * TWO_PI, 0.0)

            # ambient (raytracer.cpp:98-100)
            if any(a != 0.0 for a in bc.ambient):
                lr = lr + jnp.where(lit, wx_ * bc.ambient[0] * amb3[0], 0.0)
                lg = lg + jnp.where(lit, wy_ * bc.ambient[1] * amb3[1], 0.0)
                lb = lb + jnp.where(lit, wz_ * bc.ambient[2] * amb3[2], 0.0)

            def shade_unit(wix, wiy, wiz):
                cos_t = jnp.maximum(0.0, wix * nx + wiy * ny + wiz * nz)
                hx, hy, hz = norm3(wix + wox, wiy + woy, wiz + woz)
                cos_hm = jnp.maximum(0.0, hx * nx + hy * ny + hz * nz)
                spec = powmax(cos_hm, phong)
                return (kd_eff[0] * cos_t + ks3[0] * spec,
                        kd_eff[1] * cos_t + ks3[1] * spec,
                        kd_eff[2] * cos_t + ks3[2] * spec)

            for i, lp in enumerate(bc.pl_pos):
                tlx = lp[0] - px
                tly = lp[1] - py
                tlz = lp[2] - pz
                d2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
                inv = jax.lax.rsqrt(d2)
                wix, wiy, wiz = tlx * inv, tly * inv, tlz * inv
                vx_, vy_, vz_ = shade_unit(wix, wiy, wiz)
                g = lit & st[f"vis_p{i}"]
                lr = lr + jnp.where(g, wx_ * pls[3 * i + 0] / d2 * vx_, 0.0)
                lg = lg + jnp.where(g, wy_ * pls[3 * i + 1] / d2 * vy_, 0.0)
                lb = lb + jnp.where(g, wz_ * pls[3 * i + 2] / d2 * vz_, 0.0)

            for i, wi in enumerate(bc.dl_wi):
                wix = jnp.full(shape, wi[0])
                wiy = jnp.full(shape, wi[1])
                wiz = jnp.full(shape, wi[2])
                vx_, vy_, vz_ = shade_unit(wix, wiy, wiz)
                g = lit & st[f"vis_d{i}"]
                lr = lr + jnp.where(g, wx_ * dls[3 * i + 0] * vx_, 0.0)
                lg = lg + jnp.where(g, wy_ * dls[3 * i + 1] * vy_, 0.0)
                lb = lb + jnp.where(g, wz_ * dls[3 * i + 2] * vz_, 0.0)

            # spot lights (raytracer.cpp:767-776, spotLight.h:33-57;
            # lights.py:110-137).  All cone tests in COSINE space like the
            # megakernel (arccos is strictly decreasing and Mosaic lowers no
            # acos): alpha > fall/2 <=> cos_a < cos(fall/2), alpha <= 0 <=>
            # cos_a >= 1 — and no gradient crosses the comparisons anyway
            for i, sp in enumerate(bc.spots):
                spos, sdir, chc, chf, cov, fall = sp
                tlx = spos[0] - px
                tly = spos[1] - py
                tlz = spos[2] - pz
                dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
                inv = 1.0 / jnp.maximum(dist, 1e-20)
                wix, wiy, wiz = tlx * inv, tly * inv, tlz * inv
                cos_alpha = jnp.clip(
                    -(sdir[0] * wix + sdir[1] * wiy + sdir[2] * wiz),
                    -1.0, 1.0)
                irr = 1.0 / jnp.maximum(dist * dist, 1e-20)
                s = jnp.maximum(
                    (cos_alpha - chc) / max(chf - chc, 1e-9), 0.0) ** 4
                fac = jnp.where(cos_alpha < chf, s, 1.0)
                outside = (cos_alpha >= 1.0) | (cos_alpha < chc)
                fac = jnp.where(outside, 0.0, fac)
                vx_, vy_, vz_ = shade_unit(wix, wiy, wiz)
                g = lit & st[f"vis_s{i}"]
                c = irr * fac
                lr = lr + jnp.where(g, wx_ * sls[3 * i + 0] * c * vx_, 0.0)
                lg = lg + jnp.where(g, wy_ * sls[3 * i + 1] * c * vy_, 0.0)
                lb = lb + jnp.where(g, wz_ * sls[3 * i + 2] * c * vz_, 0.0)

            # area lights (raytracer.cpp:720-740, areaLight.h:34-41): the
            # sampled point is a stop-grad input (wavefront_rng offsets);
            # irradiance L*A*cos/d^2 stays differentiable through the hit
            # point, matching lights.py:84-101
            for i, ar in enumerate(bc.areas):
                apos, au, av, anrm, ext, area = ar
                off0, off1 = st[f"aoff{i}"]
                spx = apos[0] + au[0] * (ext * off0) + av[0] * (ext * off1)
                spy = apos[1] + au[1] * (ext * off0) + av[1] * (ext * off1)
                spz = apos[2] + au[2] * (ext * off0) + av[2] * (ext * off1)
                tlx = spx - px
                tly = spy - py
                tlz = spz - pz
                dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
                inv = 1.0 / jnp.maximum(dist, 1e-20)
                wix, wiy, wiz = tlx * inv, tly * inv, tlz * inv
                l_cos = -(anrm[0] * wix + anrm[1] * wiy + anrm[2] * wiz)
                l_cos = jnp.where(l_cos < 0, -l_cos, l_cos)  # two-sided
                irr = area * l_cos / jnp.maximum(dist * dist, 1e-20)
                vx_, vy_, vz_ = shade_unit(wix, wiy, wiz)
                g = lit & st[f"vis_a{i}"]
                lr = lr + jnp.where(g, wx_ * als[3 * i + 0] * irr * vx_, 0.0)
                lg = lg + jnp.where(g, wy_ * als[3 * i + 1] * irr * vy_, 0.0)
                lb = lb + jnp.where(g, wz_ * als[3 * i + 2] * irr * vz_, 0.0)

            # mesh lights (raytracer.cpp:778-803, meshLight.h:27-50;
            # lights.py:139-165): sqrt-warped barycentric point on the
            # sampled face — the face pick and warp uniforms are stop-grad
            # inputs, the sampled POSITION stays differentiable through the
            # light mesh's world vertices (lv9s leaves), irradiance =
            # radiance * (faceArea/surfaceArea) * 2pi with no cosine/d^2
            for i in range(len(bc.mlights)):
                a9 = lv9s[i]
                r12a, r12b = st[f"mlr{i}"]
                wgt = st[f"mlw{i}"]
                sq = jnp.sqrt(r12a)
                qx = a9[3] * (1.0 - r12b) + a9[6] * r12b
                qy = a9[4] * (1.0 - r12b) + a9[7] * r12b
                qz = a9[5] * (1.0 - r12b) + a9[8] * r12b
                spx = a9[0] * (1.0 - sq) + qx * sq
                spy = a9[1] * (1.0 - sq) + qy * sq
                spz = a9[2] * (1.0 - sq) + qz * sq
                tlx = spx - px
                tly = spy - py
                tlz = spz - pz
                dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
                inv = 1.0 / jnp.maximum(dist, 1e-20)
                wix, wiy, wiz = tlx * inv, tly * inv, tlz * inv
                irr = wgt * TWO_PI
                vx_, vy_, vz_ = shade_unit(wix, wiy, wiz)
                # PT: NEE skips the mesh light this lane's GI ray hit
                # (double-count suppression, raytracer.cpp:180-188, 778-781)
                g = lit & st[f"vis_m{i}"] & ~st[f"skip_m{i}"]
                lr = lr + jnp.where(g, wx_ * mls[3 * i + 0] * irr * vx_, 0.0)
                lg = lg + jnp.where(g, wy_ * mls[3 * i + 1] * irr * vy_, 0.0)
                lb = lb + jnp.where(g, wz_ * mls[3 * i + 2] * irr * vz_, 0.0)

            # --- chain child: specular (mirror 442-472, conductor 208-254,
            # dielectric 261-415 single-path) or sampled GI continuation
            # (path tracing, raytracer.cpp:135-191) ---
            if k == bc_depth(bc) - 1 or not (bc.has_mirror or bc.has_conductor
                                         or bc.has_dielectric or bc.pt):
                z = ZERO
                return (lr, lg, lb, z, z, z + 1.0, z, z, z + 1.0, z, z, z)
            # pt_spec: both a GI and a specular child exist below
            # bc.max_depth — compute both (unmasked) and let the replayed
            # coin's stored choice pick per lane, doubling the taken
            # child's weight where both were available (the
            # stochastic_spec_gi estimator; integrator.py)
            merged = bc.pt and bc.pt_spec and k < bc.max_depth
            if bc.pt:
                # GI bounce: direction from the replayed uniforms + the
                # step's differentiable normal (constant for tris,
                # differentiable for spheres — same semantics as the
                # oracle), weight = w * Shade(unit) * 2pi
                # (integrator.py:286-292)
                chain = st["chain"]
                r1, r2 = st["gi_r12"]
                gdx, gdy, gdz = gi_direction(nx, ny, nz, r1, r2)
                vx_, vy_, vz_ = shade_unit(gdx, gdy, gdz)
                if bc.pt_rr and (bc.max_depth - k) <= 0:
                    # differentiable RR reweight 1/prob on the SAME
                    # throughput the kill decision used (integrator.py:257)
                    prob = jnp.clip(
                        jnp.maximum(wx_, jnp.maximum(wy_, wz_)), 1e-4, 1.0)
                    inv_p = 1.0 / prob
                    vx_ = vx_ * inv_p
                    vy_ = vy_ * inv_p
                    vz_ = vz_ * inv_p
                giox = px + nx * 1e-4
                gioy = py + ny * 1e-4
                gioz = pz + nz * 1e-4
                giwx = wx_ * vx_ * TWO_PI
                giwy = wy_ * vy_ * TWO_PI
                giwz = wz_ * vz_ * TWO_PI
                if not merged:
                    o2x = jnp.where(chain, giox, 0.0)
                    o2y = jnp.where(chain, gioy, 0.0)
                    o2z = jnp.where(chain, gioz, 0.0)
                    d2x = jnp.where(chain, gdx, 0.0)
                    d2y = jnp.where(chain, gdy, 0.0)
                    d2z = jnp.where(chain, gdz, 1.0)
                    w2x = jnp.where(chain, giwx, 0.0)
                    w2y = jnp.where(chain, giwy, 0.0)
                    w2z = jnp.where(chain, giwz, 0.0)
                    return (lr, lg, lb, o2x, o2y, o2z, d2x, d2y, d2z,
                            w2x, w2y, w2z)
            chain = st["chain"]
            ndotwo = nx * wox + ny * woy + nz * woz
            rx, ry, rz = norm3(2.0 * nx * ndotwo - wox,
                               2.0 * ny * ndotwo - woy,
                               2.0 * nz * ndotwo - woz)
            fx = fy = fz = ZERO
            if bc.has_mirror:
                mm = st["is_mirror"]
                fx = jnp.where(mm, mir3[0], fx)
                fy = jnp.where(mm, mir3[1], fy)
                fz = jnp.where(mm, mir3[2], fz)
            if bc.has_conductor:
                cm = st["is_cond"]
                n2 = ZERO
                k2 = ZERO
                for i, (ior_i, k_i) in enumerate(bc.cond_nk):
                    sel = st["matf"] == float(i)
                    n2 = jnp.where(sel, ior_i, n2)
                    k2 = jnp.where(sel, k_i, k2)
                n2k2 = n2 * n2 + k2 * k2
                two = 2.0 * n2 * ndotwo
                cos2 = ndotwo * ndotwo
                rs = (n2k2 - two + cos2) / jnp.maximum(
                    n2k2 + two + cos2, 1e-20)
                rp = (n2k2 * cos2 - two + 1.0) / jnp.maximum(
                    n2k2 * cos2 + two + 1.0, 1e-20)
                ratio = 0.5 * (rs + rp)
                fx = jnp.where(cm, mir3[0] * ratio, fx)
                fy = jnp.where(cm, mir3[1] * ratio, fy)
                fz = jnp.where(cm, mir3[2] * ratio, fz)
            # mirror/conductor child (origin +n*eps, reflected about n)
            o2x = px + nx * eps
            o2y = py + ny * eps
            o2z = pz + nz * eps
            d2x, d2y, d2z = rx, ry, rz
            w2x = wx_ * fx
            w2y = wy_ * fy
            w2z = wz_ * fz
            if bc.has_dielectric:
                # single-path dielectric: the Fresnel weight cancels against
                # the branch-selection probability, so both legs carry the
                # parent's (post-Beer) weight (integrator.py:398-417);
                # topology (entering sign, branch choice) is stop-grad, the
                # directions stay differentiable through n and d
                dr = st["d_reflect"]
                df = st["d_refract"]
                sgn = st["d_sign"]  # +1 entering, -1 exiting
                ratio_n = st["d_ratio"]  # n1/n2 (medium/ior constants)
                nmx, nmy, nmz = nx * sgn, ny * sgn, nz * sgn
                cos_i = -(dx_ * nmx + dy_ * nmy + dz_ * nmz)
                rmx, rmy, rmz = norm3(2.0 * nmx * cos_i + dx_,
                                      2.0 * nmy * cos_i + dy_,
                                      2.0 * nmz * cos_i + dz_)
                crit = ratio_n * ratio_n * (1.0 - cos_i * cos_i)
                # sqrt'(0)=inf NaN-guard: only refract lanes consume cos_p
                cos_p = jnp.sqrt(jnp.where(
                    df, jnp.maximum(1.0 - crit, 1e-20), 1.0))
                tnx, tny, tnz = norm3(
                    (dx_ + nmx * cos_i) * ratio_n - nmx * cos_p,
                    (dy_ + nmy * cos_i) * ratio_n - nmy * cos_p,
                    (dz_ + nmz * cos_i) * ratio_n - nmz * cos_p)
                o2x = jnp.where(dr, px + nmx * eps, o2x)
                o2y = jnp.where(dr, py + nmy * eps, o2y)
                o2z = jnp.where(dr, pz + nmz * eps, o2z)
                d2x = jnp.where(dr, rmx, d2x)
                d2y = jnp.where(dr, rmy, d2y)
                d2z = jnp.where(dr, rmz, d2z)
                w2x = jnp.where(dr, wx_, w2x)
                w2y = jnp.where(dr, wy_, w2y)
                w2z = jnp.where(dr, wz_, w2z)
                o2x = jnp.where(df, px - nmx * eps, o2x)
                o2y = jnp.where(df, py - nmy * eps, o2y)
                o2z = jnp.where(df, pz - nmz * eps, o2z)
                d2x = jnp.where(df, tnx, d2x)
                d2y = jnp.where(df, tny, d2y)
                d2z = jnp.where(df, tnz, d2z)
                w2x = jnp.where(df, wx_, w2x)
                w2y = jnp.where(df, wy_, w2y)
                w2z = jnp.where(df, wz_, w2z)
            if merged:
                # the stored coin choice picks GI vs specular per lane and
                # doubles the taken child's weight where both existed
                cg = st["cont_gi"]
                two = jnp.where(st["both"], 2.0, 1.0)
                o2x = jnp.where(cg, giox, o2x)
                o2y = jnp.where(cg, gioy, o2y)
                o2z = jnp.where(cg, gioz, o2z)
                d2x = jnp.where(cg, gdx, d2x)
                d2y = jnp.where(cg, gdy, d2y)
                d2z = jnp.where(cg, gdz, d2z)
                w2x = jnp.where(cg, giwx, w2x) * two
                w2y = jnp.where(cg, giwy, w2y) * two
                w2z = jnp.where(cg, giwz, w2z) * two
            o2x = jnp.where(chain, o2x, 0.0)
            o2y = jnp.where(chain, o2y, 0.0)
            o2z = jnp.where(chain, o2z, 0.0)
            d2x = jnp.where(chain, d2x, 0.0)
            d2y = jnp.where(chain, d2y, 0.0)
            d2z = jnp.where(chain, d2z, 1.0)
            w2x = jnp.where(chain, w2x, 0.0)
            w2y = jnp.where(chain, w2y, 0.0)
            w2z = jnp.where(chain, w2z, 0.0)
            return (lr, lg, lb, o2x, o2y, o2z, d2x, d2y, d2z, w2x, w2y, w2z)

        return step

    # ---- forward chain (unrolled; every per-depth leaf kept live) ----
    o3 = (ox_ref[:, :], oy_ref[:, :], oz_ref[:, :])
    d3 = (dx_ref[:, :], dy_ref[:, :], dz_ref[:, :])
    w3 = (ONE, ONE, ONE)
    active = jnp.ones(shape, jnp.bool_)
    medium = ONE  # refractive index of the current medium (stop-grad)
    absorb3 = (ZERO, ZERO, ZERO)  # Beer constant of the popped ray
    Lr = Lg = Lb = ZERO
    segs = []  # (step_fn, leaves) per depth
    pending_st = None  # PT: segment k's GI trace IS segment k+1's trace
    cont_gi_prev = None  # pt_spec: which lanes took the GI child
    for k in range(D):
        if pending_st is not None and not bc.pt_spec:
            st = pending_st
            pending_st = None
        elif pending_st is not None:
            # pt_spec: GI-takers reuse the stored GI trace; lanes that
            # continued their specular chain trace fresh (inactive lanes
            # keep chunk culls dead, so blocks without specular takers
            # sweep nothing)
            st_new = trace(o3[0], o3[1], o3[2], d3[0], d3[1], d3[2],
                           active & ~cont_gi_prev)
            st = merge_st(cont_gi_prev, pending_st, st_new)
            pending_st = None
        else:
            st = trace(o3[0], o3[1], o3[2], d3[0], d3[1], d3[2], active)
        hit = st["hit"] & active
        st["hit"] = hit
        matf = st["matf"]
        st["absorb3"] = absorb3
        if bc.has_emissive:
            st["is_em"] = hit & mat_mask(matf, _EMISSIVE)
            shadeable = hit & ~st["is_em"]
        else:
            shadeable = hit
        if bc.has_dielectric:
            # travellingInsideAnObject (raytracer.cpp:77-78): no
            # ambient/direct light while inside
            inside = medium > 1.00001
            st["lit"] = shadeable & ~inside
        else:
            st["lit"] = shadeable
        if bc.pt and not bc.pt_nee:
            # PT without NEE: no ambient / direct lighting at all —
            # emissive hits carry every light path (integrator.py:294)
            st["lit"] = FALSE
        st["miss_primary"] = active & ~hit if k == 0 else FALSE
        # geometric normal incl. sphere winners (one selected-consts solve)
        nx_, ny_, nz_ = st["n_tri"]
        if bc.spheres:
            s_sel_f = sel_sphere_consts(st["sphf"])
            is_sph_f = st["sphf"] >= 0.0
            snx, sny, snz = sphere_normal(
                s_sel_f, o3[0], o3[1], o3[2], d3[0], d3[1], d3[2],
                jnp.where(is_sph_f, st["t0"], 0.0))
            nx_ = jnp.where(is_sph_f, snx, nx_)
            ny_ = jnp.where(is_sph_f, sny, ny_)
            nz_ = jnp.where(is_sph_f, snz, nz_)
        # chain children (topology): mirror/conductor/dielectric, depth left
        next_medium = ONE
        next_absorb = (ZERO, ZERO, ZERO)
        if k < bc.max_depth and (bc.has_mirror or bc.has_conductor
                                 or bc.has_dielectric):
            chain = FALSE
            if bc.has_mirror:
                st["is_mirror"] = hit & mat_mask(matf, _MIRROR)
                chain = chain | st["is_mirror"]
            if bc.has_conductor:
                # the ratio>1e-4 gate (raytracer.cpp:247) is topology; the
                # ratio VALUE is recomputed differentiably in the step
                cos_g = nx_ * -d3[0] + ny_ * -d3[1] + nz_ * -d3[2]
                n2 = ZERO
                k2 = ZERO
                for i, (ior_i, k_i) in enumerate(bc.cond_nk):
                    sel = matf == float(i)
                    n2 = jnp.where(sel, ior_i, n2)
                    k2 = jnp.where(sel, k_i, k2)
                n2k2 = n2 * n2 + k2 * k2
                two = 2.0 * n2 * cos_g
                cos2 = cos_g * cos_g
                rs = (n2k2 - two + cos2) / jnp.maximum(n2k2 + two + cos2,
                                                       1e-20)
                rp = (n2k2 * cos2 - two + 1.0) / jnp.maximum(
                    n2k2 * cos2 + two + 1.0, 1e-20)
                ratio_g = 0.5 * (rs + rp)
                st["is_cond"] = (hit & mat_mask(matf, _CONDUCTOR)
                                 & (ratio_g > 1e-4))
                chain = chain | st["is_cond"]
            if bc.has_dielectric:
                # topology of the single-path dielectric bounce
                # (integrator.py:354-417): entering sign, TIR, and the
                # reflect-vs-refract draw; all Fresnel VALUES are either
                # recomputed differentiably in the step (directions) or
                # cancel against the selection probability (weights)
                is_diel = hit & mat_mask(matf, _DIELECTRIC)
                cos0 = -(nx_ * d3[0] + ny_ * d3[1] + nz_ * d3[2])
                entering = cos0 > 0.0
                ior = ONE
                for i, (ior_i, _k_i) in enumerate(bc.cond_nk):
                    ior = jnp.where(matf == float(i), ior_i, ior)
                ab_sel = [ZERO, ZERO, ZERO]
                for i, a3 in enumerate(bc.diel_abs):
                    sel = matf == float(i)
                    ab_sel = [jnp.where(sel, a3[c], ab_sel[c])
                              for c in range(3)]
                n1 = jnp.where(entering, medium, ior)
                n2d = jnp.where(entering, ior, 1.0)
                obj_n = jnp.where(entering, ior, 1.0)
                ratio_n = n1 / jnp.maximum(n2d, 1e-20)
                cos_i = jnp.abs(cos0)
                crit = ratio_n * ratio_n * (1.0 - cos_i * cos_i)
                tir = crit > 1.0
                cos_p = jnp.sqrt(jnp.where(tir, 1.0,
                                           jnp.maximum(1.0 - crit, 1e-20)))
                cos_p = jnp.where(tir, 0.0, cos_p)
                n2cos = n2d * cos_i
                n1cosp = n1 * cos_p
                rpar = (n2cos - n1cosp) / jnp.maximum(n2cos + n1cosp, 1e-20)
                rperp = (n1 * cos_i - n2d * cos_p) / jnp.maximum(
                    n1 * cos_i + n2d * cos_p, 1e-20)
                r_refl = 0.5 * (rpar * rpar + rperp * rperp)
                is_tir_c = is_diel & tir
                is_rl = is_diel & ~tir
                choose_refl = ud_ref[k, :, :] < r_refl
                d_reflect = is_tir_c | (is_rl & choose_refl)
                d_refract = is_rl & ~choose_refl
                st["d_reflect"] = d_reflect
                st["d_refract"] = d_refract
                st["d_sign"] = jnp.where(entering, 1.0, -1.0)
                st["d_ratio"] = ratio_n
                chain = chain | d_reflect | d_refract
                # child medium + Beer constant (thresholds transcribed from
                # integrator.py:377-378, 410-411, 396: TIR copies the
                # medium, partial legs take objN)
                next_medium = jnp.where(is_tir_c, medium, next_medium)
                next_medium = jnp.where(is_rl, obj_n, next_medium)
                tir_abs = is_tir_c & (medium > 1.0001)
                refl_abs = is_rl & choose_refl & (obj_n > 1.00001)
                refr_abs = is_rl & ~choose_refl & (obj_n > 1.001)
                take = tir_abs | refl_abs | refr_abs
                next_absorb = tuple(
                    jnp.where(take, ab_sel[c], next_absorb[c])
                    for c in range(3))
            st["chain"] = chain
        else:
            st["chain"] = FALSE

        # shadow visibility per light (stop-grad: p from the sweep's t,
        # shadow origin offset along the geometric normal computed above)
        t_safe = jnp.where(hit, st["t0"], 0.0)
        px = o3[0] + t_safe * d3[0]
        py = o3[1] + t_safe * d3[1]
        pz = o3[2] + t_safe * d3[2]
        sox = px + nx_ * eps
        soy = py + ny_ * eps
        soz = pz + nz_ * eps

        def shadow_towards(tx, ty, tz, gate):
            tlx = tx - px
            tly = ty - py
            tlz = tz - pz
            dist = jnp.sqrt(jnp.maximum(
                tlx * tlx + tly * tly + tlz * tlz, 1e-20))
            inv = 1.0 / dist
            return shadow(sox, soy, soz, tlx * inv, tly * inv, tlz * inv,
                          dist, gate)

        for i, lp in enumerate(bc.pl_pos):
            st[f"vis_p{i}"] = ~shadow_towards(lp[0], lp[1], lp[2], st["lit"])
        for i, wi in enumerate(bc.dl_wi):
            blocked = shadow(sox, soy, soz,
                             jnp.full(shape, wi[0]), jnp.full(shape, wi[1]),
                             jnp.full(shape, wi[2]), jnp.full(shape, BIG),
                             st["lit"])
            st[f"vis_d{i}"] = ~blocked
        for i, sp in enumerate(bc.spots):
            spos = sp[0]
            st[f"vis_s{i}"] = ~shadow_towards(spos[0], spos[1], spos[2],
                                              st["lit"])
        for i, ar in enumerate(bc.areas):
            apos, au, av, _anrm, ext, _area = ar
            base = (k * Pa + i) * 2
            off0 = uab_ref[base, :, :]
            off1 = uab_ref[base + 1, :, :]
            st[f"aoff{i}"] = (off0, off1)
            spx = apos[0] + au[0] * (ext * off0) + av[0] * (ext * off1)
            spy = apos[1] + au[1] * (ext * off0) + av[1] * (ext * off1)
            spz = apos[2] + au[2] * (ext * off0) + av[2] * (ext * off1)
            st[f"vis_a{i}"] = ~shadow_towards(spx, spy, spz, st["lit"])

        # mesh lights: per-lane gather of the sampled face's world corners
        # (static row unroll — counts are <= 32 by eligibility); the
        # gathered planes become vjp LEAVES whose cotangents stream back to
        # the sampled row, exactly like the winner v9
        lv9s_k = []
        for i, faces in enumerate(bc.mlights):
            base = (k * Pm + i) * 3
            fsel = uml_ref[base, :, :]
            r12a = uml_ref[base + 1, :, :]
            r12b = uml_ref[base + 2, :, :]
            st[f"mlr{i}"] = (r12a, r12b)
            a9 = [ZERO] * 9
            wgt = ZERO
            lrow = jnp.full(shape, -1.0)
            for fi, (row, wfac) in enumerate(faces):
                selm = fsel == float(fi)
                a9 = [jnp.where(selm, tri_ref[row, j], a9[j])
                      for j in range(9)]
                wgt = jnp.where(selm, wfac, wgt)
                lrow = jnp.where(selm, float(row), lrow)
            st[f"mlw{i}"] = wgt
            st[f"mlrow{i}"] = lrow
            st[f"skip_m{i}"] = FALSE  # PT GI block may override below
            lv9s_k.append(tuple(a9))
            sq = jnp.sqrt(r12a)
            qx = a9[3] * (1.0 - r12b) + a9[6] * r12b
            qy = a9[4] * (1.0 - r12b) + a9[7] * r12b
            qz = a9[5] * (1.0 - r12b) + a9[8] * r12b
            st[f"vis_m{i}"] = ~shadow_towards(
                a9[0] * (1.0 - sq) + qx * sq,
                a9[1] * (1.0 - sq) + qy * sq,
                a9[2] * (1.0 - sq) + qz * sq, st["lit"])

        # ---- path tracing: GI continuation topology ----
        # The GI trace here IS the next segment's scene trace (pending_st):
        # diffuse-only PT scenes reuse it wholesale; pt_spec scenes
        # (round 5) merge it lane-wise with a fresh trace for lanes whose
        # replayed coin chose the specular child instead.  Direction/origin
        # values here are numerically identical to the step's
        # differentiable recompute (same formulas on the same winner
        # facts).
        if bc.pt and k < bc_depth(bc) - 1:
            chain_spec = st["chain"] if bc.pt_spec else FALSE
            r1 = ugi_ref[2 * k, :, :]
            r2 = ugi_ref[2 * k + 1, :, :]
            st["gi_r12"] = (r1, r2)
            # gi_alive = active & ~emissive & (depth > 0); depth > 0 is
            # static (k < max_depth) — integrator.py:255-258
            gi_alive = shadeable
            if bc.pt_rr and (bc.max_depth - k) <= 0:
                # Russian roulette (integrator.py:252-257): the kill draw
                # is a replayed input, prob uses the VALUE of the same
                # throughput the step reweights differentiably
                prob_v = jnp.clip(
                    jnp.maximum(w3[0], jnp.maximum(w3[1], w3[2])),
                    1e-4, 1.0)
                kill = ugi_ref[2 * (bc_depth(bc)) + k, :, :] > prob_v
                gi_alive = gi_alive & ~kill
            gdx, gdy, gdz = gi_direction(nx_, ny_, nz_, r1, r2)
            t_sg = jnp.where(hit, st["t0"], 0.0)
            gox = o3[0] + t_sg * d3[0] + nx_ * 1e-4
            goy = o3[1] + t_sg * d3[1] + ny_ * 1e-4
            goz = o3[2] + t_sg * d3[2] + nz_ * 1e-4
            pending_st = trace(gox, goy, goz, gdx, gdy, gdz, gi_alive)
            g_hit = pending_st["hit"] & gi_alive
            g_row = pending_st["row"]
            # NEE double-count suppression flags: which mesh light (if
            # any) did this lane's GI ray hit (raytracer.cpp:180-188)
            for i, faces in enumerate(bc.mlights):
                skip = FALSE
                for (rw, _w) in faces:
                    skip = skip | (g_row == float(rw))
                st[f"skip_m{i}"] = g_hit & skip
            # child pushed only if the GI ray hit something
            # (integrator.py:289: gi_alive & gi_hit.valid)
            gi_would = gi_alive & g_hit
            if bc.pt_spec:
                # stochastic single-child (integrator stochastic_spec_gi):
                # where a GI child AND a specular child both exist, the
                # replayed coin picks one (weight doubles in the step)
                sg_off = 2 * bc_depth(bc) + (bc_depth(bc) if bc.pt_rr
                                             else 0)
                choose_gi = ugi_ref[sg_off + k, :, :] < 0.5
                both = gi_would & chain_spec
                cont_gi = gi_would & (~chain_spec | choose_gi)
                st["both"] = both
                st["cont_gi"] = cont_gi
                st["chain"] = cont_gi | (chain_spec
                                         & (~gi_would | ~choose_gi))
                cont_gi_prev = cont_gi
                # GI children keep the parent's medium with no Beer
                # constant (integrator.py: gi push passes medium, zeros)
                next_medium = jnp.where(cont_gi, medium, next_medium)
                next_absorb = tuple(
                    jnp.where(cont_gi, 0.0, next_absorb[c])
                    for c in range(3))
            else:
                st["chain"] = gi_would
        elif bc.pt:
            st["chain"] = FALSE
            if bc.pt_spec:
                st["cont_gi"] = FALSE
                st["both"] = FALSE
                cont_gi_prev = FALSE

        # ---- differentiable textures (round 5): gather the winner's taps
        # from the TRACED texel table.  Tap positions are stop-grad
        # topology (like the nearest-texel index in shading.py); the texel
        # VALUES become vjp leaves whose cotangents stream back keyed by
        # global texel index.  Bilinear weights are recomputed
        # differentiably in the step from the same uv facts. ----
        texv_k: tuple = ()
        if has_dtex:
            uu_t = _tile_uv(st["tex_uv"][0])
            vv_t = _tile_uv(st["tex_uv"][1])
            td_f = st["td"]
            idx_g = [jnp.full(shape, -1.0) for _ in range(4)]
            val_g = [ZERO for _ in range(12)]
            for ti_, meta in enumerate(bc.tex):
                if not meta:
                    continue
                interp, _bl, iw, ih, nr, r0, f0, _img = meta
                m = td_f == float(ti_)
                fw, fh = float(iw), float(ih)
                if interp == 0:  # sample_nearest index math
                    i0 = jnp.clip((uu_t * fw).astype(jnp.int32), 0, iw - 1)
                    j0 = jnp.clip((vv_t * fh).astype(jnp.int32), 0, ih - 1)
                    taps = [(i0, j0)]
                else:  # sample_bilinear index math
                    fi = jnp.clip(uu_t * fw, 0.0, fw - 1.0)
                    fj = jnp.clip(vv_t * fh, 0.0, fh - 1.0)
                    p0 = jnp.floor(fi).astype(jnp.int32)
                    q0 = jnp.floor(fj).astype(jnp.int32)
                    p1 = jnp.minimum(p0 + 1, iw - 1)
                    q1 = jnp.minimum(q0 + 1, ih - 1)
                    taps = [(p0, q0), (p1, q0), (p0, q1), (p1, q1)]
                for k_t, (ii, jj) in enumerate(taps):
                    flat = jj * iw + ii
                    idx_g[k_t] = jnp.where(
                        m, (flat + f0).astype(jnp.float32), idx_g[k_t])
                    lane = jnp.bitwise_and(flat, 127)
                    rw = jnp.right_shift(flat, 7)
                    for c in range(3):
                        acc = ZERO
                        for rr in range(nr):
                            brow = jnp.broadcast_to(
                                tex_ref[r0 + c * nr + rr:
                                        r0 + c * nr + rr + 1, :], shape)
                            g = jnp.take_along_axis(brow, lane, axis=1)
                            acc = acc + jnp.where(rw == rr, g, 0.0)
                        val_g[3 * k_t + c] = jnp.where(
                            m, acc, val_g[3 * k_t + c])
            st["tex_idx"] = tuple(idx_g)
            texv_k = tuple(val_g)

        # per-lane selected material params (traced leaves for the step)
        kd3 = tuple(matsel(matf, 3 + c) for c in range(3))
        ks3 = tuple(matsel(matf, 6 + c) for c in range(3))
        amb3 = tuple(matsel(matf, 0 + c) for c in range(3))
        mir3 = tuple(matsel(matf, 9 + c) for c in range(3))
        phong = matsel(matf, 12)
        rad3 = tuple(matsel(matf, 13 + c) for c in range(3))
        v9 = tuple(st["v9"])

        step = make_step(k, st)
        leaves = (o3, d3, w3, v9, tuple(lv9s_k), kd3, ks3, amb3, mir3,
                  phong, rad3, texv_k, pl_scal, dl_scal, sl_scal, al_scal,
                  ml_scal, bg_scal)
        out = step(*leaves)
        Lr = Lr + out[0]
        Lg = Lg + out[1]
        Lb = Lb + out[2]
        segs.append((step, leaves, st))
        o3 = (out[3], out[4], out[5])
        d3 = (out[6], out[7], out[8])
        w3 = (out[9], out[10], out[11])
        active = st["chain"]
        medium = next_medium
        absorb3 = next_absorb

    lx_ref[:, :] = Lr
    ly_ref[:, :] = Lg
    lz_ref[:, :] = Lb
    if not bc.with_bwd:
        return

    # ---- reverse sweep: vjp of each step at trace time ----
    gbar = (gx_ref[:, :], gy_ref[:, :], gz_ref[:, :])
    obar = (ZERO, ZERO, ZERO)
    dbar = (ZERO, ZERO, ZERO)
    wbar = (ZERO, ZERO, ZERO)
    pl_bar = [0.0] * (3 * P)
    dl_bar = [0.0] * (3 * Pd)
    sl_bar = [0.0] * (3 * Ps)
    al_bar = [0.0] * (3 * Pa)
    ml_bar = [0.0] * (3 * Pm)
    bg_bar = [0.0] * 3
    for k in reversed(range(D)):
        step, leaves, st = segs[k]
        _, vjp_fn = jax.vjp(lambda *ls: step(*ls), *leaves)
        cots = vjp_fn(tuple(gbar) + tuple(obar) + tuple(dbar) + tuple(wbar))
        (c_o3, c_d3, c_w3, c_v9, c_lv9s, c_kd, c_ks, c_amb, c_mir, c_phong,
         c_rad, c_texv, c_pl, c_dl, c_sl, c_al, c_ml, c_bg) = cots
        obar, dbar, wbar = c_o3, c_d3, c_w3
        for j in range(3 * P):
            pl_bar[j] = pl_bar[j] + c_pl[j]
        for j in range(3 * Pd):
            dl_bar[j] = dl_bar[j] + c_dl[j]
        for j in range(3 * Ps):
            sl_bar[j] = sl_bar[j] + c_sl[j]
        for j in range(3 * Pa):
            al_bar[j] = al_bar[j] + c_al[j]
        for j in range(3 * Pm):
            ml_bar[j] = ml_bar[j] + c_ml[j]
        for j in range(3):
            bg_bar[j] = bg_bar[j] + c_bg[j]
        base = k * _C
        stream_ref[base + 0, :, :] = st["row"]
        stream_ref[base + 1, :, :] = st["matf"]
        for j in range(9):
            stream_ref[base + 2 + j, :, :] = c_v9[j]
        for j in range(3):
            stream_ref[base + 11 + j, :, :] = c_kd[j]
            stream_ref[base + 14 + j, :, :] = c_ks[j]
            stream_ref[base + 17 + j, :, :] = c_amb[j]
            stream_ref[base + 20 + j, :, :] = c_mir[j]
            stream_ref[base + 24 + j, :, :] = c_rad[j]
        stream_ref[base + 23, :, :] = c_phong
        for i in range(Pm):
            stream_ref[base + _C_BASE + 10 * i, :, :] = st[f"mlrow{i}"]
            for j in range(9):
                stream_ref[base + _C_BASE + 10 * i + 1 + j, :, :] = \
                    c_lv9s[i][j]
        if any(bc.tex):
            tb = base + _tex_stream_base(bc)
            for j in range(4):
                stream_ref[tb + j, :, :] = st["tex_idx"][j]
            for j in range(12):
                stream_ref[tb + 4 + j, :, :] = c_texv[j]

    box_ref[:, :] = obar[0]
    boy_ref[:, :] = obar[1]
    boz_ref[:, :] = obar[2]
    bdx_ref[:, :] = dbar[0]
    bdy_ref[:, :] = dbar[1]
    bdz_ref[:, :] = dbar[2]

    # scalar cotangents: accumulate across the (sequential) grid
    ri = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    acc = ZERO
    for j in range(3 * P):
        acc = acc + jnp.where((ri == 0) & (ci == j), pl_bar[j], 0.0)
    for j in range(3 * Pd):
        acc = acc + jnp.where((ri == 1) & (ci == j), dl_bar[j], 0.0)
    for j in range(3):
        acc = acc + jnp.where((ri == 2) & (ci == j), bg_bar[j], 0.0)
    for j in range(3 * Ps):
        acc = acc + jnp.where((ri == 3) & (ci == j), sl_bar[j], 0.0)
    for j in range(3 * Pa):
        acc = acc + jnp.where((ri == 4) & (ci == j), al_bar[j], 0.0)
    for j in range(3 * Pm):
        acc = acc + jnp.where((ri == 5) & (ci == j), ml_bar[j], 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        smalls_ref[:, :] = jnp.zeros(shape, jnp.float32)

    smalls_ref[:, :] += acc


# ---------------------------------------------------------------------------
# host wrapper + custom_vjp
# ---------------------------------------------------------------------------


def _pad_rows(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.pad(x, ((0, pad),), constant_values=1.0)


def _bwd_call(bc: BwdConsts, tri_tab, chunk_tab, mat_tab, pl_tab, dl_tab,
              sl_tab, al_tab, ml_tab, bg_tab, tex_tab, uab, uml, ud, ugi,
              o, d, gbar, interpret: bool):
    """Invoke the kernel.  gbar=None -> fwd-only variant.

    ``uab``/``uml``/``ud``/``ugi`` are the (D*n_area*2, r) / (D*n_ml*3, r)
    / (D, r) / (D*2, r) stochastic-input planes from ``wavefront_rng``
    (stop-grad); forwarded only when the scene needs them."""
    r = o.shape[0]
    r_pad = ((r + TILE - 1) // TILE) * TILE
    n_rows = r_pad // LANES
    cols = [
        _pad_rows(arr[:, kk], r_pad).reshape(n_rows, LANES)
        for arr in (o, d)
        for kk in range(3)
    ]
    if bc.with_bwd:
        # padded lanes MUST carry zero cotangent (their garbage rays would
        # otherwise pollute the streamed parameter gradients)
        gcols = [
            jnp.pad(gbar[:, kk], (0, r_pad - r)).reshape(n_rows, LANES)
            for kk in range(3)
        ]
    else:
        zero = jnp.zeros((n_rows, LANES), jnp.float32)
        gcols = [zero] * 3
    grid = (n_rows // ROWS,)
    blk = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    D = bc_depth(bc)

    extra_in = []
    extra_specs = []
    for planes in ((uab,) if bc.areas else ()) + (
            (uml,) if bc.mlights else ()) + (
            (ud,) if bc.has_dielectric else ()) + (
            (ugi,) if bc.pt else ()):
        np_ = planes.shape[0]
        padded = jnp.pad(planes, ((0, 0), (0, r_pad - r))).reshape(
            np_, n_rows, LANES)
        extra_in.append(padded)
        extra_specs.append(pl.BlockSpec(
            (np_, ROWS, LANES), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM))
    if any(bc.tex):
        # TRACED differentiable texel table (round 5)
        extra_in.append(tex_tab)
        extra_specs.append(full)

    C = _c_of(bc)
    out_shape = [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 3
    out_specs = [blk] * 3
    if bc.with_bwd:
        out_shape += [
            jax.ShapeDtypeStruct((D * C, n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        ] + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 6
        out_specs += [
            pl.BlockSpec((D * C, ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [blk] * 6

    outs = pl.pallas_call(
        functools.partial(_kernel, bc=bc),
        grid=grid,
        in_specs=[blk] * 9 + [full] * 9 + extra_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*cols, *gcols, tri_tab, chunk_tab, mat_tab, pl_tab, dl_tab, sl_tab,
      al_tab, ml_tab, bg_tab, *extra_in)
    return outs, n_rows


def _reduce_streams(bc: BwdConsts, stream, n_tri: int, n_mat: int, D: int,
                    r: int):
    """One-hot matmul reduction of the per-lane cotangent streams.

    stream: (D*C, n_rows, LANES).  Returns (d_triw (W,9), d_mat (M,16)).
    The one-hot contraction runs on the MXU — the TPU replacement for the
    scatter-add XLA would otherwise serialize.  Mesh-light sampled-face
    cotangents ride the same row-keyed reduction (extra (row, dv9) pairs)."""
    C = _c_of(bc)
    planes = stream.reshape(D, C, -1)  # (D, C, R')
    rows = planes[:, 0, :].reshape(-1)  # (D*R',)
    matf = planes[:, 1, :].reshape(-1)
    dv = planes[:, 2:11, :].transpose(0, 2, 1).reshape(-1, 9)
    dm = planes[:, 11:27, :].transpose(0, 2, 1).reshape(-1, 16)
    for i in range(len(bc.mlights)):
        base = _C_BASE + 10 * i
        rows = jnp.concatenate([rows, planes[:, base, :].reshape(-1)])
        dv = jnp.concatenate([
            dv, planes[:, base + 1:base + 10, :]
            .transpose(0, 2, 1).reshape(-1, 9)])

    w = max(n_tri, 1)
    # precision=HIGHEST: default TPU matmul truncates f32 operands to bf16,
    # which would cost ~0.4% relative error on every reduced gradient
    hi = jax.lax.Precision.HIGHEST
    oh_rows = (rows[:, None] == jnp.arange(w, dtype=jnp.float32)[None]
               ).astype(jnp.float32)
    d_triw = jnp.einsum("rw,rc->wc", oh_rows, dv, precision=hi,
                        preferred_element_type=jnp.float32)
    oh_mat = (matf[:, None] == jnp.arange(n_mat, dtype=jnp.float32)[None]
              ).astype(jnp.float32)
    # miss lanes carry matf from init (0) but zero cotangents, so no mask
    # is needed beyond the cotangent values themselves
    d_mat = jnp.einsum("rm,rc->mc", oh_mat, dm, precision=hi,
                       preferred_element_type=jnp.float32)
    d_tex = None
    if any(bc.tex):
        # texel cotangents: 4 taps per lane per depth, keyed by global
        # texel index (-1 on untextured taps matches no one-hot column)
        tb = _tex_stream_base(bc)
        keys = jnp.concatenate([
            planes[:, tb + k_t, :].reshape(-1) for k_t in range(4)])
        dvals = jnp.concatenate([
            planes[:, tb + 4 + 3 * k_t:tb + 7 + 3 * k_t, :]
            .transpose(0, 2, 1).reshape(-1, 3) for k_t in range(4)])
        oh_tex = (keys[:, None]
                  == jnp.arange(bc.n_texels, dtype=jnp.float32)[None]
                  ).astype(jnp.float32)
        d_tex = jnp.einsum("rt,rc->tc", oh_tex, dvals, precision=hi,
                           preferred_element_type=jnp.float32)
    return d_triw, d_mat, d_tex


def make_diff_render(pack, opts, interpret: bool = False):
    """Differentiable fused render: returns ``f(params, o, d) -> (R,3)``.

    ``params`` is a dict with any subset of {mat_ambient, mat_diffuse,
    mat_specular, mat_mirror, mat_phong, mat_radiance, pl_intensity,
    dl_radiance, sl_intensity, al_radiance, ml_radiance, bg_color, verts,
    img_atlas (round 5 — diffuse-texture texels)}; missing keys come from
    ``pack``.  Forward runs the fwd-only kernel; jax.grad /
    value_and_grad route through the fused fwd+bwd kernel + one-hot
    epilogue.  Gradient semantics match
    trace_radiance(differentiable=True) — see module docstring."""
    st = pack.static
    bc_f = build_bwd_consts(pack, opts, with_bwd=False)
    bc_b = build_bwd_consts(pack, opts, with_bwd=True)
    D = bc_depth(bc_f)

    # constant geometry/table pieces
    from advanced_cpu_raytracing_tpu.ops.pallas.megakernel import build_mega

    _, tri_tab0, chunk_tab, _ = build_mega(pack, opts)
    tri_rest = jax.lax.stop_gradient(tri_tab0[:, 9:])  # n_world, mat, flags
    w_items = st.n_work_items
    # world verts as a function of pack.verts: wi_v = R_row verts[tv] + tau
    rot = pack.ent_fwd[pack.wi_ent][:, :3, :3]  # (W,3,3) consts
    trn = pack.ent_fwd[pack.wi_ent][:, :3, 3]
    tv = pack.tri_vidx[pack.wi_face]  # (W,3)

    n_mat = st.n_materials
    P, Pd = st.n_point, st.n_directional
    Ps, Pa, Pm = st.n_spot, st.n_area, st.n_mesh_lights
    ml_counts = tuple(int(c) for c in np.asarray(pack.ml_face_count)[:Pm])

    def tables(params):
        g = lambda f: params.get(f, getattr(pack, f))  # noqa: E731
        mat_tab = jnp.concatenate([
            g("mat_ambient")[:n_mat], g("mat_diffuse")[:n_mat],
            g("mat_specular")[:n_mat], g("mat_mirror")[:n_mat],
            g("mat_phong")[:n_mat, None],
            g("mat_radiance")[:n_mat],
        ], axis=1)
        pl_tab = (g("pl_intensity").reshape(-1, 3)[:P] if P
                  else jnp.zeros((1, 3), jnp.float32))
        dl_tab = (g("dl_radiance").reshape(-1, 3)[:Pd] if Pd
                  else jnp.zeros((1, 3), jnp.float32))
        sl_tab = (g("sl_intensity").reshape(-1, 3)[:Ps] if Ps
                  else jnp.zeros((1, 3), jnp.float32))
        al_tab = (g("al_radiance").reshape(-1, 3)[:Pa] if Pa
                  else jnp.zeros((1, 3), jnp.float32))
        ml_tab = (g("ml_radiance").reshape(-1, 3)[:Pm] if Pm
                  else jnp.zeros((1, 3), jnp.float32))
        bg_tab = g("bg_color").reshape(1, 3)
        # differentiable texel table (round 5): channel blocks per image,
        # built with pure jnp ops so AD maps table cotangents back to
        # img_atlas automatically
        if any(bc_f.tex):
            atlas = g("img_atlas")
            blocks = []
            done = set()
            for meta in bc_f.tex:
                if not meta:
                    continue
                _i, _b, iw, ih, nr, _r0, _f0, img = meta
                if img in done:
                    continue
                done.add(img)
                flat = atlas[img, :ih, :iw, :].reshape(-1, 3)
                flat = jnp.pad(flat, ((0, nr * 128 - iw * ih), (0, 0)))
                for c in range(3):
                    blocks.append(flat[:, c].reshape(nr, 128))
            tex_tab = jnp.concatenate(blocks, axis=0)
        else:
            tex_tab = jnp.zeros((1, 128), jnp.float32)
        verts = g("verts")
        if w_items:
            # elementwise FMA, NOT einsum: TPU dots truncate f32 -> bf16,
            # visibly perturbing world-space geometry (ops/intersect.py)
            vk = verts[tv]  # (W,3,3) corners x xyz
            tri_w = jnp.sum(rot[:, None, :, :] * vk[:, :, None, :], axis=-1) \
                + trn[:, None, :]
            tri_w = tri_w.reshape(w_items, 9)
        else:
            tri_w = jnp.zeros((tri_tab0.shape[0], 9), jnp.float32)
        return mat_tab, pl_tab, dl_tab, sl_tab, al_tab, ml_tab, bg_tab, \
            tri_w, tex_tab

    @jax.custom_vjp
    def render(mat_tab, pl_tab, dl_tab, sl_tab, al_tab, ml_tab, bg_tab,
               tri_w, tex_tab, o, d, uab, uml, ud, ugi):
        tri_tab = jnp.concatenate([tri_w, tri_rest], axis=1)
        outs, n_rows = _bwd_call(bc_f, tri_tab, chunk_tab, mat_tab, pl_tab,
                                 dl_tab, sl_tab, al_tab, ml_tab, bg_tab,
                                 tex_tab, uab, uml, ud, ugi, o, d, None,
                                 interpret)
        r = o.shape[0]
        return jnp.stack([x.reshape(-1)[:r] for x in outs[:3]], axis=-1)

    def render_fwd(mat_tab, pl_tab, dl_tab, sl_tab, al_tab, ml_tab, bg_tab,
                   tri_w, tex_tab, o, d, uab, uml, ud, ugi):
        out = render(mat_tab, pl_tab, dl_tab, sl_tab, al_tab, ml_tab,
                     bg_tab, tri_w, tex_tab, o, d, uab, uml, ud, ugi)
        return out, (mat_tab, pl_tab, dl_tab, sl_tab, al_tab, ml_tab,
                     bg_tab, tri_w, tex_tab, o, d, uab, uml, ud, ugi)

    def render_bwd(res, gbar):
        (mat_tab, pl_tab, dl_tab, sl_tab, al_tab, ml_tab, bg_tab, tri_w,
         tex_tab, o, d, uab, uml, ud, ugi) = res
        tri_tab = jnp.concatenate([tri_w, tri_rest], axis=1)
        outs, n_rows = _bwd_call(bc_b, tri_tab, chunk_tab, mat_tab, pl_tab,
                                 dl_tab, sl_tab, al_tab, ml_tab, bg_tab,
                                 tex_tab, uab, uml, ud, ugi, o, d, gbar,
                                 interpret)
        (_, _, _, stream, smalls, box, boy, boz, bdx, bdy, bdz) = outs
        r = o.shape[0]
        d_triw, d_mat16, d_tex = _reduce_streams(bc_b, stream, w_items,
                                                 n_mat, D, r)
        if any(bc_b.tex):
            # texel grads -> table cotangent via the SAME channel-block
            # layout tables() packs with (AD then maps it to img_atlas)
            tblocks = []
            done = set()
            for meta in bc_b.tex:
                if not meta:
                    continue
                _i, _b, iw, ih, nr, _r0, f0, img = meta
                if img in done:
                    continue
                done.add(img)
                flat = d_tex[f0:f0 + iw * ih]
                flat = jnp.pad(flat, ((0, nr * 128 - iw * ih), (0, 0)))
                for c in range(3):
                    tblocks.append(flat[:, c].reshape(nr, 128))
            d_tex_tab = jnp.concatenate(tblocks, axis=0)
        else:
            d_tex_tab = jnp.zeros_like(tex_tab)
        d_mat = jnp.concatenate([
            d_mat16[:, 6:9],    # amb
            d_mat16[:, 0:3],    # kd
            d_mat16[:, 3:6],    # ks
            d_mat16[:, 9:12],   # mir
            d_mat16[:, 12:13],  # phong
            d_mat16[:, 13:16],  # radiance
        ], axis=1)

        def small_row(row, count):
            out = smalls[row, : 3 * max(count, 1)].reshape(-1, 3)
            return out[:count] if count else jnp.zeros((1, 3), jnp.float32)

        d_pl = small_row(0, P)
        d_dl = small_row(1, Pd)
        d_bg = smalls[2, :3].reshape(1, 3)
        d_sl = small_row(3, Ps)
        d_al = small_row(4, Pa)
        d_ml = small_row(5, Pm)
        d_o = jnp.stack([x.reshape(-1)[:r] for x in (box, boy, boz)], axis=-1)
        d_d = jnp.stack([x.reshape(-1)[:r] for x in (bdx, bdy, bdz)], axis=-1)
        return (d_mat, d_pl, d_dl, d_sl, d_al, d_ml, d_bg, d_triw,
                d_tex_tab, d_o, d_d, jnp.zeros_like(uab),
                jnp.zeros_like(uml), jnp.zeros_like(ud),
                jnp.zeros_like(ugi))

    render.defvjp(render_fwd, render_bwd)

    def f(params, o, d, key=None):
        (mat_tab, pl_tab, dl_tab, sl_tab, al_tab, ml_tab, bg_tab,
         tri_w, tex_tab) = tables(params)
        if key is None:
            key = jax.random.PRNGKey(0)
        uab, uml, ud, ugi = wavefront_rng(key, o.shape[0], D, Pa,
                                          st.has_dielectric, ml_counts,
                                          need_gi=bc_f.pt,
                                          need_rr=bc_f.pt_rr,
                                          need_sg=bc_f.pt_spec)
        return render(mat_tab, pl_tab, dl_tab, sl_tab, al_tab, ml_tab,
                      bg_tab, tri_w, tex_tab, o, d, uab, uml, ud, ugi)

    return f
