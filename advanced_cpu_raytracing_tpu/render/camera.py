"""Device camera: image-plane setup and primary-ray generation (with DoF).

Host setup mirrors Camera::SetupDefault / SetupLookAt / CalculateImagePlaneParams
(src/camera.cpp:5-72); ray generation mirrors Raytracer::GenerateRay
(src/raytracer.cpp:661-699).

One deliberate divergence: the reference truncates sample positions to ints
(RenderPixel takes ``int i, int j``, raytracer.hpp:18), so its stratified
multisampling never actually jitters the ray *spatially* — every sample goes
through the pixel center.  We keep true sub-pixel positions (proper AA); for
1-spp scenes (all committed golden scenes) the two are identical because
GetImagePlanePosition adds the +0.5 pixel-center offset itself
(camera.cpp:74-80).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.scene.types import CameraCfg
from advanced_cpu_raytracing_tpu.utils.math3d import dot, normalize


@dataclass
class DeviceCamera:
    """Precomputed image-plane parameters as device scalars/vectors."""

    position: jnp.ndarray  # (3,)
    gaze: jnp.ndarray  # (3,) unit
    up: jnp.ndarray  # (3,) unit, orthogonalized
    right: jnp.ndarray  # (3,)
    q: jnp.ndarray  # (3,) image plane top-left (m_q)
    su_scale: jnp.ndarray  # (r-l)/width
    sv_scale: jnp.ndarray  # (t-b)/height
    aperture: jnp.ndarray  # ()
    focus_distance: jnp.ndarray  # ()
    width: int
    height: int
    use_dof: bool = False  # static: aperture > 1e-4 (raytracer.cpp:669)


def _tree_flatten(c: DeviceCamera):
    children = (c.position, c.gaze, c.up, c.right, c.q, c.su_scale,
                c.sv_scale, c.aperture, c.focus_distance)
    return children, (c.width, c.height, c.use_dof)


def _tree_unflatten(aux, children):
    width, height, use_dof = aux
    return DeviceCamera(*children, width=width, height=height, use_dof=use_dof)


import jax  # noqa: E402

jax.tree_util.register_pytree_node(DeviceCamera, _tree_flatten, _tree_unflatten)


def build_camera(cfg: CameraCfg) -> DeviceCamera:
    pos = np.asarray(cfg.position, np.float64)
    up_in = np.asarray(cfg.up, np.float64)

    if cfg.is_look_at:
        # SetupLookAt (camera.cpp:25-48)
        aspect = cfg.width / cfg.height
        top = cfg.near_distance * np.tan(np.deg2rad(cfg.fov_y_deg) / 2.0)
        right_ext = top * aspect
        l, r, b, t = -right_ext, right_ext, -top, top
        gaze = np.asarray(cfg.gaze_point, np.float64) - pos
        gaze /= np.linalg.norm(gaze)
        tmp_up = up_in / np.linalg.norm(up_in)
        tmp_right = np.cross(tmp_up, gaze)
        tmp_right /= np.linalg.norm(tmp_right)
        up = np.cross(gaze, tmp_right)
        up /= np.linalg.norm(up)
    else:
        # SetupDefault (camera.cpp:5-24): orthogonalize up against gaze by
        # subtracting the projection (camera.cpp:50-58)
        l, r, b, t = [float(x) for x in cfg.near_plane]
        gaze = np.asarray(cfg.gaze_dir, np.float64)
        gaze /= np.linalg.norm(gaze)
        tmp_up = up_in / np.linalg.norm(up_in)
        proj = gaze * (tmp_up @ gaze)
        up = tmp_up - proj
        up /= np.linalg.norm(up)

    # CalculateImagePlaneParams (camera.cpp:60-72): right = up x (-gaze)
    w = -gaze
    right = np.cross(up, w)
    middle = pos + gaze * cfg.near_distance
    q = middle + right * l + up * t

    f32 = lambda x: jnp.asarray(np.asarray(x, np.float32))
    return DeviceCamera(
        position=f32(pos), gaze=f32(gaze), up=f32(up), right=f32(right),
        q=f32(q),
        su_scale=f32((r - l) / cfg.width), sv_scale=f32((t - b) / cfg.height),
        aperture=f32(cfg.aperture_size), focus_distance=f32(cfg.focus_distance),
        width=cfg.width, height=cfg.height,
        use_dof=cfg.aperture_size > 1e-4,
    )


def image_plane_position(cam: DeviceCamera, px, py):
    """World position on the near plane for (possibly fractional) pixel
    coordinates, with the +0.5 center offset (camera.cpp:74-80)."""
    su = (px + 0.5) * cam.su_scale
    sv = (py + 0.5) * cam.sv_scale
    return cam.q + cam.right * su[..., None] - cam.up * sv[..., None]


def generate_rays(cam: DeviceCamera, px, py, lens_uv=None, dof: bool = False):
    """Primary rays for pixel coords px/py (R,).

    ``lens_uv`` (R,2) in [-1,1] drives the aperture sample when ``dof``
    (GenerateRay, src/raytracer.cpp:669-691).
    Returns (origin (R,3), dir (R,3) unit).
    """
    plane = image_plane_position(cam, px, py)
    origin = jnp.broadcast_to(cam.position, plane.shape)
    if dof:
        ap = origin + cam.up * (lens_uv[..., 0:1] * cam.aperture * 0.5) \
            + cam.right * (lens_uv[..., 1:2] * cam.aperture * 0.5)
        d_rev = normalize(origin - plane)  # points back toward the camera
        t_fd = cam.focus_distance / dot(d_rev, cam.gaze)
        bent = origin + d_rev * t_fd[..., None]
        return ap, normalize(bent - ap)
    return origin, normalize(plane - origin)
