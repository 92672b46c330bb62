import numpy as np
import jax
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.render.camera import (
    build_camera,
    generate_rays,
    image_plane_position,
)
from advanced_cpu_raytracing_tpu.scene.types import CameraCfg


def _default_cam(**kw):
    base = dict(
        id=1, position=np.zeros(3), up=np.array([0.0, 1.0, 0.0]),
        near_distance=1.0, width=4, height=4, image_name="t.png",
        gaze_dir=np.array([0.0, 0.0, -1.0]),
        near_plane=np.array([-1.0, 1.0, -1.0, 1.0]),
    )
    base.update(kw)
    return CameraCfg(**base)


def test_pixel_center_offset():
    cam = build_camera(_default_cam())
    # pixel (0,0) center: su = 0.5*(2/4)=0.25 -> x = -1+0.25 = -0.75
    p = image_plane_position(cam, jnp.array([0.0]), jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(p)[0], [-0.75, 0.75, -1.0], atol=1e-6)


def test_corner_pixels_symmetric():
    cam = build_camera(_default_cam())
    p = image_plane_position(cam, jnp.array([3.0, 0.0]), jnp.array([3.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p)[0], [0.75, -0.75, -1.0], atol=1e-6)


def test_lookat_fov():
    cfg = _default_cam(
        is_look_at=True, gaze_point=np.array([0.0, 0.0, -5.0]),
        fov_y_deg=90.0, gaze_dir=None, near_plane=None,
    )
    cam = build_camera(cfg)
    # fovY 90 at near 1: top = tan(45) = 1
    p = image_plane_position(cam, jnp.array([1.5]), jnp.array([-0.5]))
    np.testing.assert_allclose(np.asarray(p)[0][1], 1.0, atol=1e-6)


def test_up_orthogonalized():
    cfg = _default_cam(up=np.array([0.3, 1.0, -0.2]))
    cam = build_camera(cfg)
    assert abs(float(jnp.dot(cam.up, cam.gaze))) < 1e-6
    assert abs(float(jnp.linalg.norm(cam.up)) - 1.0) < 1e-6


def test_generate_rays_unit_and_through_plane():
    cam = build_camera(_default_cam())
    px = jnp.array([0.0, 3.0])
    py = jnp.array([0.0, 3.0])
    o, d = generate_rays(cam, px, py)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-7)


def test_dof_rays_converge_at_focus():
    cfg = _default_cam(aperture_size=0.4, focus_distance=3.0)
    cam = build_camera(cfg)
    px = jnp.full(8, 1.5)
    py = jnp.full(8, 1.5)
    lens = jax.random.uniform(jax.random.PRNGKey(0), (8, 2), minval=-1.0,
                              maxval=1.0)
    o, d = generate_rays(cam, px, py, lens, dof=True)
    # all rays should pass (approximately) through the focal point at
    # gaze-depth == focus_distance (raytracer.cpp:680-684)
    t = cam.focus_distance / jnp.sum(d * cam.gaze, axis=-1)
    pts = np.asarray(o + d * t[:, None])
    assert np.ptp(pts, axis=0).max() < 1e-5
