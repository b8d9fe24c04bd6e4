"""Camera ray generation with depth of field.

Role parity: the reference's raygen shader (external SPIR-V) consuming
the gpu::HalaCamera record {position, right, up, forward, yfov,
focal_distance|xmag, aperture|ymag, type} (gpu/camera.rs:10-20).
forward is the -Z axis of the camera node (gpu/camera.rs:28-32); the
thin-lens model uses focal_distance/aperture from the camera extras
(gltf_loader.rs:519-525). Orthographic cameras use xmag/ymag.
"""

from __future__ import annotations

import jax.numpy as jnp


def generate_rays(
    cameras,
    camera_index,
    px: jnp.ndarray,
    py: jnp.ndarray,
    width: int,
    height: int,
    jitter: jnp.ndarray,
    lens_sample: jnp.ndarray,
):
    """Primary rays for pixel centers (px, py) (pixel coords, y down).

    cameras: DeviceCameras; camera_index: scalar int.
    jitter: (N, 2) in [0,1) sub-pixel offsets; lens_sample: (N, 2).
    Returns (origin (N,3), direction (N,3) normalized).
    """
    pos = cameras.position[camera_index]
    right = cameras.right[camera_index]
    up = cameras.up[camera_index]
    forward = cameras.forward[camera_index]
    yfov = cameras.yfov[camera_index]
    focal_or_xmag = cameras.focal_or_xmag[camera_index]
    aperture_or_ymag = cameras.aperture_or_ymag[camera_index]
    is_persp = cameras.ctype[camera_index] == 0

    aspect = jnp.float32(width) / jnp.float32(height)
    # NDC in [-1, 1], y up (flip pixel y).
    ndc_x = ((px + jitter[:, 0]) / width) * 2.0 - 1.0
    ndc_y = 1.0 - ((py + jitter[:, 1]) / height) * 2.0

    # Perspective: point on the image plane at unit distance.
    tan_half = jnp.tan(0.5 * yfov)
    dir_p = (
        forward[None, :]
        + (ndc_x * tan_half * aspect)[:, None] * right[None, :]
        + (ndc_y * tan_half)[:, None] * up[None, :]
    )
    dir_p = dir_p / jnp.sqrt(jnp.sum(dir_p * dir_p, axis=-1, keepdims=True))

    # Thin lens: focus point at focal_distance along the ray; origin
    # jittered on the aperture disk of radius aperture/2.
    r = jnp.sqrt(lens_sample[:, 0])
    phi = 2.0 * jnp.pi * lens_sample[:, 1]
    # focal plane measured along forward so focus distance is plane depth
    cos_theta = jnp.sum(dir_p * forward[None, :], axis=-1)
    ft = focal_or_xmag / jnp.maximum(cos_theta, 1e-6)
    focus_p = pos[None, :] + dir_p * ft[:, None]
    lens_r = 0.5 * aperture_or_ymag
    lens_off = (
        (r * jnp.cos(phi) * lens_r)[:, None] * right[None, :]
        + (r * jnp.sin(phi) * lens_r)[:, None] * up[None, :]
    )
    o_persp = pos[None, :] + lens_off
    d_persp = focus_p - o_persp
    d_persp = d_persp / jnp.sqrt(jnp.sum(d_persp * d_persp, axis=-1, keepdims=True))

    # Orthographic: parallel rays offset on the view plane by xmag/ymag.
    o_ortho = (
        pos[None, :]
        + (ndc_x * focal_or_xmag)[:, None] * right[None, :]
        + (ndc_y * aperture_or_ymag)[:, None] * up[None, :]
    )
    d_ortho = jnp.broadcast_to(forward[None, :], o_ortho.shape)

    o = jnp.where(is_persp, o_persp, o_ortho)
    d = jnp.where(is_persp, d_persp, d_ortho)
    return o, d
