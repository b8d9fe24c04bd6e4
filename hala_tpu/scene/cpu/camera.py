"""Host-side camera.

Parity: reference src/scene/cpu/camera.rs:4-37 (HalaCamera enum with
Perspective / Orthographic variants). Perspective cameras carry a
precomputed infinite reverse-Z projection (gltf_loader.rs:517), plus DOF
extras (focal_distance, aperture).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def perspective_infinite_reverse_rh(yfov: float, aspect: float, znear: float) -> np.ndarray:
    """Infinite reverse-Z right-handed projection (depth 1 at znear -> 0 at inf).

    Matches glam::Mat4::perspective_infinite_reverse_rh used at
    gltf_loader.rs:517: f = 1/tan(yfov/2);
    columns: [f/aspect,0,0,0],[0,f,0,0],[0,0,0,-1],[0,0,znear,0].
    """
    f = 1.0 / np.tan(0.5 * yfov)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[3, 2] = -1.0
    m[2, 3] = znear
    return m


def orthographic_rh(left, right, bottom, top, znear, zfar) -> np.ndarray:
    """glam::Mat4::orthographic_rh (zero-to-one depth), gltf_loader.rs:504."""
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[2, 2] = -1.0 / (zfar - znear)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = -znear / (zfar - znear)
    return m


@dataclasses.dataclass
class PerspectiveCamera:
    aspect: float = 1.0
    yfov: float = 0.785398
    znear: float = 0.1
    zfar: float = 1000.0
    focal_distance: float = 10.0
    aperture: float = 0.0
    projection: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )

    def __post_init__(self):
        self.projection = perspective_infinite_reverse_rh(
            self.yfov, self.aspect, self.znear
        )


@dataclasses.dataclass
class OrthographicCamera:
    xmag: float = 1.0
    ymag: float = 1.0
    orthography: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )


Camera = PerspectiveCamera | OrthographicCamera


def get_proj_matrix(camera: Camera) -> np.ndarray:
    """camera.rs get_proj_matrix."""
    if isinstance(camera, PerspectiveCamera):
        return camera.projection
    return camera.orthography
