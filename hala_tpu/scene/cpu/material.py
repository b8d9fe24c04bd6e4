"""Host-side material: Disney BSDF parameter set + participating medium.

Parity: reference src/scene/cpu/material.rs:24-80 (HalaMaterial,
HalaMedium, HalaMaterialType, HalaMediumType).
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

NONE_INDEX = 0xFFFFFFFF


class MaterialType(enum.IntEnum):
    """material.rs HalaMaterialType: 0=DIFFUSE (Oren-Nayar), 1=DISNEY."""

    DIFFUSE = 0
    DISNEY = 1


class MediumType(enum.IntEnum):
    """material.rs HalaMediumType."""

    NONE = 0
    ABSORB = 1
    SCATTER = 2
    EMISSIVE = 3


@dataclasses.dataclass
class Medium:
    type: MediumType = MediumType.NONE
    color: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    density: float = 0.0
    anisotropy: float = 0.0


@dataclasses.dataclass
class Material:
    type: MaterialType = MaterialType.DIFFUSE
    base_color: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32)
    )
    opacity: float = 1.0
    emission: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    anisotropic: float = 0.0
    metallic: float = 0.0
    roughness: float = 1.0
    subsurface: float = 0.0
    specular_tint: float = 0.0
    sheen: float = 0.0
    sheen_tint: float = 0.0
    clearcoat: float = 0.0
    clearcoat_roughness: float = 0.0
    clearcoat_tint: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32)
    )
    specular_transmission: float = 0.0
    ior: float = 1.5
    medium: Medium = dataclasses.field(default_factory=Medium)
    # KHR_texture_transform (offset_u, offset_v, rotation, scale_u,
    # scale_v), taken from the baseColorTexture binding and applied to
    # every map of the material (single-UV-set design, matching the
    # reference's uv0-only read).
    uv_transform: tuple = (0.0, 0.0, 0.0, 1.0, 1.0)
    base_color_map_index: int = NONE_INDEX
    emission_map_index: int = NONE_INDEX
    normal_map_index: int = NONE_INDEX
    metallic_roughness_map_index: int = NONE_INDEX
