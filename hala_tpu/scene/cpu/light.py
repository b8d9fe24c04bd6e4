"""Host-side light.

Parity: reference src/scene/cpu/light.rs:4-39 (HalaLight, HalaLightType):
color, intensity, type in {POINT, DIRECTIONAL, SPOT, QUAD, SPHERE} and
two generic params (cone angles / quad extents / sphere radius).
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np


class LightType(enum.IntEnum):
    POINT = 0
    DIRECTIONAL = 1
    SPOT = 2
    QUAD = 3
    SPHERE = 4


@dataclasses.dataclass
class Light:
    color: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32)
    )
    intensity: float = 1.0
    light_type: LightType = LightType.POINT
    # params semantics by type (light.rs:30-38):
    #   DIRECTIONAL: (cone angle rad, -)
    #   SPOT: (inner cone rad, outer cone rad)
    #   QUAD: (width, height)
    #   SPHERE: (radius, -)
    params: tuple[float, float] = (0.0, 0.0)
