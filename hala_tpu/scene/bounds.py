"""Axis-aligned bounding box stored as center + extents.

Parity: reference src/scene/bounds.rs:4-153 (HalaBounds). The reference
stores center/extents and derives min/max; we keep that representation
so the meshlet/BVH code paths read identically, and add vectorized
helpers used by the LBVH builder.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Bounds:
    """AABB as center + half-extents (reference bounds.rs:4-12)."""

    center: np.ndarray  # (3,) f32
    extents: np.ndarray  # (3,) f32, half sizes

    @staticmethod
    def from_min_max(mn, mx) -> "Bounds":
        mn = np.asarray(mn, np.float32)
        mx = np.asarray(mx, np.float32)
        return Bounds(center=(mn + mx) * 0.5, extents=(mx - mn) * 0.5)

    @staticmethod
    def from_points(points: np.ndarray) -> "Bounds":
        points = np.asarray(points, np.float32).reshape(-1, 3)
        return Bounds.from_min_max(points.min(axis=0), points.max(axis=0))

    @property
    def min(self) -> np.ndarray:
        return self.center - self.extents

    @property
    def max(self) -> np.ndarray:
        return self.center + self.extents

    @property
    def size(self) -> np.ndarray:
        return self.extents * 2.0

    def encapsulate_point(self, p) -> None:
        """Grow to include a point (reference bounds.rs encapsulate)."""
        mn = np.minimum(self.min, np.asarray(p, np.float32))
        mx = np.maximum(self.max, np.asarray(p, np.float32))
        self.center = (mn + mx) * 0.5
        self.extents = (mx - mn) * 0.5

    def encapsulate(self, other: "Bounds") -> None:
        """Grow to include another AABB."""
        mn = np.minimum(self.min, other.min)
        mx = np.maximum(self.max, other.max)
        self.center = (mn + mx) * 0.5
        self.extents = (mx - mn) * 0.5

    def expand(self, amount: float) -> None:
        """Symmetric expansion by `amount` on every axis (bounds.rs expand)."""
        self.extents = self.extents + np.float32(amount) * 0.5

    def contains(self, p) -> bool:
        p = np.asarray(p, np.float32)
        return bool(np.all(np.abs(p - self.center) <= self.extents + 1e-7))

    def intersects(self, other: "Bounds") -> bool:
        """AABB-vs-AABB overlap test (bounds.rs intersects)."""
        return bool(
            np.all(np.abs(self.center - other.center) <= self.extents + other.extents)
        )


def union_min_max(mins: np.ndarray, maxs: np.ndarray):
    """Vectorized union over an (N,3)/(N,3) AABB list -> (min, max)."""
    return mins.min(axis=0), maxs.max(axis=0)
