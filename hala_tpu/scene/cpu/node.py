"""Scene-graph node.

Parity: reference src/scene/cpu/node.rs:2-28 (HalaNode): name, parent
index, local + world 4x4 transforms, and mesh/camera/light indices with
NONE encoded as u32::MAX. We keep the sentinel as `None` on the host.
"""

from __future__ import annotations

import dataclasses

import numpy as np

NONE_INDEX = 0xFFFFFFFF


@dataclasses.dataclass
class Node:
    name: str = "<Unnamed>"
    parent: int | None = None
    children: list[int] = dataclasses.field(default_factory=list)
    # Column-major semantics match glam::Mat4 usage in the reference:
    # we store a standard (4,4) row-index matrix M such that
    # world_point = M @ [p, 1]. glam's x_axis/y_axis/z_axis/w_axis are
    # M[:,0], M[:,1], M[:,2], M[:,3] respectively.
    local_transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )
    world_transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )
    mesh_index: int | None = None
    camera_index: int | None = None
    light_index: int | None = None
