"""Host-side procedural primitive declarations.

Role parity: the reference's procedural geometry path — an AABB buffer
per custom primitive plus an intersection shader
(/root/reference/src/scene/loader/gpu_uploader.rs:818-840). Apps there
register custom shapes in code, not in the glTF; the analog here is
appending ProceduralSphere records to `Scene.procedurals` before
upload. The sphere is the built-in shape; arbitrary shapes go through
the `rt.intersection` kernel hook instead.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ProceduralSphere:
    center: tuple  # (x, y, z)
    radius: float
    material: int  # index into Scene.materials
