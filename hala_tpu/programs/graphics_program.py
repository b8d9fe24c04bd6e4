"""Graphics program: JSON desc -> configured raster pipeline.

Parity: reference src/graphics_program.rs (HalaGraphicsProgram{Desc}):
desc with color/depth formats, VS or task+mesh shader paths + FS,
topology, blend/rasterizer/multisample/depth state, and a full draw-call
family. TPU mapping: the desc configures RasterSettings for the software
rasterizer; `draw` runs `models.rz_renderer.raster_frame`. Formats and
fixed-function state that have no TPU meaning (Vulkan blend enums etc.)
are carried for desc-JSON compatibility and validated but not consumed.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp

from ..models.rz_renderer import RasterSettings, raster_frame


@dataclasses.dataclass
class GraphicsProgramDesc:
    """graphics_program.rs:41-73 JSON shape (subset with TPU meaning)."""

    vertex_shader_file_path: str | None = "builtin:vertex_transform"
    task_shader_file_path: str | None = None
    mesh_shader_file_path: str | None = None
    fragment_shader_file_path: str = "builtin:forward_shade"
    primitive_topology: str = "triangle_list"
    multisample_count: int = 1
    deferred: bool = False
    color_format: str = "R32G32B32A32_SFLOAT"
    depth_format: str = "D32_SFLOAT"

    @staticmethod
    def from_json(text: str) -> "GraphicsProgramDesc":
        d = json.loads(text)
        out = GraphicsProgramDesc()
        for f in dataclasses.fields(out):
            if f.name in d:
                setattr(out, f.name, d[f.name])
        return out

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @property
    def uses_mesh_shader(self) -> bool:
        """VS-or-mesh-shader exclusivity (graphics_program.rs constructors)."""
        return self.mesh_shader_file_path is not None


class GraphicsProgram:
    def __init__(self, desc: GraphicsProgramDesc, scene):
        self.desc = desc
        self.scene = scene

    def draw(self, width: int, height: int, camera_index: int = 0):
        """graphics_program.rs draw family: rasterize one frame."""
        settings = RasterSettings(
            width=width,
            height=height,
            deferred=self.desc.deferred,
            msaa=self.desc.multisample_count,
        )
        return raster_frame(
            self.scene, jnp.int32(camera_index), settings
        )

    def draw_indirect(
        self, prim_count, width: int, height: int, camera_index: int = 0
    ):
        """Indirect draw family (graphics_program.rs:469-643:
        draw[_indexed]_indirect[_count] read a VkDrawIndirectCommand
        from a DEVICE buffer). TPU analog: `prim_count` is a
        device-computed i32 scalar (or 0-d array) consumed inside the
        jit with no host round trip — shapes stay static and the count
        masks primitive validity. The `_count` variants collapse to the
        same mechanism: pass `counts[i]` (still a device value)."""
        settings = RasterSettings(
            width=width,
            height=height,
            deferred=self.desc.deferred,
            msaa=self.desc.multisample_count,
        )
        return raster_frame(
            self.scene, jnp.int32(camera_index), settings,
            prim_count=jnp.asarray(prim_count, jnp.int32),
        )
