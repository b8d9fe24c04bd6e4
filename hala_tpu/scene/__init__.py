"""Scene subsystem: CPU scene graph, loaders, and device-side SoA scene.

Parity: reference src/scene/ (vertex.rs, bounds.rs, meshlet.rs, cpu/,
gpu/, loader/). The device side is re-designed as structure-of-arrays
jnp buffers instead of Vulkan buffers + descriptor sets.
"""

from .bounds import Bounds
from .meshlet import Meshlet

__all__ = ["Bounds", "Meshlet"]
