"""Device-side scene representation (parity: reference src/scene/gpu/).

Vulkan buffers/images/descriptor-sets become structure-of-arrays jnp
buffers registered as pytrees, so the whole scene flows through jit.
"""

from .scene import (
    DeviceScene,
    DeviceGeometry,
    DeviceMaterials,
    DeviceLights,
    DeviceCameras,
    TextureStack,
)

__all__ = [
    "DeviceScene", "DeviceGeometry", "DeviceMaterials", "DeviceLights",
    "DeviceCameras", "TextureStack",
]
