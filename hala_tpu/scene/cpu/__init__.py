"""Host-side scene graph (parity: reference src/scene/cpu/)."""

from .scene import Scene
from .node import Node
from .mesh import Mesh, Primitive
from .material import Material, Medium, MaterialType, MediumType
from .light import Light, LightType
from .camera import Camera, PerspectiveCamera, OrthographicCamera
from .image_data import ImageData, ImageFormat

__all__ = [
    "Scene", "Node", "Mesh", "Primitive",
    "Material", "Medium", "MaterialType", "MediumType",
    "Light", "LightType",
    "Camera", "PerspectiveCamera", "OrthographicCamera",
    "ImageData", "ImageFormat",
]
