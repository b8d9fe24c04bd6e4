"""Scene loaders (parity: reference src/scene/loader/)."""

from .gltf_loader import GltfLoader
from .uploader import SceneUploader

__all__ = ["GltfLoader", "SceneUploader"]
