"""Public API surface tests (prelude parity, reference src/prelude.rs:
every re-exported name must exist and be importable) and the error
bridge (error.rs cause chaining)."""

import pytest

import hala_tpu
from hala_tpu.error import HalaRendererError


class TestPrelude:
    def test_all_exports_exist(self):
        for name in hala_tpu.__all__:
            assert hasattr(hala_tpu, name), f"missing export {name}"

    def test_renderer_exports(self):
        """prelude.rs:17-18: both renderers exported under distinct names."""
        assert hala_tpu.RayTracingRenderer is not hala_tpu.RasterizationRenderer

    def test_scene_type_exports(self):
        from hala_tpu import (
            Bounds, Camera, Light, Material, Mesh, Scene,  # noqa: F401
        )

    def test_version(self):
        assert hala_tpu.__version__


class TestErrorBridge:
    def test_cause_chain(self):
        """error.rs:28-42: errors carry their source."""
        inner = ValueError("device exploded")
        err = HalaRendererError("render failed", inner)
        assert err.__cause__ is inner
        assert "device exploded" in str(err)

    def test_raises_through_api(self):
        with pytest.raises(HalaRendererError):
            hala_tpu.Scene.load("nope.fbx")
