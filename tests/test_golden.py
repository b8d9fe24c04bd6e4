"""Golden-image regression harness (SURVEY.md section 4 implication:
deterministic progressive rendering -> RMSE-checked golden renders,
the machine-checkable artifact the reference lacks).

If an INTENTIONAL integrator change breaks this, regenerate the fixture:
    python tests/fixtures/regen_golden.py
"""

import os

import numpy as np

from hala_tpu.models.integrator import (
    Film,
    RenderSettings,
    Uniforms,
    render_frame,
)
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_cornell.npz")
RMSE_TOL = 1e-3  # BASELINE parity threshold


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


class TestGoldenCornell:
    def test_render_matches_golden(self):
        scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
        settings = RenderSettings(
            width=32, height=32, max_depth=3, rr_depth=2,
            tile_size=1024, intersector="bruteforce",
        )
        uni = Uniforms.default()
        film = Film.create(32, 32)
        for f in range(8):
            film, _ = render_frame(scene, None, uni, film, f, settings)
        with np.load(FIXTURE) as z:
            assert _rmse(np.asarray(film.accum), z["accum"]) < RMSE_TOL
            assert _rmse(np.asarray(film.albedo), z["albedo"]) < RMSE_TOL
            assert _rmse(np.asarray(film.normal), z["normal"]) < RMSE_TOL

    def test_pallas_interpret_matches_golden(self):
        """The Pallas kernel path hits the same golden image."""
        scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
        settings = RenderSettings(
            width=32, height=32, max_depth=3, rr_depth=2,
            tile_size=1024, intersector="pallas", interpret_pallas=True,
        )
        uni = Uniforms.default()
        film = Film.create(32, 32)
        for f in range(8):
            film, _ = render_frame(scene, None, uni, film, f, settings)
        with np.load(FIXTURE) as z:
            assert _rmse(np.asarray(film.accum), z["accum"]) < RMSE_TOL
