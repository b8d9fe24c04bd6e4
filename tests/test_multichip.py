"""Multi-chip film tiling on the 8-device CPU mesh: sharded render must
be bit-identical to single-device (fixed per-tile ownership, SURVEY.md
section 7 hard-part #6)."""

import jax
import numpy as np

from hala_tpu.models.integrator import (
    Film,
    RenderSettings,
    Uniforms,
    render_frame,
)
from hala_tpu.parallel.tiling import (
    TiledFilm,
    make_mesh,
    render_frame_multichip,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single(cornell_device_scene):
    size = 32
    settings = RenderSettings(
        width=size, height=size, max_depth=3, rr_depth=2,
        tile_size=size * size // 8, use_bvh=True,
    )
    uniforms = Uniforms.default()

    # single device
    film = Film.create(size, size)
    for f in range(2):
        film, rays_single = render_frame(
            cornell_device_scene, None, uniforms, film, f, settings
        )

    # 8-device mesh, film sharded by rows
    mesh = make_mesh()
    tiled = TiledFilm.create(mesh, size, size)
    for f in range(2):
        tiled, rays_multi = render_frame_multichip(
            cornell_device_scene, None, uniforms, tiled, f, settings
        )

    gathered = tiled.gather()
    np.testing.assert_array_equal(
        np.asarray(film.accum), np.asarray(gathered.accum)
    )
    np.testing.assert_array_equal(
        np.asarray(film.normal), np.asarray(gathered.normal)
    )
    assert float(rays_single) == float(rays_multi)
