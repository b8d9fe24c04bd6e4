"""Multi-device scaling: film tiling over a jax.sharding.Mesh.

The reference is single-process/single-GPU (SURVEY.md section 2.11);
this package is the greenfield TPU-native scaling layer mandated by
BASELINE.json: tile the film across chips over ICI, each chip owning its
rays, with collectives only for statistics and readback.
"""

from .tiling import make_mesh, render_frame_multichip, TiledFilm

__all__ = ["make_mesh", "render_frame_multichip", "TiledFilm"]
