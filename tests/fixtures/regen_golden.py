"""Regenerate golden render fixtures. Run from the repo root after a
DELIBERATE integrator change:  python tests/fixtures/regen_golden.py
"""
import os, sys

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, os.getcwd())
from hala_tpu.models.integrator import Film, RenderSettings, Uniforms, render_frame
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box

def main():
    scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
    settings = RenderSettings(width=32, height=32, max_depth=3, rr_depth=2,
                              tile_size=1024, intersector="bruteforce")
    uni = Uniforms.default()
    film = Film.create(32, 32)
    for f in range(8):
        film, _ = render_frame(scene, None, uni, film, f, settings)
    out = os.path.join(os.path.dirname(__file__), "golden_cornell.npz")
    np.savez_compressed(out,
                        accum=np.asarray(film.accum),
                        albedo=np.asarray(film.albedo),
                        normal=np.asarray(film.normal))
    print("wrote", out)

if __name__ == "__main__":
    main()
