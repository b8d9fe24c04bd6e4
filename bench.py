#!/usr/bin/env python
"""Benchmark harness: Cornell Box progressive path trace on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

Baseline target (BASELINE.md): >= 100 Mrays/s per chip on Cornell Box.
`vs_baseline` is value / 100.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    config = sys.argv[1].lstrip("-") if len(sys.argv) > 1 else "cornell"
    if config == "sponza":
        _bench_sponza()
        return
    from hala_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from hala_tpu.models.integrator import (
        Film,
        RenderSettings,
        Uniforms,
        render_frame,
        resolve_intersector,
    )
    from hala_tpu.scene.loader.uploader import SceneUploader
    from hala_tpu.scene.procedural import cornell_box

    width = height = 512
    spp_timed = 16

    scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
    settings = RenderSettings(
        width=width,
        height=height,
        max_depth=4,
        rr_depth=2,
        tile_size=65536,
        intersector=resolve_intersector("auto"),
    )
    uniforms = Uniforms.default()
    film = Film.create(width, height)

    # Warmup / compile.
    film, rays = render_frame(scene, None, uniforms, film, 0, settings)
    jax.block_until_ready(rays)

    # Pipeline the timed frames: no host sync inside the loop (a per-
    # frame readback costs a full tunnel round trip and was measured to
    # dominate the frame time); fetch the ray totals once at the end.
    rays_acc = []
    t0 = time.perf_counter()
    for f in range(1, 1 + spp_timed):
        film, rays = render_frame(scene, None, uniforms, film, f, settings)
        rays_acc.append(rays)
    jax.block_until_ready(film.accum)
    dt = time.perf_counter() - t0
    total_rays = float(sum(rays_acc))

    mrays = total_rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "cornell_512_pathtrace_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )



def _bench_sponza() -> None:
    """Secondary config (BASELINE config[4] scale): sponza_like through
    the cluster-streaming intersector. Run manually:
    `python bench.py sponza`."""
    from hala_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from hala_tpu.models.integrator import (
        Film,
        RenderSettings,
        Uniforms,
        render_frame,
    )
    from hala_tpu.scene.loader.uploader import SceneUploader
    from hala_tpu.scene.procedural import sponza_like

    scene = SceneUploader.upload(
        sponza_like(rooms=(8, 8), columns_per_room=4, boxes_per_room=20),
        use_ray_tracing=False,
    )
    settings = RenderSettings(
        width=512, height=512, max_depth=4, rr_depth=2,
        tile_size=65536, intersector="cluster", sort_rays=True,
    )
    uniforms = Uniforms.default()
    film = Film.create(512, 512)
    film, rays = render_frame(scene, None, uniforms, film, 0, settings)
    jax.block_until_ready(rays)
    rays_acc = []
    t0 = time.perf_counter()
    for f in range(1, 9):
        film, rays = render_frame(scene, None, uniforms, film, f, settings)
        rays_acc.append(rays)
    jax.block_until_ready(film.accum)
    dt = time.perf_counter() - t0
    mrays = float(sum(rays_acc)) / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "sponza20k_pathtrace_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
