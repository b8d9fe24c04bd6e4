#!/usr/bin/env python
"""Benchmark harness: all BASELINE.md configs on real TPU.

Prints ONE JSON line per config:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The Cornell line comes FIRST (the driver parses the first line; target
>= 100 Mrays/s per chip, BASELINE.md). `vs_baseline` is value/100 for
throughput metrics and null for ms/frame metrics (no published ms
target exists — BASELINE.md "published: none").

Fault resilience (round-3 verdict item 1): with no argument (the
driver's invocation) each config runs in its OWN subprocess with a
bounded timeout; UNAVAILABLE tunnel hiccups / kernel faults are retried
with backoff, and every config that succeeds emits its lines even when
another config dies. `python bench.py <config>` runs one config
in-process (worker mode — used by the orchestrator and for debugging).

Correctness invariants (round-3 verdict item 6): each path-traced
config asserts (a) total rays traced > 1.2x camera rays — a sky-only
mis-render (the round-3 bs=8 zero-triangle bug) terminates every path
at the primary miss, so its counter lands EXACTLY on primaries — and
(b) the film's accumulated mean lies inside a measured band. A config
failing its invariant exits with code 3 (not retried: a mis-render is
deterministic) and emits nothing.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

# ---------------------------------------------------------------------------
# Invariants
# ---------------------------------------------------------------------------

# Accumulated-film mean-radiance bands (mean over RGB of film.accum
# after the measured frames). Measured on the known-good render of each
# config (TPU, round 4) with +-40% slack: wide enough for estimator
# noise and deliberate sampling changes, narrow enough that a sky-only
# or geometry-dropping frame (raster round-3: true 0.88 vs clipped
# 0.66 at the golden camera — a 25% collapse) trips it.
ACCUM_MEAN_BANDS: dict[str, tuple[float, float]] = {
    "cornell": (0.42, 0.97),       # measured 0.6949 TPU / 0.6944 CPU (r4)
    "ggx": (0.41, 0.96),           # measured 0.6855 (TPU, round 4)
    "envmap": (0.021, 0.050),      # measured 0.0353 (TPU, round 4)
    "sponza": (0.09, 0.75),
    "sponza16": (0.09, 0.75),
    "raster": (0.05, 0.60),
    "raster_atrium": (0.37, 0.87),  # measured 0.6230 (TPU, round 4)
}

INVARIANT_EXIT = 3  # orchestrator: do not retry


class InvariantError(AssertionError):
    pass


def check_invariants(
    name: str,
    accum_mean: float,
    rays_total: float | None = None,
    primaries: float | None = None,
) -> None:
    """Raise InvariantError if the render looks like a mis-render.

    rays_total EXACTLY equal to the camera-ray count is the signature
    of a no-geometry frame (every path dies at its primary miss); the
    1.2x threshold also catches near-total geometry loss. The mean band
    catches shading/accumulation collapse that keeps ray counts alive.
    """
    if rays_total is not None and primaries is not None:
        if rays_total <= primaries * 1.2:
            raise InvariantError(
                f"{name}: rays_total {rays_total:.0f} <= 1.2x camera rays "
                f"{primaries:.0f} — sky-only / no-geometry frame"
            )
    band = ACCUM_MEAN_BANDS.get(name)
    if band is not None:
        lo, hi = band
        if not (lo <= accum_mean <= hi):
            raise InvariantError(
                f"{name}: film accum mean {accum_mean:.4f} outside "
                f"[{lo}, {hi}] — shading collapse or blow-up"
            )


def _emit(metric, value, unit="Mrays/s", vs=None):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": (
                    round(value / 100.0, 4) if vs == "throughput" else vs
                ),
            }
        ),
        flush=True,
    )


# ---------------------------------------------------------------------------
# Workers (one BASELINE config each; run in-process)
# ---------------------------------------------------------------------------


def _film_mean(film):
    """Mean RGB of the accumulated film, fetched as ONE scalar (a full
    1080p film readback over the axon tunnel is a 33 MB transfer)."""
    import jax
    import jax.numpy as jnp

    return float(jax.jit(lambda a: jnp.mean(a[..., :3]))(film.accum))


def _trace_loop(scene, env, settings, frames, name, staged=False):
    """Pipelined progressive loop (no host sync inside — a per-frame
    readback costs a full tunnel round trip, measured 6x throughput).
    Returns (Mrays/s, ms/frame); checks the config's invariants.

    staged=True dispatches each frame through render_frame_staged
    (bit-equal to the megakernel, round-3 measured 0.5% overhead):
    many small async XLA programs instead of one per frame, which both
    respects the axon ~2 min single-execution bound at large tiles and
    matches the tile-ladder measurement config (round-4 ledger:
    7.51 s/frame at tile 131072 -> 5.02 s at 524288)."""
    import jax

    from hala_tpu.models.integrator import (
        Film, Uniforms, render_frame_staged, render_frames,
    )

    uniforms = Uniforms.default()
    film = Film.create(settings.width, settings.height)
    t_cold = time.perf_counter()
    if staged:
        film, rays = render_frame_staged(
            scene, env, uniforms, film, 0, settings
        )
    else:
        # Megakernel configs fuse the whole progressive window into ONE
        # XLA program (render_frames): bit-identical accumulation, but
        # the host pays 1 dispatch instead of `frames` — the honest
        # re-baseline showed small frames are dominated by a ~28 ms
        # per-PROGRAM cost on the axon tunnel (round-5 ledger,
        # tools/probe_dispatch.py). The warmup below runs frames
        # 0..frames-1; the measured window runs frames..2*frames-1.
        film, rays = render_frames(
            scene, env, uniforms, film, 0, frames, settings
        )
    float(rays)  # honest completion barrier (block_until_ready can
    # return early on axon, round-5 ledger)
    # cold = compile + first frame(s); across fresh processes this line
    # is the pipeline-cache verification (rt_renderer.rs:229-240 role):
    # a warm ./out/xla_cache must make it collapse toward frame time.
    print(
        f"[bench] {name}: cold compile+first-frame "
        f"{time.perf_counter() - t_cold:.1f}s",
        file=sys.stderr, flush=True,
    )
    import jax.numpy as jnp

    _sum_all = jax.jit(lambda rs: jnp.sum(jnp.stack(rs)))
    if staged:
        rays_acc = []
        t0 = time.perf_counter()
        for f in range(1, 1 + frames):
            film, rays = render_frame_staged(
                scene, env, uniforms, film, f, settings
            )
            rays_acc.append(rays)
        # ONE jitted sum + scalar fetch ends the window honestly: the
        # fetch cannot return before every queued frame finished
        # (in-order stream), unlike block_until_ready (round-5 ledger)
        total_rays = float(_sum_all(rays_acc))
        dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        film, rays = render_frames(
            scene, env, uniforms, film, frames, frames, settings
        )
        total_rays = float(rays)
        dt = time.perf_counter() - t0
    primaries = (
        settings.width * settings.height * max(1, settings.spp) * frames
    )
    mean = _film_mean(film)
    print(f"[bench] {name}: accum mean {mean:.4f}, rays/primary "
          f"{total_rays / primaries:.2f}", file=sys.stderr, flush=True)
    check_invariants(name, mean, total_rays, primaries)
    return total_rays / dt / 1e6, dt / frames * 1e3


def _ggx_settings():
    from hala_tpu.models.integrator import RenderSettings

    return RenderSettings(
        width=512, height=512, max_depth=4, rr_depth=2, tile_size=65536,
        intersector="auto",
    )


def bench_cornell():
    """Config 1: Cornell Box path trace, 512x512, diffuse BSDF."""
    from hala_tpu.scene.loader.uploader import SceneUploader
    from hala_tpu.scene.procedural import cornell_box

    scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
    mrays, ms = _trace_loop(scene, None, _ggx_settings(), 16, "cornell")
    _emit("cornell_512_pathtrace_throughput", mrays, vs="throughput")


def bench_ggx():
    """Config 2: multi-bounce GGX metallic-roughness + NEE, 4 spp."""
    import numpy as np

    from hala_tpu.scene.cpu.material import Material, MaterialType
    from hala_tpu.scene.loader.uploader import SceneUploader
    from hala_tpu.scene.procedural import cornell_box

    metal = Material(
        type=MaterialType.DISNEY,
        base_color=np.array([0.9, 0.75, 0.4], np.float32),
        roughness=0.2, metallic=1.0,
    )
    glossy = Material(
        type=MaterialType.DISNEY,
        base_color=np.array([0.2, 0.4, 0.9], np.float32),
        roughness=0.45, metallic=0.0,
    )
    scene = SceneUploader.upload(
        cornell_box(tall_box_material=metal, short_box_material=glossy),
        use_ray_tracing=False,
    )
    # Config 2's OWN shape (BASELINE "4 spp", round-4 verdict item 6):
    # each frame renders 4 sample-adjacent spp (settings.spp=4 — bounce
    # rays of a pixel's 4 samples share kernel tiles), over the same
    # 16-frame steady-state window as Cornell (a 4-frame window
    # under-reports by ~30% — it mostly times the dispatch ramp). The
    # metric key's _s4 suffix marks the shape change from the rounds
    # 2-4 16x1spp methodology (key then: _w16); comparing across
    # suffixes compares different workloads (DESIGN.md ledger note).
    settings = dataclasses.replace(_ggx_settings(), spp=4)
    mrays, _ = _trace_loop(scene, None, settings, 16, "ggx")
    _emit("ggx_4spp_pathtrace_throughput_w16s4", mrays, vs="throughput")


def bench_envmap():
    """Config 3: HDR environment lighting through the inverted-CDF
    tables (envmap.rs parity)."""
    import numpy as np

    from hala_tpu.envmap import EnvMap
    from hala_tpu.models.integrator import ENV_MAP, RenderSettings
    from hala_tpu.scene.loader.uploader import SceneUploader
    from hala_tpu.scene.procedural import cornell_box

    rs = np.random.RandomState(7)
    rgb = rs.uniform(0.05, 0.3, (64, 128, 3)).astype(np.float32)
    rgb[20:26, 40:48] = 60.0  # hot "sun" patch: CDF must find it
    env = EnvMap.from_array(rgb)
    # No ceiling light: all illumination arrives via env importance
    # sampling + MIS through the open-top box geometry.
    scene = SceneUploader.upload(
        cornell_box(light_intensity=0.0), use_ray_tracing=False
    )
    settings = RenderSettings(
        width=512, height=512, max_depth=4, rr_depth=2, tile_size=65536,
        env_type=ENV_MAP, intersector="auto",
    )
    # 16 pipelined frames: same steady-state window as cornell/ggx (the
    # round-2 ledger measured short windows under-reporting ~30% by
    # timing the dispatch ramp; envmap ran an 8-frame window through
    # round 4's first capture — 90.2 vs the 104.1 quiet-host probe).
    mrays, _ = _trace_loop(scene, env, settings, 16, "envmap")
    _emit("envmap_cdf_pathtrace_throughput", mrays, vs="throughput")


def _sponza_scene():
    from hala_tpu.scene.cpu.scene import Scene
    from hala_tpu.scene.loader.uploader import SceneUploader

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets", "atrium_big.glb",
    )
    return SceneUploader.upload(Scene.load(path), use_ray_tracing=False)


def bench_sponza():
    """Config 4 (1 spp shape): Sponza-scale scene loaded from a REAL
    .glb on disk (assets/atrium_big.glb: 167k triangles, embedded PNG
    textures, quad area lights) — on-the-fly AS build (binned-SAH
    ragged clusters, the LBVH role) + VMEM matrix traversal with split
    any-hit shadow dispatch + free dead-ray compaction, 1080p film.
    The round-2 metric of the same name measured the 34k-triangle
    atrium; the asset was scaled ~5x to an honest Sponza class
    (round-2 verdict item 4), so cross-round comparison under this key
    spans different inputs."""
    from hala_tpu.models.integrator import RenderSettings

    scene = _sponza_scene()
    settings = RenderSettings(
        width=1920, height=1088, max_depth=4, rr_depth=2,
        # 1048576-ray frame tiles: the round-4 tile ladder measured
        # 7.51 s/frame (131072) -> 5.66 (262144) -> 4.96 (524288) ->
        # 4.50 (1048576) -> 5.43 (2097152, whole frame — past the knee
        # the morton sort / top_k n log n outgrows the amortized fixed
        # work) as per-tile fixed cost (sort, compaction, kernel ramp)
        # amortizes; dispatched staged so no single XLA execution grows
        # with the tile (axon kills ~2 min executions).
        tile_size=int(os.environ.get("SPONZA_TILE", "1048576")),
        intersector="auto", sort_rays=True,
    )
    mrays, ms = _trace_loop(scene, None, settings, 3, "sponza", staged=True)
    _emit("sponza_scale_1080p_pathtrace_throughput", mrays, vs="throughput")
    _emit("sponza_scale_1080p_ms_per_frame_1spp", ms, unit="ms")


def bench_sponza16():
    """Config 4's OWN workload shape (BASELINE.md: "1080p 16 spp"),
    its own subprocess so a fault here cannot cost the 1-spp lines.

    Dispatched through the STAGED frame (render_frame_staged — bit-equal
    to the megakernel, measured 0.5% overhead): one megakernel 16-spp
    frame is a single ~2 min XLA execution (255 traversal tiles in one
    scan), which dies with UNAVAILABLE on the axon tunnel (round-3
    spp16.log; the per-tile shapes are identical to the working 1-spp
    frame, so the failure tracks execution length, not a kernel shape).
    Staging keeps every dispatch small while preserving the 16
    sample-adjacent rays per pixel in each traversal tile."""
    import jax

    from hala_tpu.models.integrator import (
        Film, RenderSettings, Uniforms, render_frame_staged,
    )

    scene = _sponza_scene()
    settings = RenderSettings(
        width=1920, height=1088, max_depth=4, rr_depth=2,
        # same 1048576-ray tile as the 1-spp config (round-4 ladder
        # win); at 16 spp that is 65536 pixels x 16 sample-adjacent rays.
        tile_size=int(os.environ.get("SPONZA16_TILE", "1048576")),
        intersector="auto", sort_rays=True, spp=16,
    )
    uniforms = Uniforms.default()
    film = Film.create(settings.width, settings.height)
    t_cold = time.perf_counter()
    film, rays = render_frame_staged(
        scene, None, uniforms, film, 0, settings
    )
    jax.block_until_ready(film.accum)  # compile + first frame
    print(
        f"[bench] sponza16: cold compile+first-frame "
        f"{time.perf_counter() - t_cold:.1f}s",
        file=sys.stderr, flush=True,
    )
    t0 = time.perf_counter()
    film, rays = render_frame_staged(
        scene, None, uniforms, film, 1, settings
    )
    total_rays = float(rays)  # honest barrier: scalar fetch, not block
    dt = time.perf_counter() - t0
    primaries = settings.width * settings.height * 16
    check_invariants("sponza16", _film_mean(film), total_rays, primaries)
    _emit(
        "sponza_scale_1080p_16spp_throughput", total_rays / dt / 1e6,
        vs="throughput",
    )


def bench_raster():
    """Config 5: tile-binned rasterizer + compute post pass
    (rz_renderer parity). The headline is the Sponza-scale mesh
    (atrium_big, ~238k projected tris at the bench camera — the
    round-2 Cornell number was pure per-tile dispatch overhead at 36
    triangles; VERDICT round-3 weak item 5)."""
    import jax

    from hala_tpu.models.rz_renderer import RasterizationRenderer
    from hala_tpu.programs.compute_program import (
        ComputeProgram, ComputeProgramDesc,
    )
    from hala_tpu.scene.cpu.scene import Scene
    from hala_tpu.scene.procedural import cornell_box

    post = ComputeProgram(ComputeProgramDesc(
        shader_file_path="hala_tpu.ops.tonemap:tonemap_aces_simple"
    ))

    def time_renderer(r, frames, name):
        import jax.numpy as jnp

        # honest completion barrier: block_until_ready on axon can
        # return before execution finishes (round-5 ledger); only a
        # scalar host fetch is trustworthy as the end of a timed window
        _mean = jax.jit(lambda a: jnp.mean(a[..., :3]))
        r.commit()
        t_cold = time.perf_counter()
        r.update()  # compile + first frame
        mean = float(_mean(r.color))
        print(
            f"[bench] {name}: cold compile+first-frame "
            f"{time.perf_counter() - t_cold:.1f}s",
            file=sys.stderr, flush=True,
        )
        t0 = time.perf_counter()
        for _ in range(frames):
            r.update()
        mean = float(_mean(r.color))
        ms = (time.perf_counter() - t0) / frames * 1e3
        check_invariants(name, mean)
        return ms

    ra = RasterizationRenderer(
        "bench_atrium", 1920, 1088, binned=True, tile=64,
        post_program=post,
    )
    ra.set_scene(Scene.load(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets", "atrium_big.glb",
    )))
    ms = time_renderer(ra, 10, "raster_atrium")
    _emit("raster_atrium_big_1080p_ms_per_frame", ms, unit="ms")

    # Secondary: the historical Cornell config (36 tris — measures
    # fixed dispatch + post cost, kept for cross-round continuity).
    r = RasterizationRenderer(
        "bench", 1920, 1088, binned=True, tile=64, post_program=post,
    )
    r.set_scene(cornell_box())
    ms = time_renderer(r, 30, "raster")
    _emit("raster_binned_post_1080p_ms_per_frame", ms, unit="ms")


WORKERS = {
    "cornell": bench_cornell,
    "ggx": bench_ggx,
    "envmap": bench_envmap,
    "sponza": bench_sponza,
    "sponza16": bench_sponza16,
    "raster": bench_raster,
}

# (config, timeout_s, attempts). Orders the driver output: cornell first.
SCHEDULE = [
    ("cornell", 1500, 3),
    ("ggx", 1500, 3),
    ("envmap", 1500, 3),
    ("sponza", 3000, 2),
    ("sponza16", 3000, 2),
    ("raster", 2400, 2),
]


def run_worker(config: str) -> None:
    from hala_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    try:
        WORKERS[config]()
    except InvariantError as e:
        print(f"INVARIANT FAILED [{config}]: {e}", file=sys.stderr)
        sys.exit(INVARIANT_EXIT)


def orchestrate() -> None:
    """Run every config in its own subprocess; retry transient device
    failures (tunnel UNAVAILABLE, kernel faults, timeouts) with backoff.
    Worker JSON lines stream through live, so configs that succeed are
    never lost to a later failure."""
    failures = []
    for config, limit, attempts in SCHEDULE:
        for attempt in range(1, attempts + 1):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), config],
                    capture_output=True, text=True, timeout=limit,
                )
            except subprocess.TimeoutExpired as e:
                print(
                    f"[bench] {config} attempt {attempt}: timeout {limit}s\n"
                    f"{(e.stderr or '')[-2000:]}",
                    file=sys.stderr, flush=True,
                )
                continue
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            for line in proc.stderr.splitlines():
                # diagnostic lines (accum means feed band calibration)
                if line.startswith("[bench]"):
                    print(line, file=sys.stderr, flush=True)
            if proc.returncode == 0:
                break
            tail = proc.stderr.strip().splitlines()[-12:]
            print(
                f"[bench] {config} attempt {attempt}: rc={proc.returncode}\n"
                + "\n".join(tail),
                file=sys.stderr, flush=True,
            )
            if proc.returncode == INVARIANT_EXIT:
                break  # deterministic mis-render: retrying cannot help
            time.sleep(30 * attempt)  # tunnel hiccups need breathing room
        else:
            failures.append(config)
    if failures:
        print(f"[bench] configs exhausted retries: {failures}",
              file=sys.stderr, flush=True)
    # exit 0: the emitted lines are the product; a missing config is
    # visible by its absence and must not zero the others (round-3
    # verdict item 1).


def main() -> None:
    config = sys.argv[1].lstrip("-") if len(sys.argv) > 1 else "all"
    if config == "all":
        orchestrate()
    elif config in WORKERS:
        run_worker(config)
    else:
        print(f"unknown config {config!r}; one of {list(WORKERS)} or 'all'",
              file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
