"""Film tiling across a device mesh (image-space data parallelism).

Design (SURVEY.md sections 2.11 / 5.8, BASELINE.json north star): the
film is sharded by row blocks over a 1-D mesh axis "tiles"; the scene is
replicated (Sponza fits one chip's HBM); each chip renders only its
block, so the hot loop needs NO communication at all — collectives
appear only for the rays/s statistic (`psum`) and when the host gathers
the film for export. Fixed per-tile ownership keeps accumulation order
deterministic, so multi-chip output is bit-identical to single-chip
(hard-part #6 in SURVEY.md section 7).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.integrator import Film, RenderSettings, Uniforms, render_frame

AXIS = "tiles"


def make_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


@dataclasses.dataclass
class TiledFilm:
    """Film sharded by rows over the mesh axis."""

    film: Film
    mesh: Mesh
    full_height: int
    width: int

    @staticmethod
    def create(mesh: Mesh, width: int, height: int) -> "TiledFilm":
        nd = mesh.devices.size
        assert height % nd == 0, "film height must divide the mesh size"
        sharding = NamedSharding(mesh, P(AXIS, None, None))
        z = lambda: jax.device_put(
            jnp.zeros((height, width, 4), jnp.float32), sharding
        )
        return TiledFilm(
            film=Film(accum=z(), albedo=z(), normal=z()),
            mesh=mesh,
            full_height=height,
            width=width,
        )

    def gather(self) -> Film:
        """Readback: the all-gather of accumulation tiles (here realized
        by the host fetching the sharded arrays)."""
        return jax.tree.map(lambda x: jnp.asarray(jax.device_get(x)), self.film)


def _sharded_frame(
    scene,
    env,
    uniforms: Uniforms,
    tiled: TiledFilm,
    frame_index,
    settings: RenderSettings,
    spec_scene,
    scene_axis: str | None = None,
):
    """Shared shard_map scaffolding for both multi-chip modes: film
    rows over AXIS, scene laid out per `spec_scene` (all-replicated for
    film tiling; geometry over AXIS for scene sharding, which also sets
    scene_axis so the integrator runs its cross-shard merge)."""
    mesh = tiled.mesh
    nd = mesh.devices.size
    full_h = settings.height
    shard_h = full_h // nd
    shard_settings = dataclasses.replace(
        settings, height=shard_h, scene_axis=scene_axis
    )

    spec_film = Film(
        accum=P(AXIS, None, None),
        albedo=P(AXIS, None, None),
        normal=P(AXIS, None, None),
    )
    rep_env = jax.tree.map(lambda _: P(), env) if env is not None else None
    rep_uni = jax.tree.map(lambda _: P(), uniforms)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_scene, rep_env, rep_uni, spec_film, P()),
        out_specs=(spec_film, P()),
        # Pallas interpret mode (CPU tests) lowers through closed_calls
        # whose internal constants are replicated, tripping jax's vma
        # check; compiled kernels on real chips keep the check on.
        check_vma=not settings.interpret_pallas,
    )
    def step(scene_r, env_r, uniforms_r, film_shard, fidx):
        # Promote the REPLICATED operands to the mesh axis's varying
        # type (free — a vma type cast): nested jitted kernels (the
        # Pallas query wrappers) lower as closed_call, and jax's
        # check_vma rejects mixed varying/replicated operands there.
        # Sharded geometry leaves are already varying.
        cast = (
            (lambda x: jax.lax.pcast(x, AXIS, to="varying"))
            if hasattr(jax.lax, "pcast")
            else (lambda x: jax.lax.pvary(x, AXIS))
        )
        scene_r = jax.tree.map(
            lambda x, s: x if AXIS in s else cast(x), scene_r, spec_scene
        )
        uniforms_r = jax.tree.map(cast, uniforms_r)
        env_r = jax.tree.map(cast, env_r) if env_r is not None else None
        fidx = cast(fidx)
        row0 = jax.lax.axis_index(AXIS) * shard_h
        new_film, rays = render_frame(
            scene_r,
            env_r,
            uniforms_r,
            film_shard,
            fidx,
            shard_settings,
            row_offset=row0,
            full_height=full_h,
        )
        total = jax.lax.psum(rays, AXIS)
        return new_film, total

    new_film, rays = step(
        scene, env, uniforms, tiled.film, jnp.asarray(frame_index, jnp.uint32)
    )
    return (
        TiledFilm(
            film=new_film, mesh=mesh, full_height=full_h, width=tiled.width
        ),
        rays,
    )


def render_frame_multichip(
    scene,
    env,
    uniforms: Uniforms,
    tiled: TiledFilm,
    frame_index,
    settings: RenderSettings,
):
    """One progressive frame over the mesh (scene replicated). Returns
    (TiledFilm, total rays).

    `settings.height` must be the full film height; each shard renders
    full_height / n_devices rows with the correct global row offset.
    """
    return _sharded_frame(
        scene, env, uniforms, tiled, frame_index, settings,
        spec_scene=jax.tree.map(lambda _: P(), scene),
    )
