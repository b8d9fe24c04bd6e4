"""Renderer scaffolding: info, statistics, frame-loop base class.

Parity: reference src/renderer.rs:

* `RendererInfo` — name/width/height (renderer.rs:11-33);
* `RendererStatistics` — frame counter + GPU/CPU time accumulators with a
  once-per-second FPS/GPU-Time/CPU-Time/Total-Frames log line
  (renderer.rs:134-207, log at 188-194);
* `BaseRenderer` — the HalaRendererTrait analog (renderer.rs:210-324):
  commit/update/render/wait_idle plus device-restore. The swapchain
  acquire/submit/present machinery has no TPU counterpart (SURVEY.md
  "explicit non-goals"); its *roles* map to: update() = record+dispatch
  the jitted frame function, render() = block_until_ready + statistics,
  check_and_restore_device() = re-put buffers and re-jit after a device
  restart.

The reference's HalaRendererResources (context + command buffers +
256 MB staging buffer + descriptor pool, renderer.rs:36-113) is the
JAX runtime itself; no analog object is needed.
"""

from __future__ import annotations

import dataclasses
import logging
import time

import jax

logger = logging.getLogger("hala_tpu.renderer")


@dataclasses.dataclass
class RendererInfo:
    """renderer.rs:11-33."""

    name: str
    width: int
    height: int


class RendererStatistics:
    """renderer.rs:134-207: totals + 1 Hz FPS log."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.total_frames = 0
        self.total_gpu_frame_time = 0.0  # seconds
        self.total_cpu_frame_time = 0.0
        self._last_log_time = time.monotonic()
        self._frames_since_log = 0
        self._gpu_since_log = 0.0
        self._cpu_since_log = 0.0
        self.last_metrics: dict = {}

    def record_frame(
        self, gpu_time: float, cpu_time: float, rays: float = 0.0
    ) -> None:
        self.total_frames += 1
        self.total_gpu_frame_time += gpu_time
        self.total_cpu_frame_time += cpu_time
        self._frames_since_log += 1
        self._gpu_since_log += gpu_time
        self._cpu_since_log += cpu_time
        self._rays_since_log = getattr(self, "_rays_since_log", 0.0) + rays
        now = time.monotonic()
        if now - self._last_log_time >= 1.0:
            dt = now - self._last_log_time
            fps = self._frames_since_log / dt
            gpu_ms = 1000.0 * self._gpu_since_log / self._frames_since_log
            cpu_ms = 1000.0 * self._cpu_since_log / self._frames_since_log
            mrays = self._rays_since_log / dt / 1e6
            self.last_metrics = {
                "fps": fps, "gpu_ms": gpu_ms, "cpu_ms": cpu_ms,
                "mrays_per_s": mrays, "total_frames": self.total_frames,
            }
            logger.info(
                "FPS: %.2f, GPU Time: %.3fms, CPU Time: %.3fms, "
                "Rays: %.2f Mrays/s, Total Frames: %d",
                fps, gpu_ms, cpu_ms, mrays, self.total_frames,
            )
            self._rays_since_log = 0.0
            self._last_log_time = now
            self._frames_since_log = 0
            self._gpu_since_log = 0.0
            self._cpu_since_log = 0.0


class BaseRenderer:
    """Frame-loop skeleton (HalaRendererTrait, renderer.rs:210-324)."""

    def __init__(self, name: str, width: int, height: int):
        self.info = RendererInfo(name, width, height)
        self.statistics = RendererStatistics()
        self.is_device_lost = False  # HalaRendererData parity (renderer.rs:119)
        self._pending = None  # in-flight device computation

    # -- trait surface ---------------------------------------------------

    def commit(self) -> None:
        """Build pipelines/descriptors — here: trigger jit compilation."""
        raise NotImplementedError

    def update(self, delta_time: float = 0.0) -> None:
        """Record + dispatch one frame."""
        raise NotImplementedError

    def render(self) -> None:
        """Submit/present analog: wait for the dispatched frame and feed
        statistics (renderer.rs:285-322 incl. device-lost catch)."""
        if self.is_device_lost:
            return
        try:
            t0 = time.monotonic()
            if self._pending is not None:
                jax.block_until_ready(self._pending)
                self._pending = None
            gpu_time = time.monotonic() - t0
            cpu_time = getattr(self, "_last_cpu_time", 0.0)
            rays = 0.0
            lr = getattr(self, "_last_rays", None)
            if lr is not None:
                try:
                    rays = float(lr)
                except (TypeError, ValueError):
                    pass
            self.statistics.record_frame(gpu_time, cpu_time, rays)
        except jax.errors.JaxRuntimeError as err:  # device lost analog
            logger.warning("Device error during render: %s", err)
            self.is_device_lost = True

    def wait_idle(self) -> None:
        """renderer.rs:251-256."""
        if self._pending is not None:
            jax.block_until_ready(self._pending)
            self._pending = None

    def check_and_restore_device(self) -> bool:
        """renderer.rs:234-247 / rt_renderer.rs:508-563 analog: drop
        compiled executables + re-upload state after a device restart.
        Returns True if a restore happened."""
        if not self.is_device_lost:
            return False
        logger.warning("Restoring device: clearing jit caches and state.")
        jax.clear_caches()
        self._restore_device_state()
        self.statistics.reset()
        self.is_device_lost = False
        return True

    def _restore_device_state(self) -> None:
        """Subclass hook: re-create device-resident images/buffers."""
