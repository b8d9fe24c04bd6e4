"""bench.py correctness invariants (round-3 verdict item 6).

The round-3 bs=8 zero-triangle bug produced a sky-only film with
plausible timings and a plausible-looking image; the only machine tell
was the ray counter landing EXACTLY on the primary-ray count. These
tests pin that a sky-only frame now fails the bench instead of
publishing a number.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ACCUM_MEAN_BANDS, InvariantError, check_invariants


class TestRayCountInvariant:
    def test_sky_only_frame_trips(self):
        # Sky-only: every path dies at its primary miss, so the traced
        # ray counter equals the camera-ray count exactly (2^21 in the
        # round-3 incident).
        with pytest.raises(InvariantError, match="sky-only"):
            check_invariants(
                "cornell", accum_mean=0.69,
                rays_total=2.0**21, primaries=2.0**21,
            )

    def test_near_total_geometry_loss_trips(self):
        with pytest.raises(InvariantError, match="sky-only"):
            check_invariants(
                "sponza", accum_mean=0.2,
                rays_total=1.1 * 2.0**21, primaries=2.0**21,
            )

    def test_healthy_ray_population_passes(self):
        # Depth-4 path tracing with NEE traces well over 2x primaries.
        check_invariants(
            "cornell", accum_mean=0.69,  # inside the measured band
            rays_total=2.7 * 2.0**21, primaries=2.0**21,
        )


class TestAccumMeanBand:
    def test_shading_collapse_trips(self):
        lo, _ = ACCUM_MEAN_BANDS["cornell"]
        with pytest.raises(InvariantError, match="outside"):
            check_invariants(
                "cornell", accum_mean=lo * 0.25,
                rays_total=3e6, primaries=1e6,
            )

    def test_blow_up_trips(self):
        _, hi = ACCUM_MEAN_BANDS["sponza"]
        with pytest.raises(InvariantError, match="outside"):
            check_invariants(
                "sponza", accum_mean=hi * 10,
                rays_total=3e6, primaries=1e6,
            )

    def test_raster_mean_only_config(self):
        # Raster configs have no ray counter; the mean band still guards
        # the round-3 geometry-dropping failure mode (true mean 0.88 vs
        # clipped 0.66 at the golden camera).
        lo, hi = ACCUM_MEAN_BANDS["raster_atrium"]
        check_invariants("raster_atrium", accum_mean=(lo + hi) / 2)
        with pytest.raises(InvariantError):
            check_invariants("raster_atrium", accum_mean=hi * 4)

    def test_unknown_config_checks_rays_only(self):
        check_invariants("some_future_config", accum_mean=1e9)
