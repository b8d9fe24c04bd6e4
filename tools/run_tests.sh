#!/bin/bash
# Full CPU test suite as two pytest processes.
#
# A single process running all ~230 tests can die with an XLA-CPU
# compile segfault mid-suite (faulthandler dump, not reproducible in
# fresh processes; every sub-suite passes in isolation — CLAUDE.md).
# Two alphabetical halves sidestep it and also halve peak RSS.
#
# Usage: bash tools/run_tests.sh [extra pytest args, e.g. -x]
set -e
cd "$(dirname "$0")/.."
H1="tests/test_animate.py tests/test_api.py tests/test_cluster.py \
    tests/test_dense.py tests/test_envmap.py tests/test_features.py \
    tests/test_gltf.py tests/test_golden.py tests/test_integrator.py \
    tests/test_intersect.py"
H2="tests/test_meshlets.py tests/test_multichip.py tests/test_pallas.py \
    tests/test_programs.py tests/test_raster.py tests/test_sahbuild.py \
    tests/test_scene.py tests/test_traverse.py tests/test_wavefront.py"
python -m pytest $H1 -q "$@"
python -m pytest $H2 -q "$@"
