#!/bin/bash
# Round-3 queued TPU measurements (PLAN.md "late-session additions").
# Run when the axon tunnel is up:  bash tools/run_queued_probes.sh
# Each step is bounded and logs to out/probe_logs/<step>.log so a hang
# or crash cannot eat the rest of the queue.
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs
stamp() { date +"%F %T $*" | tee -a out/probe_logs/queue.log; }

stamp "1/6 probe_tile SWEEP=5 (pipelined ping-pong vs batch-2 vs branch)"
SWEEP=5 timeout 3000 python -u tools/probe_tile.py \
  > out/probe_logs/tile_sweep5.log 2>&1
stamp "1/6 exit=$?"

stamp "2/6 probe_spp (sample-adjacent spp at Sponza scale)"
SPPS=1,16 timeout 3600 python -u tools/probe_spp.py \
  > out/probe_logs/spp.log 2>&1
stamp "2/6 exit=$?"

stamp "3/6 probe_raster (exact segment kernel vs capped table, 1080p)"
timeout 3000 python -u tools/probe_raster.py \
  > out/probe_logs/raster.log 2>&1
stamp "3/6 exit=$?"

stamp "4/6 probe_staged matrix modes (compile + frame time)"
MODES=mega_matrix,staged_matrix timeout 3000 python -u tools/probe_staged.py \
  > out/probe_logs/staged_matrix.log 2>&1
stamp "4/6 exit=$?"

stamp "5/6 probe_staged wavefront shadows (may hit the compile wall)"
MODES=staged_wf timeout 3000 python -u tools/probe_staged.py \
  > out/probe_logs/staged_wf.log 2>&1
stamp "5/6 exit=$?"

stamp "6/6 probe_staged wavefront closest+shadows"
MODES=staged_wf_all timeout 3000 python -u tools/probe_staged.py \
  > out/probe_logs/staged_wf_all.log 2>&1
stamp "6/6 exit=$?"

stamp "6b/7 per-stage breakdown of the sponza frame (round-4 targets)"
SHADOW=auto timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/breakdown_matrix.log 2>&1
stamp "6b exit=$?"
SHADOW=wavefront timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/breakdown_wf.log 2>&1
stamp "6c exit=$?"

stamp "7/7 full bench (warms the XLA cache for the driver's run)"
timeout 5400 python -u bench.py > out/probe_logs/bench_all.log 2>&1
stamp "7/7 exit=$?"

stamp "queue done"
