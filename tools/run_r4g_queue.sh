#!/bin/bash
# Round-4 queue G: flat SMEM-entry drain A/B + tile_size to the limit.
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/queue_g.log; }

stamp "1/4 sweep10 flat drain A/B at bs=512"
SWEEP=10 timeout 3000 python -u tools/probe_tile.py \
  > out/probe_logs/r4/tile_sweep10.log 2>&1
stamp "1/4 exit=$?"

stamp "2/4 breakdown TILE=1048576"
TILE=1048576 timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown_tile1m.log 2>&1
stamp "2/4 exit=$?"

stamp "3/4 breakdown TILE=2097152 (whole frame, one tile)"
TILE=2097152 timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown_tile2m.log 2>&1
stamp "3/4 exit=$?"

stamp "4/4 bench ggx re-check (new defaults)"
timeout 1500 python bench.py ggx \
  > out/probe_logs/r4/bench_ggx2.log 2>&1
stamp "4/4 exit=$?"

stamp "queue_g done"
