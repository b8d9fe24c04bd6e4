#!/bin/bash
# Round-4 queue H: finish the frame tile_size ladder (1M / 2M staged
# breakdowns were interrupted), then megakernel sponza bench at the
# current ladder champion (524k), plus the never-run ggx re-check.
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/queue_h.log; }

stamp "1/4 breakdown TILE=1048576"
TILE=1048576 timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown_tile1m.log 2>&1
stamp "1/4 exit=$?"

stamp "2/4 breakdown TILE=2097152 (whole frame, one tile)"
TILE=2097152 timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown_tile2m.log 2>&1
stamp "2/4 exit=$?"

stamp "3/4 bench sponza megakernel SPONZA_TILE=524288"
SPONZA_TILE=524288 timeout 1800 python bench.py sponza \
  > out/probe_logs/r4/bench_sponza_tile524k.log 2>&1
stamp "3/4 exit=$?"

stamp "4/4 bench ggx re-check"
timeout 1500 python bench.py ggx \
  > out/probe_logs/r4/bench_ggx2.log 2>&1
stamp "4/4 exit=$?"

stamp "queue_h done"
