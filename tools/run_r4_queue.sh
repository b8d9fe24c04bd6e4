#!/bin/bash
# Round-4 serial TPU queue (run on a QUIET host — bench timings are
# host-dispatch sensitive, and tracing shares the host CPU).
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/queue.log; }

stamp "1/5 wall sweep (wavefront compile-wall bisect)"
bash tools/run_wall_sweep.sh
stamp "1/5 done"

stamp "2/5 probe_tile SWEEP=5 (pipelined / batch-2/4 worklist visits)"
SWEEP=5 timeout 3600 python -u tools/probe_tile.py \
  > out/probe_logs/r4/tile_sweep5.log 2>&1
stamp "2/5 exit=$?"

stamp "3/5 probe_breakdown (per-stage sponza frame decomposition)"
SHADOW=auto timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown.log 2>&1
stamp "3/5 exit=$?"

stamp "4/5 bench re-measure: cornell envmap raster (fixed bands, quiet)"
for c in cornell envmap raster; do
  timeout 2400 python -u bench.py "$c" \
    > "out/probe_logs/r4/bench2_$c.log" 2>&1
  stamp "4/5 $c exit=$?"
done

stamp "5/5 bench sponza16 warm-cache cold-start timing"
timeout 3000 python -u bench.py sponza16 \
  > out/probe_logs/r4/bench2_sponza16.log 2>&1
stamp "5/5 exit=$?"

stamp "queue done"
