#!/bin/bash
# Round-4 second serial TPU queue: frame-level wavefront-shadow
# measurement (the K=8 own-jit route that survived the compile wall),
# then bench re-measures. Run on a QUIET host.
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/queue_b.log; }

stamp "1/4 probe_breakdown SHADOW=matrix (baseline decomposition)"
SHADOW=matrix timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown_matrix.log 2>&1
stamp "1/4 exit=$?"

stamp "2/4 probe_breakdown SHADOW=wavefront (own-jit K=8 route)"
SHADOW=wavefront timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown_wavefront.log 2>&1
stamp "2/4 exit=$?"

stamp "3/4 bench sponza16 (staged; picks up current shadow route)"
timeout 3000 python -u bench.py sponza16 \
  > out/probe_logs/r4/bench2_sponza16.log 2>&1
stamp "3/4 exit=$?"

stamp "4/4 bench sponza (1 spp)"
timeout 2400 python -u bench.py sponza \
  > out/probe_logs/r4/bench2_sponza.log 2>&1
stamp "4/4 exit=$?"

stamp "queue_b done"
