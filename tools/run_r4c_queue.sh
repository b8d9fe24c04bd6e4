#!/bin/bash
# Round-4 third serial TPU queue: taller ray tiles (SWEEP=7) for the
# matrix kernel — the cluster-union sweep count falls linearly with
# tile height while sorted-ray unions grow sublinearly — plus an
# envmap bench re-capture (round-3 ledger 104.1 vs 90.2 in
# bench_all_1; decide variance vs regression). Run on a QUIET host.
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/queue_c.log; }

stamp "1/3 probe_tile SWEEP=7 (bs=256/512 coarse groups, worklist+pipe)"
SWEEP=7 timeout 3000 python -u tools/probe_tile.py \
  > out/probe_logs/r4/tile_sweep7.log 2>&1
stamp "1/3 exit=$?"

stamp "2/3 bench envmap (variance check vs 104.1 r3 / 90.2 r4)"
timeout 1500 python -u bench.py envmap \
  > out/probe_logs/r4/bench3_envmap.log 2>&1
stamp "2/3 exit=$?"

stamp "queue_c done"
