#!/bin/bash
# Round-4 queue F: visit decomposition + frame tile_size sweep + envmap
# re-measure (16-frame window) — serialized on the one axon TPU.
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/queue_f.log; }

stamp "1/4 probe_visits bs=512 (morton vs signature, us/visit)"
timeout 1800 python -u tools/probe_visits.py \
  > out/probe_logs/r4/visits_bs512.log 2>&1
stamp "1/4 exit=$?"

stamp "2/4 breakdown TILE=262144"
TILE=262144 timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown_tile262k.log 2>&1
stamp "2/4 exit=$?"

stamp "3/4 breakdown TILE=524288"
TILE=524288 timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown_tile524k.log 2>&1
stamp "3/4 exit=$?"

stamp "4/4 bench envmap (16-frame window)"
timeout 1500 python bench.py envmap \
  > out/probe_logs/r4/bench_envmap16.log 2>&1
stamp "4/4 exit=$?"

stamp "queue_f done"

stamp "5/6 subs=2 fine clusters at champion"
SWEEP=9 SUBS=2 timeout 1500 python -u tools/probe_tile.py \
  > out/probe_logs/r4/tile_subs2.log 2>&1
stamp "5/6 exit=$?"

stamp "6/6 subs=4 fine clusters at champion"
SWEEP=9 SUBS=4 timeout 1500 python -u tools/probe_tile.py \
  > out/probe_logs/r4/tile_subs4.log 2>&1
stamp "6/6 exit=$?"

stamp "queue_f extension done"
