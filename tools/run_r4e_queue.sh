#!/bin/bash
# Round-4 frame-level wavefront re-measure after the sort->gather
# rework broke the compile wall (wall2_* logs: wf K=16 C=369 63.6s vs
# >880s hang; wfown K=16 C=1861 closest 85.4 ms vs matrix 107.7).
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/queue_e.log; }

stamp "1/5 wfown K16 AH1 C1861 (shadow-class steady)"
K=16 PART=wfown AH=1 timeout 1200 python -u tools/probe_wall.py \
  > out/probe_logs/r4/wall2_wfown_c1861_k16_ah.log 2>&1
stamp "1/5 exit=$?"

stamp "2/5 wfown K16 M64 AH0 C1861 (closest, bigger merge cap)"
K=16 M=64 PART=wfown AH=0 timeout 1200 python -u tools/probe_wall.py \
  > out/probe_logs/r4/wall2_wfown_c1861_k16_m64.log 2>&1
stamp "2/5 exit=$?"

stamp "3/5 breakdown matrix control (new worklist+pipe+bs512 defaults)"
SHADOW=matrix timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown2_matrix.log 2>&1
stamp "3/5 exit=$?"

stamp "4/5 breakdown shadow+extend wavefront K=16"
SHADOW=wavefront SK=16 EXTEND=wavefront EK=16 timeout 3000 \
  python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown2_wf16.log 2>&1
stamp "4/5 exit=$?"

stamp "5/5 breakdown shadow wavefront only K=16 (extend matrix)"
SHADOW=wavefront SK=16 timeout 3000 python -u tools/probe_breakdown.py \
  > out/probe_logs/r4/breakdown2_wfsh16.log 2>&1
stamp "5/5 exit=$?"

stamp "queue_e done"
