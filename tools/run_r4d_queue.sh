#!/bin/bash
# Round-4 wall re-bisect after the wavefront sort->gather rework
# (plain variadic sorts compile in ~13s at any operand count —
# out/probe_logs/r4/sortwall.log — so the K-scaling wall must live in
# the composition; these runs isolate glue vs walker vs fallback).
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/queue_d.log; }

stamp "1/4 glue K=16 C=369"
CLUSTERS=369 K=16 PART=glue timeout 900 python -u tools/probe_wall.py \
  > out/probe_logs/r4/wall2_glue_c369_k16.log 2>&1
stamp "1/4 exit=$?"

stamp "2/4 wfnf K=16 C=369 (old sort measured 398s)"
CLUSTERS=369 K=16 PART=wfnf timeout 900 python -u tools/probe_wall.py \
  > out/probe_logs/r4/wall2_wfnf_c369_k16.log 2>&1
stamp "2/4 exit=$?"

stamp "3/4 wf K=16 C=369 (old sort hung >880s)"
CLUSTERS=369 K=16 PART=wf timeout 1500 python -u tools/probe_wall.py \
  > out/probe_logs/r4/wall2_wf_c369_k16.log 2>&1
stamp "3/4 exit=$?"

stamp "4/4 wfown K=16 C=1861 closest (the frame shape that matters)"
K=16 PART=wfown AH=0 timeout 1800 python -u tools/probe_wall.py \
  > out/probe_logs/r4/wall2_wfown_c1861_k16.log 2>&1
stamp "4/4 exit=$?"

stamp "queue_d done"
