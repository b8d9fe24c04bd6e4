#!/bin/bash
# Wavefront compile-wall bisect (round-4). One probe_wall.py config per
# process; a compiler hang costs only its own timeout slot.
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs/r4
stamp() { date +"%F %T $*" | tee -a out/probe_logs/r4/wall_queue.log; }

run() {  # run NAME TIMEOUT ENV...
  local name=$1 tmo=$2; shift 2
  stamp "wall $name start"
  env "$@" timeout "$tmo" python -u tools/probe_wall.py \
    > "out/probe_logs/r4/wall_$name.log" 2>&1
  stamp "wall $name exit=$?"
}

# NOTE: host-side tracing of intersect_wavefront alone takes minutes
# under load (439s observed while the CPU test suite ran); run this on
# a QUIET host and budget the timeout for trace + compile.

# 1. Where does the full composition start hanging? (known: 369 ok,
#    1861 hangs >29min — cap at 15 min: past that it IS the wall)
run wf_c369  900 CLUSTERS=369  K=16 PART=wf
run wf_c741  900 CLUSTERS=741  K=16 PART=wf
run wf_c1113 900 CLUSTERS=1113 K=16 PART=wf
run wf_c1861 900 CLUSTERS=1861 K=16 PART=wf

# 2. Which sub-kernel owns it at 1861? (each alone)
run cull_c1861 900 CLUSTERS=1861 K=16 PART=cull
run mq_c1861   900 CLUSTERS=1861 K=16 PART=mq
run wfnf_c1861 900 CLUSTERS=1861 K=16 PART=wfnf

# 3. Does K matter? (the cull unrolls K extraction passes)
run wf_c1861_k8 900 CLUSTERS=1861 K=8 PART=wf

stamp "wall sweep done"
