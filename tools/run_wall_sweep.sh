#!/bin/bash
# Wavefront compile-wall bisect (round-4). One probe_wall.py config per
# process; a compiler hang costs only its own timeout slot.
#
# Established so far (out/probe_logs/r4/wall_*.log):
#   - lowering is seconds once geometry is a jit ARGUMENT (closure
#     capture inlines the scene as constants: 680 s of fake "lowering")
#   - the full composition under an OUTER jit does not compile in 880 s
#     even at C=369 — the wall is composition/inlining, not cluster
#     count (round-3 "cluster scaling" reading was wrong)
# This sweep isolates WHICH sub-structure owns it and whether the
# own-jit form (how the round-3 standalone probes ran) escapes.
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

# Which sub-structure owns the outer-jit wall at 369?
run wfnf_c369 900 CLUSTERS=369 K=16 PART=wfnf
run cull_c369 900 CLUSTERS=369 K=16 PART=cull
run mq_c369   900 CLUSTERS=369 K=16 PART=mq

# Does the own-jit form escape, and does IT scale to 1861?
run wfown_c369  900 CLUSTERS=369  K=16 PART=wfown
run wfown_c1861 1200 CLUSTERS=1861 K=16 PART=wfown

# If wfnf compiled: the fallback cond is the wall. If not: the pair is.
# Either way check K=8 (the measured 15.5 ms shadow config).
run wfown_c1861_k8 1200 CLUSTERS=1861 K=8 PART=wfown

stamp "wall sweep done"
