#!/bin/bash
# Poll the axon TPU tunnel; when a trivial jit succeeds, run the queued
# round-3 probe measurements (tools/run_queued_probes.sh) immediately.
# Usage: bash tools/tpu_watch.sh   (run in background; exits after queue)
cd "$(dirname "$0")/.."
mkdir -p out/probe_logs
while true; do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a*2)(jnp.ones((8,128)))
assert float(x.sum()) == 2048.0
print('TPU OK', jax.devices())
" > /tmp/tpu_ping.log 2>&1; then
    echo "$(date) tunnel up — starting probe queue" >> out/probe_logs/watch.log
    bash tools/run_queued_probes.sh
    echo "$(date) probe queue finished" >> out/probe_logs/watch.log
    exit 0
  fi
  echo "$(date) tunnel down" >> out/probe_logs/watch.log
  sleep 240
done
