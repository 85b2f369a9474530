#!/bin/sh
# p1-crash bisect round 3 (see tools/tpu_p1_stage2.py docstring).
set -u
cd /root/repo
LOG=/tmp/p1_driver3.log
probe() {
  i=0
  while [ $i -lt 15 ]; do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))
print('probe ok', float(x))" >> "$LOG" 2>&1; then
      return 0
    fi
    echo "probe attempt $i failed; sleeping 120s" >> "$LOG"
    sleep 120
    i=$((i+1))
  done
  return 1
}

run_stage() {
  echo "=== stage $1 $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2700 python tools/tpu_p1_stage2.py "$1" >> "$LOG" 2>&1
  echo "=== stage $1 exit=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

echo "driver3 start $(date -u +%H:%M:%S)" > "$LOG"
probe || { echo "worker never recovered" >> "$LOG"; exit 1; }
run_stage R1
probe || exit 1
run_stage R2
probe || exit 1
run_stage R3
echo "driver3 done $(date -u +%H:%M:%S)" >> "$LOG"
