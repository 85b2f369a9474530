#!/bin/sh
# p1-crash bisect round 2. Round-1 results (/tmp/p1_driver.log):
#   S1 p1+pallas b32 fp32    -> CRASH (4th reproduction)
#   S2 p1+oracle (no pallas) -> OK (100 ms? no—100s total incl. first exec)
#   S3 p1 parity-0 control   -> (see log)
# So the fault needs the Pallas kernels inside the fused p1 program.
# This round isolates which variant:
#   S4 compact disabled (padded per-tile kernels)  -> compact implicated?
#   S5 compact with ipg=2 (the shape validated at 02:55 refresh)
#   S6 split-step mode (practical mitigation: two smaller programs)
set -u
cd /root/repo
LOG=/tmp/p1_driver2.log
probe() {
  i=0
  while [ $i -lt 12 ]; do
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
  name=$1; shift
  echo "=== stage $name $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2700 env "$@" python tools/tpu_p1_stage.py "$name" >> "$LOG" 2>&1
  echo "=== stage $name exit=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

echo "driver2 start $(date -u +%H:%M:%S)" > "$LOG"
probe || { echo "worker never recovered" >> "$LOG"; exit 1; }
run_stage S6_p1_split SMIRK_STEP_MODE=split
probe || exit 1
run_stage S4_p1_nocompact SMIRK_RASTER_COMPACT=0
probe || exit 1
run_stage S5_p1_ipg2 SMIRK_RASTER_IPG=2
echo "driver2 done $(date -u +%H:%M:%S)" >> "$LOG"
