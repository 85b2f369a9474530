#!/bin/sh
# Staged bisect of the parity-1 train-step TPU crash. Each stage runs in
# its own process (a worker crash poisons the client); between stages we
# wait for the worker to answer a trivial probe (it can take many minutes
# to come back after a crash). One TPU process at a time, always.
set -u
cd /root/repo
LOG=/tmp/p1_driver.log
probe() {
  # retry the trivial matmul until the worker answers (max ~40 min)
  i=0
  while [ $i -lt 10 ]; do
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
  echo "=== stage $* $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 2400 python tools/tpu_p1_stage.py "$@" >> "$LOG" 2>&1
  echo "=== stage $1 exit=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

echo "driver start $(date -u +%H:%M:%S)" > "$LOG"
probe || { echo "worker never recovered" >> "$LOG"; exit 1; }

# S1: exact repro (pallas, parity 1). Expected: crash (3 prior failures).
run_stage S1_p1_pallas
probe || exit 1

# S2: same program shape with the jnp oracle raster — no Pallas kernels.
# Runs fine -> fault involves the Pallas kernels after all; crashes ->
# plain-XLA/worker-side problem.
run_stage S2_p1_oracle --no-pallas
probe || exit 1

# S3: parity-0 control in a fresh process (known-good inside the CLI run).
run_stage S3_p0_pallas --parity 0
echo "driver done $(date -u +%H:%M:%S)" >> "$LOG"
