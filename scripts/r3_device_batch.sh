#!/bin/bash
# Round-3 on-device measurement batch. Run with an idle CPU (the relay
# compile path is sensitive to host load). Each step logs + survives the
# previous one failing. Re-runnable.
set -u
cd "$(dirname "$0")/.."
LOG=out/r3_device_batch.log
mkdir -p out
echo "=== batch start $(date +%H:%M:%S) ===" | tee -a $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date +%H:%M:%S)" | tee -a $LOG
  timeout "$@" >> $LOG 2>&1
  echo "--- $name rc=$? end $(date +%H:%M:%S)" | tee -a $LOG
}

# 1. device smoke incl. zero-region kernel parity + perf budget seed
run smoke 2400 env PERF_REBASELINE=1 python scripts/tpu_smoke.py
# 2. per-tier kernel numbers (zero-region effect vs r1 docs)
run kernel_bench 2400 python scripts/kernel_bench.py --slab
# 3. fresh headline with the zero-region kernel
run bench 1200 env BENCH_HARD_S=1000 python bench.py
# 4. sustained end-to-end rows (sync + async), then the report
run e2e_sync 3000 python tools/measure_reference.py ours-tpu-e2e \
    --scenes icra rm willow --max-scans 150
run e2e_async 3000 python tools/measure_reference.py ours-tpu-e2e \
    --async-backend --scenes icra rm willow --max-scans 150
run report 300 python tools/measure_reference.py report
echo "=== batch done $(date +%H:%M:%S) ===" | tee -a $LOG
