#!/bin/bash
# Round-4 chip queue, part D (final): smoke rerun for the promoted z1
# headline program, then an official-pattern bench.py run to verify a
# parsed JSON lands (and leave the cache warm for the driver's run).
set -x
cd /root/repo
QTPU_SMOKE_TIMEOUT=2400 timeout 2460 python experiments/kernel_smoke.py --only seqbeam_int8e_d512 \
  > experiments/smoke_z1_r4.log 2>&1
echo "smoke rc=$?"
timeout 2400 python bench.py > experiments/bench_r4_local.log 2>&1
echo "bench rc=$?"
