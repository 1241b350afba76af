#!/bin/bash
# Round-4 chip queue, part D (final): official-pattern bench.py run first
# (verifies a parsed JSON lands and leaves the cache warm for the
# driver's own run), then the smoke rerun for the promoted z1 headline
# program.
set -x
cd /root/repo
timeout 2400 python bench.py > experiments/bench_r4_local.log 2>&1
echo "bench rc=$?"
QTPU_SMOKE_TIMEOUT=2400 timeout 2460 python experiments/kernel_smoke.py --only seqbeam_int8e_d512 \
  > experiments/smoke_z1_r4.log 2>&1
echo "smoke rc=$?"
