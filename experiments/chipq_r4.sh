#!/bin/bash
# Round-4 serialized chip queue: (1) second-seed replicate of the hybrid
# trainer at the full d512 schedule (VERDICT r3 item 3 error bar),
# (2) rerun the m16 smoke config that timed out at 1500s.
set -x
cd /root/repo
QTPU_H2H_SIDE=ours QTPU_H2H_SEARCH=seqbeam QTPU_H2H_FT=1000 QTPU_H2H_SEED=1 \
  timeout 4200 python experiments/head_to_head.py 512 8 10000 10000 600 \
  > experiments/h2h_d512_ft1000_seed1.log 2>&1
echo "h2h rc=$?"
QTPU_SMOKE_TIMEOUT=2700 timeout 2760 python experiments/kernel_smoke.py --only seqbeam_m16_d512 \
  > experiments/smoke_m16_r4.log 2>&1
echo "smoke rc=$?"
