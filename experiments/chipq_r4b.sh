#!/bin/bash
# Round-4 chip queue, part B (after chipq_r4.sh drains): skew A/B on the
# int8 headline, a block-1024 probe, then a fine skip-bisect of the
# headline to re-rank VPU costs.
set -x
cd /root/repo
B=32768
timeout 5400 python experiments/maskbench.py $B 512 8 \
  altparity:512:2:sel:ei8 \
  altparity:512:2:sel:ei8:z1 \
  altparity:512:2:sel:ei8:z3 \
  altparity:512:2:sel:ei8f:z1 \
  altparity:1024:2:sel:ei8:z1 \
  > experiments/skewab_r4.log 2>&1
echo "skewab rc=$?"
# fine bisect at B=8192 (headline tile shape), one skip at a time
for SKIP in "" requant dequant sel assembly shared chosen reorder rescore ext; do
  echo "=== SKIP=$SKIP $(date +%T)" >> experiments/bisect_r4_int8.log
  QTPU_SEQBEAM_SKIP=$SKIP timeout 2400 \
    python experiments/maskbench.py 8192 512 8 altparity:512:2:sel:ei8 \
    >> experiments/bisect_r4_int8.log 2>&1
done
echo "bisect rc=$?"
