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
# (bisect dropped: remote compiles run 15-16 min/leg this round — 10 legs
# would consume the rest of the round; the skew/bound/fi A/Bs in part C
# target the known top costs directly)
