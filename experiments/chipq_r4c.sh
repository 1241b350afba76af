#!/bin/bash
# Round-4 chip queue, part C: fast-init A/B (d512), int8-E A/B at the d256
# flagship, and the fi quality-guard measurement.
set -x
cd /root/repo
B=32768
timeout 7200 python experiments/maskbench.py $B 512 8 \
  altparity:512:2:sel:ei8:fi:z1 \
  altparity:512:2:sel:ei8b:z1 \
  altparity:512:2:sel:ei8b:fi:z1 \
  > experiments/fiab_r4.log 2>&1
echo "fiab rc=$?"
timeout 3600 python experiments/quality_guard.py 512 8 \
  > experiments/quality_guard_r4.log 2>&1
echo "qguard rc=$?"
# (d256 int8-E speed A/B deferred to round 5: compiles are 15-16 min/leg
# this round and the d512 promotion + official bench take priority; the
# d256 config is already smoke- and quality-gated, only speed is unmeasured)
