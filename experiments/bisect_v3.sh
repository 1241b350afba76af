#!/bin/bash
# Cost bisect of the current best kernel config (altparity:256:2) via
# QTPU_SEQBEAM_SKIP.  Results are WRONG with any skip active - timing only.
cd "$(dirname "$0")/.."
for skip in "" reorder sel assembly chosen ext shared rescore; do
  echo "=== SKIP=$skip"
  QTPU_SEQBEAM_SKIP="$skip" timeout 900 python experiments/maskbench.py \
    8192 512 8 altparity:256:2 2>/dev/null | grep altparity
done
