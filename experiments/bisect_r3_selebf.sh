#!/bin/bash
# Cost bisect of the SHIPPED round-3 config (altparity:256:2:sel:ebf) via
# QTPU_SEQBEAM_SKIP.  Results are WRONG with any skip active - timing only.
# Informs the round-4 int8-E plan (NOTES_ROUND4.md item 3a): how much of
# the 15.1 ms/8K is reorder/extension traffic vs rescore MXU vs selection.
cd "$(dirname "$0")/.."
LOG=experiments/bisect_r3_selebf.log
: > "$LOG"
# trimmed to the pieces the int8-E plan would change (full 8-way bisect of
# the gather/f32 config is in NOTES_ROUND3.md)
for skip in "" reorder rescore ext; do
  echo "=== SKIP=$skip $(date +%H:%M:%S)" >> "$LOG"
  QTPU_SEQBEAM_SKIP="$skip" timeout 2100 python experiments/maskbench.py \
    8192 512 8 altparity:256:2:sel:ebf 2>/dev/null | grep altparity >> "$LOG"
done
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
