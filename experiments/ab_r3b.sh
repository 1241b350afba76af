#!/bin/bash
# Round-3 trimmed A/B matrix, value-ordered for a ~2h chip budget (the
# full ab_r3.sh matrix does not fit round-3's remaining wall clock with
# compiles at 5-20 min each).  Each maskbench invocation compiles + times
# one config at B=8192; results append to experiments/ab_r3b.log.
#
# Value order:
#  1. select-tree reorder + bf16 E on the shipped headline (reorder is the
#     largest single cost in the round-2 bisect: ~6.3ms of 22ms)
#  2. cross_value phase-zip (the VERDICT item-5 overlap hypothesis: hand
#     the rescore matmul to ph1 as an SSA value so Mosaic's memory
#     disambiguation cannot serialize independent sub-tiles' phases)
#  3. combined
#  4. gramv3-int8 block/interleave tuning (bench measured 478K at 256:2)
#  5. M16 2-pass with cheap reorder (real-chip quality +0.74%, in-bar)
#  6. dim=256 flagship variants
cd "$(dirname "$0")/.."
LOG=experiments/ab_r3b.log
: > "$LOG"
run() {
  echo "=== d512 $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 1800 python experiments/maskbench.py 8192 512 8 "$@" >> "$LOG" 2>&1
}
run256() {
  echo "=== d256 $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 1800 python experiments/maskbench.py 8192 256 4 "$@" >> "$LOG" 2>&1
}
run altparity:256:2 altparity:256:2:sel:ebf
run altparity:256:2:xv altparity:256:2:xv:sel:ebf
run allpool:256:2:v3i8 allpool:128:1:v3i8 allpool:128:2:v3i8
run allpool:256:1:sel:ebf:m16:p2 allpool:256:2:sel:ebf:m16:p2
run256 altparity:256:2:p2 allpool:256:1:v3i8:p2 allpool:256:1:sel:ebf:m16:p1
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
