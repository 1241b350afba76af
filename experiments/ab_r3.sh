#!/bin/bash
# Round-3 reorder/e_dtype/M16 A/B matrix on the real chip, in value order.
# Each maskbench invocation compiles + times one config; compiles through
# the remote helper are erratic (1-7 min), so everything logs to
# experiments/ab_r3.log and keeps going on failure.
cd "$(dirname "$0")/.."
LOG=experiments/ab_r3.log
: > "$LOG"
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 1500 python experiments/maskbench.py 8192 512 8 "$@" >> "$LOG" 2>&1
}
# 0. v3 Gram-table kernel (ops/gramv3.py): the no-E-buffer candidate.
#    Quality screened: bf16 allpool +0.86%, int8 global-scale +0.95%
#    (gramscore_quality_d512_b8.json).  int8 first — it's the 2x-MXU path.
run allpool:128:1:v3i8 allpool:128:1:v3 allpool:256:1:v3i8
run allpool:128:2:v3i8 allpool:256:2:v3i8
# 1. reorder A/B at the current default config (M8R4p3 altparity)
run altparity:128:1 altparity:128:1:sel altparity:128:1:wsel
# 2. bf16 E on the select variants (halved reorder/extension traffic)
run altparity:128:1:sel:ebf altparity:128:1:wsel:ebf
# 3. M16R4p2 full-pool (kernel quality already measured +0.74%, in-bar):
#    gather was reorder-bound at M16; select trees may flip the verdict
run allpool:128:1:m16:p2 allpool:128:1:sel:m16:p2 allpool:128:1:sel:ebf:m16:p2
run allpool:128:1:sel:ebf:m16:r2:p2
# 3b. sim-screened 2-pass pool configs (experiments/sim_pool_quality.py:
#     allpool M16R2p2 +0.90%, M32R2p2 +0.67%, M16R8p2 +0.73% vs beam-5)
run allpool:128:1:sel:ebf:m32:r2:p2 allpool:128:1:ebf:m32:r2:p2
run alllast:128:1:sel:ebf:m32:r2:p2 alllast:128:1:sel:ebf:m16:r4:p2
# 4. phase-zip overlap with cross_value on the best sel config
run altparity:128:2:xv:sel:ebf altparity:128:2:xv
# 5. production-form confirmation (the auto config ships block_b=256,
#    interleave=2): candidate winners in that form
run altparity:256:2 altparity:256:2:sel:ebf altparity:256:2:xv:sel:ebf
# 6. dim=256/4B flagship: sim-screened (sim_pool_quality.py) allpool
#    M32R4p1 +0.53% / M32R2p2 +0.16% / M16R2p2 +0.34% vs the shipped
#    2-pass altparity M8R4 +0.69%; single-pass halves the fixed costs
run256() {
  echo "=== d256 $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 1500 python experiments/maskbench.py 8192 256 4 "$@" >> "$LOG" 2>&1
}
run256 allpool:128:1:v3i8:p2 altparity:256:2:p2 \
       allpool:128:1:sel:ebf:m32:r4:p1 \
       allpool:128:1:sel:ebf:m32:r2:p2 allpool:128:1:sel:ebf:m16:r2:p2
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
