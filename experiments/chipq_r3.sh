#!/bin/bash
# Round-3 serialized chip queue: runs once the h2h beam leg (PID $1) exits.
# Order: cheapest/highest-value first.
cd "$(dirname "$0")/.."
LOG=experiments/chipq_r3.log
: > "$LOG"
if [ -n "$1" ]; then
  echo "waiting for pid $1" >> "$LOG"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
echo "=== smoke --only seqbeam_hl_d512 $(date +%H:%M:%S) ===" >> "$LOG"
timeout 1800 python experiments/kernel_smoke.py --only seqbeam_hl_d512 >> "$LOG" 2>&1
echo "=== verify drive: auto encode on chip $(date +%H:%M:%S) ===" >> "$LOG"
timeout 1800 python - >> "$LOG" 2>&1 <<'EOF'
import os, jax, jax.numpy as jnp
if not os.environ.get("QUANTIZATION_TPU_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/quantization_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import quantization_tpu as qt
q = qt.Quantizer(dim=512, codebook_size=256, num_codebooks=8,
                 key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (4096, 512))
codes = q.encode(x)   # auto -> seqbeam sel/ebf16 on TPU
recon = q.decode(codes)
import numpy as np
r = float(jnp.sum((recon - x) ** 2) / jnp.sum(x ** 2))
print("auto-encode rel err on random data:", r)
assert codes.shape == (4096, 8) and codes.dtype == jnp.uint8
assert 0.5 < r < 1.2
print("VERIFY DRIVE OK")
EOF
echo "=== d256 quality incl sel/ebf16 $(date +%H:%M:%S) ===" >> "$LOG"
timeout 2400 python experiments/kernel_quality.py 256 4 >> "$LOG" 2>&1
echo "=== d256 speed A/B sel/ebf16 $(date +%H:%M:%S) ===" >> "$LOG"
timeout 1800 python experiments/maskbench.py 8192 256 4 \
  altparity:256:2:p2 altparity:256:2:p2:sel:ebf >> "$LOG" 2>&1
echo "=== bench.py validation $(date +%H:%M:%S) ===" >> "$LOG"
timeout 5400 python bench.py >> "$LOG" 2>&1
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
