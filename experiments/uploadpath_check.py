"""Host->device upload-path check (round-5 e2e binder).

The round-5 end-to-end CLI encode measured 31-33K vec/s steady-state
while the same kernel measured 766K+ vec/s in maskbench on the same
(verified fast) chip — with pure-XLA cd search giving the SAME e2e rate,
so the binder is the data path, not compute.  Bisect (2026-08-20):

  q.encode(device-resident f16 batch, reused)   53-58 ms = ~600K vec/s
  q.encode(numpy f16 batch)                    672-739 ms = ~45K vec/s
  jax.device_put(SAME buffer repeatedly)         21-70 ms  <- MEASUREMENT
                                                              TRAP: deduped
  jax.device_put(FRESH buffer) + block           878 ms
  device_put + consume + fetch (forced landing) 1042 ms = ~32 MB/s

Conclusion: on the tunneled dev backend the TRANSFER ITSELF runs at
~35-50 MB/s for fresh data; repeated puts of an unchanged buffer are
deduplicated and look ~30x faster, which is how the transfer was first
misattributed to the jnp.asarray committal path.  Streaming encode on
this rig is upload-bandwidth-bound at ~35K vec/s no matter how the
transfer is issued.  The explicit device_put in models/quantizer._put /
train/trainer._put_f32 is kept as transfer hygiene (visible, contiguous,
device-side casts), not as a rig-level fix.  On PCIe-attached TPU hosts
(>10 GB/s) uploads never bind; the reader (~0.4M frames/s/core,
thread-poolable) and the kernel (~0.77M vec/s/chip) are the operative
ceilings.

    python experiments/uploadpath_check.py [B]
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("QUANTIZATION_TPU_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/quantization_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantization_tpu.utils.serialization import load_quantizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
HERE = pathlib.Path(__file__).parent
q = load_quantizer(HERE / "q512_8_full.npz")
xnp = np.random.randn(B, 512).astype(np.float16)

# the measurement trap: repeated put of the SAME unchanged buffer
t0 = time.perf_counter()
for _ in range(3):
    jax.block_until_ready(jax.device_put(xnp))
print(f"device_put SAME buffer x3: {(time.perf_counter()-t0)/3*1e3:.0f} "
      "ms/put (deduplicated - NOT bandwidth)", flush=True)

# true transfer: fresh buffer, forced consume + fetch
s = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
np.asarray(s(jax.device_put(xnp)))  # compile
t0 = time.perf_counter()
for i in range(3):
    fresh = xnp + np.float16(i)
    np.asarray(s(jax.device_put(fresh)))
dt = (time.perf_counter() - t0) / 3
print(f"device_put FRESH + consume + fetch: {dt*1e3:.0f} ms = "
      f"{xnp.nbytes/dt/1e6:.0f} MB/s true upload", flush=True)

xd = jax.device_put(xnp)
jax.block_until_ready(xd)
np.asarray(q.encode(xd, search_method="auto"))  # compile
for name, x in (("device-f16 (reused)", xd), ("numpy-f16 (fresh path)", xnp)):
    t0 = time.perf_counter()
    for _ in range(4):
        codes = q.encode(x, search_method="auto")
    np.asarray(codes)
    dt = (time.perf_counter() - t0) / 4
    print(f"q.encode({name}): {dt*1e3:.0f} ms/batch = "
          f"{B/dt/1e3:.0f}K vec/s", flush=True)
