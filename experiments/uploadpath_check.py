"""Host->device upload-path check (round-5 e2e binder).

The round-5 end-to-end CLI encode measured 32.4K vec/s steady-state while
the same kernel measured 766K vec/s in maskbench on the same (verified
fast) chip.  Bisect (2026-08-20, this session's logs):

  jax.device_put(np f16 32MB)          21 ms  (~1.5 GB/s)   <- fast path
  q.encode(device f16 array)           53 ms/batch = 618K vec/s
  q.encode(numpy f16 array)           672 ms/batch =  49K vec/s

i.e. committing a multi-MB NUMPY array through the dispatch path
(jnp.asarray + jit arg committal) runs at ~51 MB/s on the tunneled
backend — 30x slower than an explicit jax.device_put of the same buffer.
Fix: models/quantizer._put and train/trainer._put_f32 device_put host
arrays explicitly before dispatch.

This script re-measures all three legs so the fix stays verifiable:

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

t0 = time.perf_counter()
xd = jax.device_put(xnp)
jax.block_until_ready(xd)
print(f"device_put f16 {xnp.nbytes >> 20} MB: "
      f"{(time.perf_counter() - t0) * 1e3:.0f} ms", flush=True)

np.asarray(q.encode(xd, search_method="auto"))  # compile
for name, x in (("device-f16", xd), ("numpy-f16", xnp)):
    t0 = time.perf_counter()
    for _ in range(4):
        codes = q.encode(x, search_method="auto")
    np.asarray(codes)
    dt = (time.perf_counter() - t0) / 4
    print(f"q.encode({name}): {dt * 1e3:.0f} ms/batch = "
          f"{B / dt / 1e3:.0f}K vec/s", flush=True)
