import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from quantization_tpu import core
from quantization_tpu.core import precision as prec

def timeit(fn, *args, n=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # full sync incl. transfer of 1 leaf
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        ts.append(time.perf_counter()-t0)
    return min(ts)

config = core.QuantizerConfig(dim=512, codebook_size=256, num_codebooks=8)
params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
B = 1 << 13
x = jax.random.normal(jax.random.PRNGKey(1), (B, 512))

ident = jax.jit(lambda x: x[:1,:1] + 1.0)
print("dispatch+sync overhead: %.2f ms" % (1000*timeit(ident, x)))

# reduce output size for honest timing: sum outputs
logits_fn = jax.jit(lambda p, x: core.compute_logits(p, config, x).sum())
print("logits matmul(+sum): %.2f ms" % (1000*timeit(logits_fn, params, x)))

centers = core.scaled_centers(params, config.scale_speed)
idx0 = jax.jit(lambda p,x: jnp.argmax(core.compute_logits(p, config, x), -1).astype(jnp.int32))(params, x)
refine1 = jax.jit(lambda c, x, i: core.refine_indexes(c, x, i).sum())
print("1 refine pass: %.2f ms" % (1000*timeit(refine1, centers, x, idx0)))

enc = jax.jit(lambda p, x: core.encode(params=p, config=config, x=x, refine_indexes_iters=5))
t = timeit(enc, params, x)
print("encode5 HIGHEST: %.2f ms -> %.3f M vec/s" % (1000*t, B/t/1e6))

prec.set_matmul_precision('default')
import importlib
enc2 = jax.jit(lambda p, x: core.encode(params=p, config=config, x=x, refine_indexes_iters=5) + 0)
t = timeit(enc2, params, x)
print("encode5 DEFAULT: %.2f ms -> %.3f M vec/s" % (1000*t, B/t/1e6))
prec.set_matmul_precision('highest')

codes = enc(params, x)
dec = jax.jit(lambda p, c: core.decode(p, config, c).sum())
t = timeit(dec, params, codes)
print("decode: %.2f ms -> %.2f M vec/s" % (1000*t, B/t/1e6))
