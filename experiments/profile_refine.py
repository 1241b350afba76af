"""Sub-op timing of one refine pass on the real chip.

Timing methodology: each op is wrapped in its own jit; completion is fenced
by fetching the (reduced-to-small) output to host.  Inputs are regenerated
per rep to defeat any platform-side result caching.
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from quantization_tpu import core
from quantization_tpu.core import precision as _prec

B = 8192
config = core.QuantizerConfig(dim=512, codebook_size=256, num_codebooks=8)
params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
centers = jax.jit(lambda p: core.scaled_centers(p, config.scale_speed))(params)
nc, cs, dim = 8, 256, 512


def bench(name, fn, make_args, n=2):
    # warmup
    a = make_args(0)
    np.asarray(jax.jit(fn)(*a)).ravel()[:1]
    f = jax.jit(fn)
    ts = []
    for i in range(1, n + 1):
        a = make_args(i)
        for x in a:
            x.block_until_ready()
        t0 = time.perf_counter()
        out = f(*a)
        np.asarray(out).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {1000*min(ts):8.2f} ms")


def rand(i, shape, dtype=jnp.float32):
    if dtype == jnp.int32:
        return jax.random.randint(jax.random.PRNGKey(i * 7 + 1), shape, 0, cs, dtype)
    return jax.random.normal(jax.random.PRNGKey(i * 7 + 2), shape, dtype)


# 0. baseline: trivial op to estimate fence overhead
bench("fence overhead (x[:1,:1]+1)", lambda x: x[:1, :1] + 1.0,
      lambda i: (rand(i, (B, dim)),))

# 1. logits matmul
bench("logits (B,512)x(512,2048)",
      lambda x: (jnp.dot(x, params.to_logits_w.T, preferred_element_type=jnp.float32)).sum(0)[:8],
      lambda i: (rand(i, (B, dim)),))

# 2. old_centers gather (B,nc,dim)
bench("gather old_centers (B,8,512)",
      lambda idx: centers[jnp.arange(nc)[None, :], idx].sum(axis=(0, 1))[:8],
      lambda i: (rand(i, (B, nc), jnp.int32),))

# 2b. one-hot matmul equivalent
bench("onehot-matmul old_centers",
      lambda idx: jnp.einsum("bnk,nkd->bd", jax.nn.one_hot(idx, cs, dtype=jnp.float32), centers,
                             preferred_element_type=jnp.float32).sum(0)[:8],
      lambda i: (rand(i, (B, nc), jnp.int32),))

# 3. cross einsum bnd,nkd->bnk
bench("cross einsum (B,8,512)x(8,256,512)",
      lambda xr: jnp.einsum("bnd,nkd->bnk", xr, centers, preferred_element_type=jnp.float32).sum(0).ravel()[:8],
      lambda i: (rand(i, (B, nc, dim)),))

# 4. top_k 256->16 over (B,8,256)
bench("top_k (B,8,256)->16",
      lambda s: jax.lax.top_k(s, 16)[0].sum(0).ravel()[:8],
      lambda i: (rand(i, (B, nc, cs)),))

# 4b. top_k 1024->1 (final stage) == argmax
bench("top_k (B,1,1024)->1",
      lambda s: jax.lax.top_k(s, 1)[0].sum(0).ravel()[:1],
      lambda i: (rand(i, (B, 1, 1024)),))

# 4c. sort-based alternative
bench("argmax (B,1,1024)",
      lambda s: jnp.argmax(s, -1).sum(0).ravel()[:1],
      lambda i: (rand(i, (B, 1, 1024)),))

# 5. gather deltas (B,8,16,512) via fancy index
bench("gather deltas (B,8,16,512)",
      lambda sel: (centers[jnp.arange(nc)[None, :, None], sel]).sum(axis=(0, 1, 2))[:8],
      lambda i: (jax.random.randint(jax.random.PRNGKey(i), (B, nc, 16), 0, cs),))

# 6. combine einsum bnkd,bnjd->bnkj at (B,4,16,512)
bench("combine einsum (B,4,16,512)^2->16x16",
      lambda e, o: jnp.einsum("bnkd,bnjd->bnkj", e, o, preferred_element_type=jnp.float32).sum(0).ravel()[:8],
      lambda i: (rand(i, (B, 4, 16, dim)), rand(i + 100, (B, 4, 16, dim))))

# 7. take_along_axis cur_indexes (B,8,256,1) -> (B,8,16,1)
bench("take_along_axis idx (B,8,256,1)->16",
      lambda ci, sel: jnp.take_along_axis(ci, sel[..., None], axis=2).sum(axis=(0, 1, 2))[:1],
      lambda i: (jax.random.randint(jax.random.PRNGKey(i), (B, nc, cs, 1), 0, cs),
                 jax.random.randint(jax.random.PRNGKey(i + 1), (B, nc, 16), 0, cs)))

# 8. one full refine pass for reference
bench("FULL refine pass",
      lambda x, idx: core.refine_indexes(centers, x, idx).sum(0)[:8],
      lambda i: (rand(i, (B, dim)), rand(i, (B, nc), jnp.int32)))

# 9. full encode5
bench("FULL encode5",
      lambda x: core.encode(params, config, x, refine_indexes_iters=5).sum(0)[:8],
      lambda i: (rand(i, (B, dim)),))
