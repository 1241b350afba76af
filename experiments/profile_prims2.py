"""Alternatives for the selection/gather primitives that dominate refine."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np

B, nc, cs, dim = 8192, 8, 256, 512
centers = jax.random.normal(jax.random.PRNGKey(9), (nc, cs, dim))


def bench(name, fn, make_args, n=2):
    a = make_args(0)
    np.asarray(jax.jit(fn)(*a)).ravel()[:1]
    f = jax.jit(fn)
    ts = []
    for i in range(1, n + 1):
        a = make_args(i)
        for x in a:
            x.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(f(*a)).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {1000*min(ts):8.2f} ms")


def rf(i, shape):
    return jax.random.normal(jax.random.PRNGKey(i * 7 + 2), shape)


def ri(i, shape, hi=cs):
    return jax.random.randint(jax.random.PRNGKey(i * 7 + 1), shape, 0, hi)


bench("fence", lambda x: x[:1, :1] + 1, lambda i: (rf(i, (B, dim)),))

bench("top_k (B,8,256)->16  [exact]",
      lambda s: jax.lax.top_k(s, 16)[1].sum(axis=0).ravel()[:4],
      lambda i: (rf(i, (B, nc, cs)),))

bench("approx_max_k 256->16 recall .95",
      lambda s: jax.lax.approx_max_k(s, 16)[1].sum(axis=0).ravel()[:4],
      lambda i: (rf(i, (B, nc, cs)),))

bench("approx_max_k 256->16 recall 1.0",
      lambda s: jax.lax.approx_max_k(s, 16, recall_target=1.0)[1].sum(axis=0).ravel()[:4],
      lambda i: (rf(i, (B, nc, cs)),))

bench("approx 2d (B*8,256)->16",
      lambda s: jax.lax.approx_max_k(s.reshape(B * nc, cs), 16)[1].sum(axis=0).ravel()[:4],
      lambda i: (rf(i, (B, nc, cs)),))

bench("top_k 2d (B*8,256)->16",
      lambda s: jax.lax.top_k(s.reshape(B * nc, cs), 16)[1].sum(axis=0).ravel()[:4],
      lambda i: (rf(i, (B, nc, cs)),))

bench("argmin via argmax (B,1,1024)",
      lambda s: jnp.argmax(s, -1).sum(axis=0).ravel()[:1],
      lambda i: (rf(i, (B, 1, 1024)),))

# iterative masked argmax x16 (selection without sort)
def iter_topk(s):
    idxs = []
    cur = s
    for _ in range(16):
        j = jnp.argmax(cur, axis=-1)
        idxs.append(j)
        cur = cur - 1e30 * jax.nn.one_hot(j, cs, dtype=s.dtype)
    return jnp.stack(idxs, -1).sum(axis=0).ravel()[:4]

bench("iterative argmax x16", iter_topk, lambda i: (rf(i, (B, nc, cs)),))

# gather deltas alternatives
bench("gather deltas fancy (B,8,16,512)",
      lambda sel: (centers[jnp.arange(nc)[None, :, None], sel]).sum(axis=(0, 1, 2))[:8],
      lambda i: (ri(i, (B, nc, 16)),))

bench("gather deltas onehot-matmul",
      lambda sel: jnp.einsum("bnkc,ncd->bnkd", jax.nn.one_hot(sel, cs, dtype=jnp.float32), centers,
                             preferred_element_type=jnp.float32).sum(axis=(0, 1, 2))[:8],
      lambda i: (ri(i, (B, nc, 16)),))

bench("gather deltas onehot-matmul bf16",
      lambda sel: jnp.einsum("bnkc,ncd->bnkd", jax.nn.one_hot(sel, cs, dtype=jnp.bfloat16),
                             centers.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32).sum(axis=(0, 1, 2))[:8],
      lambda i: (ri(i, (B, nc, 16)),))

bench("take_along idx (B,8,256,1)->(B,8,16,1)",
      lambda ci, sel: jnp.take_along_axis(ci, sel[..., None], axis=2).sum(axis=(0, 1, 2))[:1],
      lambda i: (ri(i, (B, nc, cs, 1)), ri(i + 1, (B, nc, 16))))

# take_along via onehot matmul on int->float
bench("take_along idx via onehot",
      lambda ci, sel: jnp.einsum("bnkc,bncl->bnkl", jax.nn.one_hot(sel, cs, dtype=jnp.float32),
                                 ci.astype(jnp.float32), preferred_element_type=jnp.float32)
      .astype(jnp.int32).sum(axis=(0, 1, 2))[:1],
      lambda i: (ri(i, (B, nc, cs, 1)), ri(i + 1, (B, nc, 16))))

# combine einsum in bf16
bench("combine einsum f32 (B,4,16,512)^2",
      lambda e, o: jnp.einsum("bnkd,bnjd->bnkj", e, o, preferred_element_type=jnp.float32).sum(0).ravel()[:4],
      lambda i: (rf(i, (B, 4, 16, dim)), rf(i + 100, (B, 4, 16, dim))))

bench("combine einsum bf16",
      lambda e, o: jnp.einsum("bnkd,bnjd->bnkj", e.astype(jnp.bfloat16), o.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32).sum(0).ravel()[:4],
      lambda i: (rf(i, (B, 4, 16, dim)), rf(i + 100, (B, 4, 16, dim))))
