import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np

REPS = 20
def timeit_loop(make_body, init, n=3):
    """time REPS on-device iterations of body (output feeds back) via scan."""
    @jax.jit
    def run(init):
        def f(carry, _):
            return make_body(carry), None
        out, _ = jax.lax.scan(f, init, None, length=REPS)
        return out
    out = run(init); np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); out=run(init)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter()-t0)
    return min(ts)*1000/REPS

B, nc, cs, dim, K = 8192, 8, 256, 512, 16
key = jax.random.PRNGKey(0)
centers = jax.random.normal(key, (nc, cs, dim))
x = jax.random.normal(jax.random.PRNGKey(1), (B, dim))
idx = jax.random.randint(jax.random.PRNGKey(2), (B, nc), 0, cs)
sel = jax.random.randint(jax.random.PRNGKey(3), (B, nc, K), 0, cs)
sumsq = jax.random.normal(jax.random.PRNGKey(4), (B, nc, cs))
deltas = jax.random.normal(jax.random.PRNGKey(5), (B, nc, K, dim))

t = timeit_loop(lambda i: (centers[jnp.arange(nc)[None,:], i] .sum(-1).astype(jnp.int32) % cs), idx)
print("old_centers gather: %.2f ms" % t)

t = timeit_loop(lambda xr: jnp.einsum('bnd,nkd->bnk', xr, centers) @ jnp.ones((cs,dim))*1e-9 + xr, xr_init := jax.random.normal(key,(B,nc,dim)))
print("cross einsum+feedback: %.2f ms" % t)

t = timeit_loop(lambda s: s + jax.lax.top_k(-s, K)[0].sum()*1e-9, sumsq)
print("top_k16 (B,8,256): %.2f ms" % t)

t = timeit_loop(lambda s: (centers[jnp.arange(nc)[None,:,None], s].sum(-1).astype(jnp.int32)) % cs, sel)
print("deltas gather (B,8,16,512): %.2f ms" % t)

t = timeit_loop(lambda d: d + jnp.einsum('bnkd,bnjd->bnkj', d[:,0::2,:,:], d[:,1::2,:,:]).mean()*1e-9, deltas)
print("combine matmuls (4x BxKxK): %.2f ms" % t)

a = jax.random.normal(key, (8192, 2048)); b2 = jax.random.normal(key, (2048, 2048))
t = timeit_loop(lambda a: jnp.dot(a, b2, precision=jax.lax.Precision.HIGHEST)[:, :2048], a)
print("matmul 8192x2048x2048 HIGHEST: %.2f ms = %.1f TF/s" % (t, 2*8192*2048*2048/(t/1000)/1e12))
t = timeit_loop(lambda a: jnp.dot(a, b2)[:, :2048], a)
print("matmul DEFAULT: %.2f ms = %.1f TF/s" % (t, 2*8192*2048*2048/(t/1000)/1e12))
ab = a.astype(jnp.bfloat16)
t = timeit_loop(lambda a: jnp.dot(a, b2.astype(jnp.bfloat16), preferred_element_type=jnp.bfloat16), ab)
print("matmul bf16: %.2f ms = %.1f TF/s" % (t, 2*8192*2048*2048/(t/1000)/1e12))
