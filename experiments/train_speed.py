"""Training-step throughput: XLA beam vs fused seqbeam kernel as the
index search inside the jitted+scanned train step (phase-2 flagship
config, dim=512, nc=8, cs=256, batch 600)."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from quantization_tpu import core
from quantization_tpu.train.trainer import _make_train_scan, make_optimizer

dim, nc, cs = 512, 8, 256
B, K = 600, 50
config = core.QuantizerConfig(dim=dim, codebook_size=cs, num_codebooks=nc)

for method in ("beam", "seqbeam"):
    params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
    tx = make_optimizer()
    opt_state = tx.init(params)
    run = _make_train_scan(config, 0.01, method)
    xs = jax.random.normal(jax.random.PRNGKey(1), (K, B, dim))
    use2 = jnp.zeros((K,), bool).at[::2].set(True)
    lrs = jnp.full((K,), 0.005, jnp.float32)
    t0 = time.time()
    params, opt_state, losses = run(params, opt_state, xs, use2, lrs)
    np.asarray(losses.rel_reconstruction_loss)
    compile_s = time.time() - t0
    # steady state
    ts = []
    for i in range(2):
        xs2 = jax.random.normal(jax.random.PRNGKey(2 + i), (K, B, dim))
        xs2.block_until_ready()
        t0 = time.time()
        params, opt_state, losses = run(params, opt_state, xs2, use2, lrs)
        np.asarray(losses.rel_reconstruction_loss)
        ts.append(time.time() - t0)
    dt = min(ts)
    print(
        f"{method:8s}: compile+first {compile_s:.0f}s, steady {1000*dt/K:.1f} ms/step "
        f"({K/dt:.1f} steps/s), recon={float(losses.rel_reconstruction_loss[-1]):.4f}",
        flush=True,
    )
