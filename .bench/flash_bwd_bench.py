"""Flash fwd+bwd vs XLA-attention fwd+bwd at 448px training shapes.

LM attention at PaliGemma-448 fine-tune shapes: S = 1024 image + 128 text
= 1152, 8 q heads / 1 kv head, d=256, bf16, prefix-LM mask.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from paligemma_tpu.kernels.flash_attention import flash_attention, reference_attention

def sync(x): return np.asarray(jax.device_get(x.ravel()[0]))

B, S, HQ, HKV, D = 2, 1152, 8, 1, 256
ks = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(ks[0], (B, S, HQ, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, S, HKV, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, S, HKV, D), jnp.bfloat16)
pfx = jnp.full((B,), 1028, jnp.int32)  # 1024 img + 4 prompt prefix
kvl = jnp.full((B,), S, jnp.int32)

def bench(name, attn):
    @jax.jit
    def step(q, k, v):
        def loss(q, k, v):
            o = attn(q, k, v)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g = step(q, k, v); sync(g[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            g = step(q, k, v)
        sync(g[0])
        dt = (time.perf_counter() - t0) / 10
        best = dt if best is None else min(best, dt)
    # attention fwd+bwd flops ~ 3.5 * (2*2*S*S*HQ*D)  (fwd 2 matmuls, bwd 5)
    fl = 3.5 * 2 * 2 * S * S * HQ * D * B
    print(f"{name}: {best*1e3:7.3f} ms  (~{fl/best/1e12:5.1f} TF/s)")
    return best

t_flash = bench("flash fwd+bwd (Pallas) ", lambda q, k, v: flash_attention(q, k, v, pfx, kvl, block_q=256, block_k=256))
t_xla = bench("XLA ref fwd+bwd        ", lambda q, k, v: reference_attention(q, k, v, pfx, kvl))
print(f"speedup: {t_xla/t_flash:.2f}x")
