"""Vision tower (SigLIP-So400m geometry, 448px -> 1024 patches) device-time
probe: flash vs XLA attention, split vs fused qkv projections.

The 448px prefill spends 7.45 ms (23% of device time) in the tower at 66%
of MXU peak (docs/PERFORMANCE.md); the bound is small 1152-wide matmuls
and head_dim=72 padding. This probe measures the candidate fixes in
isolation before changing the production path.
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from timing import dev_time  # noqa: E402  (.bench/timing.py)

from paligemma_tpu.core.config import paligemma_3b_448
from paligemma_tpu.models import siglip
from paligemma_tpu.ops import attention
from paligemma_tpu.ops.activations import gelu_tanh
from paligemma_tpu.ops.norms import layer_norm


def encode_fused(params, cfg, pixels, use_flash):
    """siglip.encode with q/k/v (and optionally nothing else) fused into one
    (d, 3d) GEMM per block. Weights pre-concatenated OUTSIDE the timed fn."""
    x = pixels.transpose(0, 2, 3, 1)
    dtype = params["pos_embed"].dtype
    patches = siglip.patchify(x, cfg.patch_size).astype(dtype)
    emb = patches @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    emb = emb + params["pos_embed"][None]
    h_, hd = cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    def block(x, lp):
        b, s, d = x.shape
        residual = x
        y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        qkv = y @ lp["qkv_kernel"] + lp["qkv_bias"]  # (b, s, 3d)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, h_, hd)
        k = k.reshape(b, s, h_, hd)
        v = v.reshape(b, s, h_, hd)
        if use_flash:
            from paligemma_tpu.kernels.flash_attention import flash_attention

            full = jnp.full((b,), s, jnp.int32)
            a = flash_attention(q, k, v, full, full)
        else:
            a = attention.mha(q, k, v)
        a = a.reshape(b, s, d) @ lp["attn"]["o"]["kernel"] + lp["attn"]["o"]["bias"]
        x = residual + a
        residual = x
        y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        y = gelu_tanh(y @ lp["mlp"]["fc1"]["kernel"] + lp["mlp"]["fc1"]["bias"])
        y = y @ lp["mlp"]["fc2"]["kernel"] + lp["mlp"]["fc2"]["bias"]
        return residual + y, None

    h, _ = jax.lax.scan(block, emb, params["layers"])
    return layer_norm(
        h, params["post_ln"]["scale"], params["post_ln"]["bias"], eps
    )


def main():
    cfg4 = paligemma_3b_448().vision_config
    print(
        f"vision: {cfg4.num_hidden_layers}L d={cfg4.hidden_size} "
        f"i={cfg4.intermediate_size} h={cfg4.num_attention_heads} "
        f"hd={cfg4.head_dim} patches={cfg4.num_patches}",
        flush=True,
    )
    key = jax.random.PRNGKey(0)
    params = siglip.init_params(key, cfg4, jnp.bfloat16)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(1, 3, cfg4.image_size, cfg4.image_size)),
        jnp.bfloat16,
    )

    # fused-qkv weight tree (concat once, outside timing)
    fl = dict(params["layers"])
    fl["qkv_kernel"] = jnp.concatenate(
        [params["layers"]["attn"][n]["kernel"] for n in ("q", "k", "v")],
        axis=-1,
    )
    fl["qkv_bias"] = jnp.concatenate(
        [params["layers"]["attn"][n]["bias"] for n in ("q", "k", "v")],
        axis=-1,
    )
    pf = dict(params)
    pf["layers"] = fl

    # FLOPs for MFU: per layer 4 proj GEMMs + MLP + attention
    s, d, i = cfg4.num_patches, cfg4.hidden_size, cfg4.intermediate_size
    h, hd = cfg4.num_attention_heads, cfg4.head_dim
    fl_proj = 2 * s * d * d * 4 + 2 * s * d * i * 2
    fl_attn = 2 * s * s * (h * hd) * 2
    flops = cfg4.num_hidden_layers * (fl_proj + fl_attn) + 2 * s * (
        cfg4.patch_size**2 * 3
    ) * d
    print(f"flops/call: {flops/1e9:.1f} GF", flush=True)

    variants = {
        "split+flash": jax.jit(
            functools.partial(siglip.encode, cfg=cfg4, use_flash=True)
        ),
        "split+xla": jax.jit(
            functools.partial(siglip.encode, cfg=cfg4, use_flash=False)
        ),
    }
    for name, f in variants.items():
        t = dev_time(lambda p: f(p, pixel_values=pixels), params)
        print(
            f"{name}: {t*1e3:.2f} ms -> {flops/t/1e12:.0f} TF/s "
            f"({flops/t/197e12*100:.0f}% peak)",
            flush=True,
        )
    for name, uf in (("fused+flash", True), ("fused+xla", False)):
        f = jax.jit(functools.partial(encode_fused, cfg=cfg4, use_flash=uf))
        t = dev_time(lambda p: f(p, pixels=pixels), pf)
        print(
            f"{name}: {t*1e3:.2f} ms -> {flops/t/1e12:.0f} TF/s "
            f"({flops/t/197e12*100:.0f}% peak)",
            flush=True,
        )


if __name__ == "__main__":
    main()
