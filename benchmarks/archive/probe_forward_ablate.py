"""Ablate the transformer forward (null attention) to find the hot spot.

probe_model_only measured 41.5 ms for a null-attention 1152-token prefill —
7x the bf16 MXU bound. This probe rebuilds the layer body with pieces
removable: --ablate {full, nowrite, nomlp, noqkv, nonorm, matmul-only}.
"""
import argparse
import functools
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.ops import attention as attn_ops
from nanovllmx_tpu.ops.layers import apply_rope, rms_norm, rope_cos_sin
from nanovllmx_tpu.ops.linear import dense
from nanovllmx_tpu.weights.loader import init_random_params
from bench import qwen3_06b_spec

ap = argparse.ArgumentParser()
ap.add_argument("--quantization", default="int8", choices=["none", "int8"])
ap.add_argument("--tokens", type=int, default=1152)
ap.add_argument("--ablate", default="full",
                choices=["full", "nowrite", "nomlp", "noqkv", "nonorm",
                         "matmul-only", "empty"])
args = ap.parse_args()
quant = None if args.quantization == "none" else args.quantization

spec = qwen3_06b_spec()
params = init_random_params(spec, dtype=jnp.bfloat16, quantization=quant)
NT = args.tokens
num_pages, ps = 1024, 128
kv_pool = attn_ops.make_kv_pool(
    (spec.num_layers, 2, num_pages, ps, spec.num_kv_heads, spec.head_dim),
    jnp.int8,
)
AB = args.ablate
nq, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim


@functools.partial(jax.jit, donate_argnums=(1,))
def fwd(params, kv_pool, token_ids, positions, write_slots):
    x = jnp.take(params["embed"]["w"], token_ids, axis=0)
    cos, sin = rope_cos_sin(positions, hd, spec.rope_theta)
    N = NT

    def layer_fn(carry, layer_in):
        x, kv_pool = carry
        lp, layer_idx = layer_in
        if AB == "empty":
            return (x, kv_pool), None
        h = x if AB == "nonorm" else rms_norm(
            x, lp["input_norm"], spec.rms_norm_eps
        )
        if AB in ("noqkv",):
            attn = jnp.zeros((N, nq * hd), x.dtype)
            x = x + dense(attn, lp["o"])
        else:
            q = dense(h, lp["q"]).reshape(N, nq, hd)
            k = dense(h, lp["k"]).reshape(N, nkv, hd)
            v = dense(h, lp["v"]).reshape(N, nkv, hd)
            if AB not in ("nonorm", "matmul-only"):
                q = rms_norm(q, lp["q_norm"], spec.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], spec.rms_norm_eps)
            if AB != "matmul-only":
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
            if AB not in ("nowrite", "matmul-only"):
                kv_pool = attn_ops.write_kv(
                    kv_pool, k, v, write_slots, layer_idx
                )
            x = x + dense(q.reshape(N, nq * hd), lp["o"])
        if AB != "nomlp":
            h2 = x if AB in ("nonorm", "matmul-only") else rms_norm(
                x, lp["post_norm"], spec.rms_norm_eps
            )
            gated = jax.nn.silu(
                dense(h2, lp["gate"]).astype(jnp.float32)
            ).astype(h2.dtype) * dense(h2, lp["up"])
            x = x + dense(gated, lp["down"])
        return (x, kv_pool), None

    (x, kv_pool), _ = jax.lax.scan(
        layer_fn, (x, kv_pool),
        (params["layers"], jnp.arange(spec.num_layers)),
    )
    return jnp.sum(x.astype(jnp.float32)), kv_pool


token_ids = jnp.ones(NT, jnp.int32)
positions = jnp.asarray(np.arange(NT) % 512, jnp.int32)
write = jnp.asarray(np.arange(NT) % (num_pages * ps), jnp.int32)
t0 = time.perf_counter()
s, kv_pool = fwd(params, kv_pool, token_ids, positions, write)
float(s)
print(f"[{AB} q={args.quantization}] compile+run: "
      f"{time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    s, kv_pool = fwd(params, kv_pool, token_ids, positions, write)
    float(s)
    dt = time.perf_counter() - t0
    print(f"[{AB} q={args.quantization}] {NT} tok: {dt*1e3:6.1f} ms "
          f"({NT/dt:.0f} tok/s)", flush=True)
