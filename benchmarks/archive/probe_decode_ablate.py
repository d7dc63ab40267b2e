"""Ablate the DECODE superstep's non-attention work (B=256, K=16).

probe_steps measured 16.7 ms/token-step at B=256 with ~zero-context
attention (~3.3 ms) -> ~13.4 ms of non-attention work per token-step.
This probe rebuilds the decode superstep body with pieces removable to
find where it goes: --ablate {full, nowrite, noscale, nologits, write-only,
matmul-only, empty}.
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
from nanovllmx_tpu.ops.sampler import sample
from nanovllmx_tpu.weights.loader import init_random_params
from bench import qwen3_06b_spec

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=256)
ap.add_argument("--lookahead", type=int, default=16)
ap.add_argument("--ablate", default="full",
                choices=["full", "nowrite", "noscale", "nologits",
                         "write-only", "matmul-only", "empty"])
ap.add_argument("--pallas-store", type=int, default=1)
args = ap.parse_args()

spec = qwen3_06b_spec()
params = init_random_params(spec, dtype=jnp.bfloat16, quantization="int8")
B, K = args.batch, args.lookahead
num_pages, ps = 2048, 128
kv_pool = attn_ops.make_kv_pool(
    (spec.num_layers, 2, num_pages, ps, spec.num_kv_heads, spec.head_dim),
    jnp.int8,
)
AB = args.ablate
PSTORE = bool(args.pallas_store)
nq, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim


@functools.partial(jax.jit, donate_argnums=(1,))
def superstep(params, kv_pool, tokens0, pos0, slots0):
    def inner(carry, _):
        tokens, kv_pool = carry
        x = jnp.take(params["embed"]["w"], tokens, axis=0)
        cos, sin = rope_cos_sin(pos0, hd, spec.rope_theta)
        N = B

        def layer_fn(carry2, layer_in):
            x, kv_pool = carry2
            lp, layer_idx = layer_in
            if AB == "empty":
                return (x, kv_pool), None
            if AB == "write-only":
                k = x[:, :nkv * hd].reshape(N, nkv, hd)
                kv_pool = attn_ops.write_kv(
                    kv_pool, k, k, slots0, layer_idx,
                    unique_pages=True, pallas_store=PSTORE)
                return (x, kv_pool), None
            h = rms_norm(x, lp["input_norm"], spec.rms_norm_eps)
            q = dense(h, lp["q"]).reshape(N, nq, hd)
            k = dense(h, lp["k"]).reshape(N, nkv, hd)
            v = dense(h, lp["v"]).reshape(N, nkv, hd)
            if AB != "matmul-only":
                q = rms_norm(q, lp["q_norm"], spec.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], spec.rms_norm_eps)
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
            if AB not in ("nowrite", "matmul-only"):
                if AB == "noscale":
                    # raw int8 value scatter only (no scale-plane write)
                    vals = kv_pool["kv"]
                    L, _, P, pps, _, _ = vals.shape
                    plane = P * pps
                    base = layer_idx * (2 * plane)
                    idx = jnp.concatenate([base + slots0, base + plane + slots0])
                    from nanovllmx_tpu.ops.pallas.kv_write import scatter_kv_rows
                    flat = vals.reshape(L * 2 * plane, nkv, hd)
                    rows8 = jnp.concatenate([
                        jnp.round(k.astype(jnp.float32)).astype(jnp.int8),
                        jnp.round(v.astype(jnp.float32)).astype(jnp.int8)])
                    flat = scatter_kv_rows(flat, rows8, idx)
                    kv_pool = {"kv": flat.reshape(vals.shape),
                               "scale": kv_pool["scale"]}
                else:
                    kv_pool = attn_ops.write_kv(
                        kv_pool, k, v, slots0, layer_idx,
                        unique_pages=True, pallas_store=PSTORE)
            attn = q  # fake attention (probe isolates non-attention work)
            x = x + dense(attn.reshape(N, nq * hd), lp["o"])
            h2 = rms_norm(x, lp["post_norm"], spec.rms_norm_eps)
            gated = jax.nn.silu(
                dense(h2, lp["gate"]).astype(jnp.float32)
            ).astype(h2.dtype) * dense(h2, lp["up"])
            x = x + dense(gated, lp["down"])
            return (x, kv_pool), None

        (x, kv_pool), _ = jax.lax.scan(
            layer_fn, (x, kv_pool),
            (params["layers"], jnp.arange(spec.num_layers)),
        )
        if AB in ("nologits", "write-only", "empty"):
            nxt = tokens
        else:
            x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
            w = params["embed"]["w"]
            logits = jnp.dot(x, w.T.astype(x.dtype),
                             preferred_element_type=jnp.float32)
            nxt = sample(logits, jnp.full(B, 0.6, jnp.float32),
                         jnp.ones(B, jnp.float32), jnp.full(B, -1, jnp.int32),
                         jnp.zeros(B, jnp.float32), jax.random.PRNGKey(0))
        return (nxt, kv_pool), nxt

    (last, kv_pool), toks = jax.lax.scan(
        inner, (tokens0, kv_pool), None, length=K)
    return toks, kv_pool


tokens0 = jnp.ones(B, jnp.int32)
pos0 = jnp.full(B, 100, jnp.int32)
slots0 = jnp.asarray((np.arange(B) * 997) % (num_pages * ps), jnp.int32)
t0 = time.perf_counter()
toks, kv_pool = superstep(params, kv_pool, tokens0, pos0, slots0)
np.asarray(toks)
print(f"[{AB} pstore={PSTORE}] compile+run: {time.perf_counter()-t0:.1f}s",
      flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    toks, kv_pool = superstep(params, kv_pool, tokens0, pos0, slots0)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    print(f"[{AB} pstore={PSTORE}] superstep {dt*1e3:7.1f} ms "
          f"({dt/K*1e3:5.2f} ms/token-step)", flush=True)
