"""Probe: decode superstep with NULL attention — isolates the non-attention
cost (MLP/proj matmuls, logits, sampler, KV-write scatter, scan plumbing).

The gap between probe_steps (real attention) and this number is the
attention kernel's share of a decode step.
"""
import argparse
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.models.decoder import compute_logits, forward_hidden
from nanovllmx_tpu.ops import attention as attn_ops
from nanovllmx_tpu.ops.sampler import sample
from nanovllmx_tpu.weights.loader import init_random_params
from bench import qwen3_06b_spec

ap = argparse.ArgumentParser()
ap.add_argument("--quantization", default=None, choices=["int8", "int4"])
ap.add_argument("--kv-cache-dtype", default="bf16")
ap.add_argument("--page-size", type=int, default=128)
ap.add_argument("--batch", type=int, default=256)
ap.add_argument("--lookahead", type=int, default=16)
ap.add_argument("--no-kv-write", action="store_true",
                help="also skip the KV scatter")
ap.add_argument("--mode", default="decode", choices=["decode", "prefill"])
ap.add_argument("--prefill-tokens", type=int, default=1152)
args = ap.parse_args()

spec = qwen3_06b_spec()
params = init_random_params(
    spec, dtype=jnp.bfloat16, quantization=args.quantization,
)
B, K, ps = args.batch, args.lookahead, args.page_size
num_pages = 1024
kv_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[args.kv_cache_dtype]
kv_pool = attn_ops.make_kv_pool(
    (spec.num_layers, 2, num_pages, ps, spec.num_kv_heads, spec.head_dim),
    kv_dtype,
)
skip_write = args.no_kv_write


@functools.partial(jax.jit, donate_argnums=(1,))
def superstep(params, kv_pool, tokens0, positions0, slots0, key):
    def attend(q, kv_pool, layer):
        return q  # null attention

    def inner(carry, _):
        tokens, pos, kv_pool, key = carry
        key, sub = jax.random.split(key)
        if skip_write:
            write = jnp.full_like(slots0, attn_ops.OOB_SLOT)
        else:
            write = slots0 + pos[0]
        hidden, kv_pool = forward_hidden(
            params, spec, tokens, pos, kv_pool, write, attend
        )
        logits = compute_logits(params, spec, hidden)
        nxt = sample(
            logits, jnp.full(B, 0.6), jnp.ones(B),
            jnp.full(B, -1, jnp.int32), jnp.zeros(B), sub,
        )
        return (nxt, pos + 1, kv_pool, key), nxt

    (_, _, kv_pool, _), toks = jax.lax.scan(
        inner, (tokens0, positions0, kv_pool, key), None, length=K
    )
    return toks, kv_pool


if args.mode == "decode":
    tokens0 = jnp.ones(B, jnp.int32)
    positions0 = jnp.full(B, 100, jnp.int32)
    slots0 = jnp.asarray((np.arange(B) * 4 % num_pages) * ps, jnp.int32)

    t0 = time.perf_counter()
    toks, kv_pool = superstep(params, kv_pool, tokens0, positions0, slots0,
                              jax.random.PRNGKey(0))
    np.asarray(toks)
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        toks, kv_pool = superstep(params, kv_pool, tokens0, positions0,
                                  slots0, jax.random.PRNGKey(1))
        np.asarray(toks)
        dt = time.perf_counter() - t0
        print(
            f"null-attn superstep: {dt*1e3:.1f} ms "
            f"({dt/K*1e3:.2f} ms/token-step, {B*K/dt:.0f} tok/s)",
            flush=True,
        )
else:
    NT = args.prefill_tokens

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_null(params, kv_pool, tokens, positions, write, key):
        def attend(q, kv_pool, layer):
            return q

        hidden, kv_pool = forward_hidden(
            params, spec, tokens, positions, kv_pool, write, attend
        )
        last = jnp.take(hidden, jnp.arange(16), axis=0)
        logits = compute_logits(params, spec, last)
        nxt = sample(
            logits, jnp.full(16, 0.6), jnp.ones(16),
            jnp.full(16, -1, jnp.int32), jnp.zeros(16), key,
        )
        return nxt, kv_pool

    tokens = jnp.ones(NT, jnp.int32)
    positions = jnp.asarray(np.arange(NT) % 512, jnp.int32)
    write = jnp.asarray(np.arange(NT) % (num_pages * ps), jnp.int32)
    t0 = time.perf_counter()
    toks, kv_pool = prefill_null(params, kv_pool, tokens, positions, write,
                                 jax.random.PRNGKey(0))
    np.asarray(toks)
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        toks, kv_pool = prefill_null(params, kv_pool, tokens, positions,
                                     write, jax.random.PRNGKey(1))
        np.asarray(toks)
        dt = time.perf_counter() - t0
        print(
            f"null-attn prefill ({NT} tok): {dt*1e3:.1f} ms "
            f"({NT/dt:.0f} tok/s)",
            flush=True,
        )
