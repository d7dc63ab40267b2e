"""Dissect the decode superstep: time variants with components disabled.

Builds the same K-step scanned decode superstep as ModelRunner
(`runner/model_runner.py:_build_decode_superstep`) but with switches that
no-op individual components, so subtracting variant times localises the
per-step cost of each: attention kernel, KV write, logits matmul, sampler.

Usage (on the real chip):
    python benchmarks/probe_dissect.py --batch 256 --seq-len 800
"""
import argparse
import faulthandler
import functools
import os
import sys
import time

faulthandler.dump_traceback_later(120, repeat=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

from nanovllmx_tpu.ops import attention as attn_ops
from nanovllmx_tpu.ops.sampler import sample
from nanovllmx_tpu.models.decoder import compute_logits, forward_hidden
from nanovllmx_tpu.weights.loader import init_random_params
from bench import qwen3_06b_spec

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=256)
ap.add_argument("--seq-len", type=int, default=800)
ap.add_argument("--page-size", type=int, default=128)
ap.add_argument("--num-pages", type=int, default=2048)
ap.add_argument("--lookahead", type=int, default=16)
ap.add_argument("--iters", type=int, default=4)
args = ap.parse_args()

spec = qwen3_06b_spec()
params = init_random_params(
    spec, dtype=jnp.bfloat16, quantization="int8", quant_group_size=128
)
ps = args.page_size
P = args.num_pages
K = args.lookahead
B = args.batch
W = 4096 // ps
shape = (spec.num_layers, 2, P, ps, spec.num_kv_heads, spec.head_dim)
# timings are data-independent (int8 MXU + DMA): zero-filled pool, constant
# scales. (A host- or device-side random fill of the 15 GB pool either eats
# ~120 GB of int64 numpy or OOMs HBM with uint32 randbit intermediates.)
rng = np.random.default_rng(0)
struct = attn_ops.make_kv_pool(
    shape, jnp.int8, init=lambda sh, dt: jax.ShapeDtypeStruct(sh, dt)
)
kv_pool = {
    "kv": jnp.zeros(struct["kv"].shape, jnp.int8),
    "scale": jnp.full(struct["scale"].shape, 0.01, jnp.float32),
}

pages_per = -(-args.seq_len // ps) + 1
table_np = np.zeros((B, W), np.int32)
for i in range(B):
    table_np[i, :pages_per] = (np.arange(pages_per) + i * pages_per) % P
oob = int(attn_ops.OOB_SLOT)


def build(variant: str):
    from nanovllmx_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_pallas,
    )

    @functools.partial(jax.jit, donate_argnums=(1,))
    def superstep(params, kv_pool, table, tokens0, lens0, active,
                  temps, top_ps, top_ks, min_ps, key):
        rows = jnp.arange(B)

        def inner(carry, _):
            tokens, lens, kv_pool, key = carry
            key, sub = jax.random.split(key)
            pos = lens
            page_idx = table[rows, jnp.minimum(pos // ps, W - 1)]
            slots = jnp.where(active, page_idx * ps + pos % ps, oob)
            seq_lens = jnp.where(active, pos + 1, 0)

            if variant == "no_attend":
                def attend(q, kv_pool, layer):
                    return jnp.zeros_like(q)
            else:
                def attend(q, kv_pool, layer):
                    return paged_decode_attention_pallas(
                        q, kv_pool, table, seq_lens, spec.scale, layer=layer
                    )

            wslots = (
                jnp.full_like(slots, oob) if variant == "no_kvwrite" else slots
            )
            hidden, new_pool = forward_hidden(
                params, spec, tokens, pos, kv_pool, wslots, attend,
                unique_pages=True, pallas_store=True,
            )
            if variant == "no_kvwrite_static":
                new_pool = kv_pool
            kv_pool = new_pool
            if variant == "no_logits":
                nxt = tokens + 1
            else:
                logits = compute_logits(params, spec, hidden)
                if variant == "argmax":
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    nxt = sample(logits, temps, top_ps, top_ks, min_ps, sub)
            nxt = jnp.where(active, nxt, tokens)
            lens = lens + active.astype(jnp.int32)
            return (nxt, lens, kv_pool, key), nxt

        (last, _, kv_pool, _), toks = jax.lax.scan(
            inner, (tokens0, lens0, kv_pool, key), None, length=K
        )
        return toks, kv_pool

    return superstep


_fns: dict = {}


def run(variant: str, active_n: int):
    global kv_pool
    fn = _fns.setdefault(variant, build(variant))
    table = jnp.asarray(table_np)
    tokens0 = jnp.asarray(rng.integers(1, 1000, B), jnp.int32)
    lens0 = jnp.full(B, args.seq_len, jnp.int32)
    active = (np.arange(B) < active_n)
    activej = jnp.asarray(active)
    temps = jnp.ones(B, jnp.float32)
    top_ps = jnp.ones(B, jnp.float32)
    top_ks = jnp.full(B, -1, jnp.int32)
    min_ps = jnp.zeros(B, jnp.float32)
    key = jax.random.PRNGKey(0)

    t_build = time.perf_counter()
    toks, kv_pool = fn(params, kv_pool, table, tokens0, lens0, activej,
                       temps, top_ps, top_ks, min_ps, key)
    print(f"  [{variant}] dispatched (trace+compile+enqueue "
          f"{time.perf_counter()-t_build:.1f}s)", flush=True)
    np.asarray(toks)  # sync (compile + run 1)
    print(f"  [{variant}] first sync done "
          f"({time.perf_counter()-t_build:.1f}s total)", flush=True)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        toks, kv_pool = fn(params, kv_pool, table, tokens0, lens0, activej,
                           temps, top_ps, top_ks, min_ps, key)
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{variant:16s} active={active_n:4d}: {t*1e3:8.1f} ms/superstep "
          f"({t/K*1e3:6.2f} ms/step, {active_n*K/t:7.0f} tok/s)", flush=True)
    return t


print(f"B={B} len={args.seq_len} ps={ps} K={K}", flush=True)
for variant in ("full", "argmax", "no_logits", "no_attend", "no_kvwrite"):
    run(variant, B)
print("-- occupancy sweep (full) --", flush=True)
for a in (192, 128, 64, 32):
    if a < B:
        run("full", a)
