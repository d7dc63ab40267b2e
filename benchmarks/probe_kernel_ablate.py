"""Ablate pieces of the decode-attention compute chain on the chip.

Localizes per-pass cost: scale streaming+application, softmax exp, the
block-diagonal p8 build, the PV dot, the scores dot.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanovllmx_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.ops.pallas import decode_attention as da

import argparse
ap = argparse.ArgumentParser()
ap.add_argument("--kv", default="int8", choices=["int8", "int4"])
args = ap.parse_args()
B, nq, nkv, hd, ps = 256, 16, 8, 128, 128
W, L, P = 32, 1, 2048
LEN = 800
ITERS = 56
rng = np.random.default_rng(0)
if args.kv == "int4":
    kv_pool = {
        "kv": jnp.zeros((L, 2, P, ps, nkv // 2, hd), jnp.int8),
        "scale": jnp.full((L, 2, P, 128), 0.01, jnp.float32),
        "p4": jnp.zeros((0,), jnp.int8),
    }
else:
    kv_pool = {
        "kv": jnp.zeros((L, 2, P, ps, nkv, hd), jnp.int8),
        "scale": jnp.full((L, 2, P, 128), 0.01, jnp.float32),
    }
q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.bfloat16)
scale = 1.0 / np.sqrt(hd)
pages_per = -(-LEN // ps)
pt = np.zeros((B, W), np.int32)
for i in range(B):
    pt[i, :pages_per] = (np.arange(pages_per) + i * pages_per) % P
pt = jnp.asarray(pt)
lens_d = jnp.asarray(np.full(B, LEN, np.int32))


def bench(tag):
    def many(q, kv_pool, pt, lens, iters):
        def body(carry, _):
            o = da.paged_decode_attention_pallas(
                carry, kv_pool, pt, lens, scale, layer=0
            )
            return o, ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out.sum()

    manyj = jax.jit(many, static_argnums=(4,))
    float(manyj(q, kv_pool, pt, lens_d, ITERS))
    float(manyj(q, kv_pool, pt, lens_d, 2 * ITERS))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(manyj(q, kv_pool, pt, lens_d, ITERS))
        t1 = time.perf_counter()
        float(manyj(q, kv_pool, pt, lens_d, 2 * ITERS))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / ITERS)
    per = max(min(ts), 1e-9)
    gb = B * pages_per * ps * nkv * hd * 2 / 1e9
    print(f"{tag:44s}: {per*1e3:7.3f} ms/pass ({gb/per:6.1f} GB/s)",
          flush=True)


# NOTE: paged_decode_attention_pallas is @jax.jit'd — a DEBUG_ABLATE change
# does NOT invalidate its trace cache, so without clearing caches every
# "ablation" silently re-times the FULL kernel (this poisoned the r4
# ablation numbers). jax.clear_caches() forces a retrace per variant.
for ab in (
    frozenset(),
    frozenset({"const_scales"}),
    frozenset({"no_exp"}),
    frozenset({"no_bd"}),
    frozenset({"no_pv"}),
    frozenset({"no_scores"}),
    frozenset({"no_pv", "no_scores"}),
    frozenset({"no_unpack"}),
    frozenset({"const_scales", "no_exp", "no_bd"}),
    frozenset({"skeleton"}),
    frozenset({"skeleton", "const_scales"}),
    frozenset({"no_scores", "no_pv", "no_exp", "no_bd", "const_scales"}),
    frozenset({"no_scores", "no_exp", "no_bd", "const_scales"}),
    frozenset({"no_pv", "no_exp", "no_bd", "const_scales"}),
):
    da.DEBUG_ABLATE = ab
    jax.clear_caches()
    try:
        bench(f"ablate={{{','.join(sorted(ab)) or '-'}}}")
    except Exception as e:
        print(f"ablate={sorted(ab)}: FAILED {str(e)[:120]}", flush=True)
da.DEBUG_ABLATE = frozenset()
