"""Probe: jax's ragged_paged_attention on our decode shape (ceiling check).

Measures the official TPU kernel (combined-KV-head pages, static KV scales)
on the bench decode shape: B=256 seqs x 1 q token, len 800, GQA 16/8, hd 128.
"""
import argparse
import functools
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.ragged_paged_attention.kernel import (
    ragged_paged_attention,
)

ap = argparse.ArgumentParser()
ap.add_argument("--kv", default="int8", choices=["bf16", "int8"])
ap.add_argument("--len", type=int, default=800)
ap.add_argument("--ps", type=int, default=128)
ap.add_argument("--iters", type=int, default=56)
ap.add_argument("--num-pages", type=int, default=2048)
ap.add_argument("--kv-pages-per-block", type=int, default=0)
ap.add_argument("--q-per-block", type=int, default=0)
args = ap.parse_args()

B, nq, nkv, hd, ps = 256, 16, 8, 128, args.ps
W = 4096 // ps
rng = np.random.default_rng(0)
kv_dtype = jnp.int8 if args.kv == "int8" else jnp.bfloat16
if args.kv == "int8":
    kv_pages = jnp.asarray(
        rng.integers(-127, 128, (args.num_pages, ps, 2 * nkv, hd)), jnp.int8
    )
    kscale = vscale = 0.02
else:
    kv_pages = jnp.asarray(
        rng.standard_normal((args.num_pages, ps, 2 * nkv, hd)), jnp.bfloat16
    )
    kscale = vscale = None

q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.bfloat16)
scale = 1.0 / np.sqrt(hd)
pages_per = -(-args.len // ps)
pt = np.zeros((B, W), np.int32)
for i in range(B):
    pt[i, :pages_per] = (np.arange(pages_per) + i * pages_per) % args.num_pages
pt = jnp.asarray(pt)
kv_lens = jnp.full(B, args.len, jnp.int32)
cu_q_lens = jnp.arange(B + 1, dtype=jnp.int32)
num_seqs = jnp.array([B], jnp.int32)

kw = {}
if args.kv_pages_per_block:
    kw["num_kv_pages_per_block"] = args.kv_pages_per_block
if args.q_per_block:
    kw["num_queries_per_block"] = args.q_per_block


@functools.partial(jax.jit, static_argnums=(6,))
def many(q, kv_pages, kv_lens, pt, cu_q_lens, num_seqs, iters):
    def body(carry, _):
        o = ragged_paged_attention(
            carry, kv_pages, kv_lens, pt, cu_q_lens, num_seqs,
            sm_scale=scale, k_scale=kscale, v_scale=vscale, **kw,
        )
        return o.astype(carry.dtype), ()
    out, _ = jax.lax.scan(body, q, None, length=iters)
    return out.sum()


float(many(q, kv_pages, kv_lens, pt, cu_q_lens, num_seqs, args.iters))
float(many(q, kv_pages, kv_lens, pt, cu_q_lens, num_seqs, 2 * args.iters))
t0 = time.perf_counter()
float(many(q, kv_pages, kv_lens, pt, cu_q_lens, num_seqs, args.iters))
t1 = time.perf_counter()
float(many(q, kv_pages, kv_lens, pt, cu_q_lens, num_seqs, 2 * args.iters))
t2 = time.perf_counter()
per_pass = max(((t2 - t1) - (t1 - t0)) / args.iters, 1e-9)
gb = B * pages_per * ps * nkv * hd * 2 * kv_pages.dtype.itemsize / 1e9
print(
    f"rpa {args.kv} ps={ps} len={args.len}: {per_pass*1e3:7.3f} ms/pass "
    f"({gb:.3f} GB -> {gb/per_pass:6.1f} GB/s)",
    flush=True,
)
