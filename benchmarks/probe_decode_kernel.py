"""Microbench: paged decode attention kernel in isolation on the real chip.

Times N back-to-back kernel passes inside one jit (so tunnel RTT and H2D are
amortised), at several occupancies and KV dtypes. Usage:
    python t_probe_kernel.py [--kv fp8|bf16] [--len 800] [--iters 56]
"""
import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.ops.pallas.decode_attention import paged_decode_attention_pallas

ap = argparse.ArgumentParser()
ap.add_argument("--kv", default="bf16",
                choices=["bf16", "fp8", "int8", "int4"])
ap.add_argument("--len", type=int, default=800)
ap.add_argument("--iters", type=int, default=56)  # 2 x num_layers
ap.add_argument("--num-pages", type=int, default=8192)
ap.add_argument("--ps", type=int, default=16)
ap.add_argument("--random-pages", action="store_true")
args = ap.parse_args()

B, nq, nkv, hd, ps = 256, 16, 8, 128, args.ps
W = 4096 // ps
kv_dtype = {
    "fp8": jnp.float8_e4m3fn, "int8": jnp.int8, "bf16": jnp.bfloat16,
    "int4": jnp.int8,
}[args.kv]
L = 1  # single layer slice; layer arg indexes it

rng = np.random.default_rng(0)
if args.kv in ("int8", "int4"):
    s128 = -(-args.num_pages * ps // 128)
    if args.kv == "int4":
        vals = jnp.asarray(
            rng.integers(-120, 128, (L, 2, args.num_pages, ps, nkv // 2, hd)),
            jnp.int8,
        )
    else:
        vals = jnp.asarray(
            rng.integers(-127, 128, (L, 2, args.num_pages, ps, nkv, hd)),
            jnp.int8,
        )
    kv_pool = {
        "kv": vals,
        "scale": jnp.asarray(
            rng.uniform(0.01, 0.03, (L, 2, s128, 128)), jnp.float32
        ),
    }
    if args.kv == "int4":
        kv_pool["p4"] = jnp.zeros((0,), jnp.int8)
else:
    kv_pool = jnp.asarray(
        rng.standard_normal((L, 2, args.num_pages, ps, nkv, hd), np.float32),
        kv_dtype,
    )
q = jnp.asarray(rng.standard_normal((B, nq, hd), np.float32), jnp.bfloat16)
scale = 1.0 / np.sqrt(hd)

pages_per = -(-args.len // ps)
pt = np.zeros((B, W), np.int32)
if getattr(args, "random_pages", False):
    perm = rng.permutation(args.num_pages)
    for i in range(B):
        pt[i, :pages_per] = perm[(np.arange(pages_per) + i * pages_per) % args.num_pages]
else:
    for i in range(B):
        pt[i, :pages_per] = (np.arange(pages_per) + i * pages_per) % args.num_pages
pt = jnp.asarray(pt)


def bench(active):
    lens = np.zeros(B, np.int32)
    lens[:active] = args.len
    lens_d = jnp.asarray(lens)

    @functools.partial(jax.jit, static_argnums=(4,))
    def many(q, kv_pool, pt, lens, iters):
        def body(carry, _):
            qq = carry
            o = paged_decode_attention_pallas(
                qq, kv_pool, pt, lens, scale, layer=0
            )
            return o, ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out.sum()

    # block_until_ready through the axon tunnel does not actually sync;
    # force a host transfer (float()) and difference two iteration counts
    # to cancel the fixed RTT + dispatch cost.
    float(many(q, kv_pool, pt, lens_d, args.iters))       # warm/compile
    float(many(q, kv_pool, pt, lens_d, 2 * args.iters))   # warm/compile
    t0 = time.perf_counter()
    float(many(q, kv_pool, pt, lens_d, args.iters))
    t1 = time.perf_counter()
    float(many(q, kv_pool, pt, lens_d, 2 * args.iters))
    t2 = time.perf_counter()
    per_pass = ((t2 - t1) - (t1 - t0)) / args.iters
    per_pass = max(per_pass, 1e-9)
    vals_arr = kv_pool["kv"] if isinstance(kv_pool, dict) else kv_pool
    row_bytes = vals_arr.shape[-2] * hd * vals_arr.dtype.itemsize
    gb = active * pages_per * ps * 2 * row_bytes / 1e9
    print(
        f"active={active:4d} len={args.len}: {per_pass*1e3:7.3f} ms/pass "
        f"({gb:.3f} GB -> {gb/per_pass:6.1f} GB/s)",
        flush=True,
    )


for a in (256, 128, 64, 32, 8):
    bench(a)
