"""Sweep decode-attention kernel shape parameters (GS, CT) on the chip.

Monkeypatches the module globals (trace-time constants) and re-times the
kernel at B=256 len=800 int8 ps=128 — the bench's steady-state shape.
"""
import argparse
import functools
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

ap = argparse.ArgumentParser()
ap.add_argument("--len", type=int, default=800)
ap.add_argument("--iters", type=int, default=56)
ap.add_argument("--num-pages", type=int, default=2048)
ap.add_argument("--active", type=int, default=256)
args = ap.parse_args()

B, nq, nkv, hd, ps = 256, 16, 8, 128, 128
W = 4096 // ps
L = 1
rng = np.random.default_rng(0)
s128 = args.num_pages  # ps=128: one scale row per page
kv_pool = {
    "kv": jnp.zeros((L, 2, args.num_pages, ps, nkv, hd), jnp.int8),
    "scale": jnp.full((L, 2, s128, 128), 0.01, jnp.float32),
}
q = jnp.asarray(rng.standard_normal((B, nq, hd), np.float32), jnp.bfloat16)
scale = 1.0 / np.sqrt(hd)
pages_per = -(-args.len // ps)
pt = np.zeros((B, W), np.int32)
for i in range(B):
    pt[i, :pages_per] = (np.arange(pages_per) + i * pages_per) % args.num_pages
pt = jnp.asarray(pt)
lens = np.zeros(B, np.int32)
lens[: args.active] = args.len
lens_d = jnp.asarray(lens)


def bench(tag):
    # fresh jit wrapper per config (globals are trace-time constants)
    def many(q, kv_pool, pt, lens, iters):
        def body(carry, _):
            o = da.paged_decode_attention_pallas(
                carry, kv_pool, pt, lens, scale, layer=0
            )
            return o, ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out.sum()

    manyj = jax.jit(many, static_argnums=(4,))
    float(manyj(q, kv_pool, pt, lens_d, args.iters))
    float(manyj(q, kv_pool, pt, lens_d, 2 * args.iters))
    t0 = time.perf_counter()
    float(manyj(q, kv_pool, pt, lens_d, args.iters))
    t1 = time.perf_counter()
    float(manyj(q, kv_pool, pt, lens_d, 2 * args.iters))
    t2 = time.perf_counter()
    per = max(((t2 - t1) - (t1 - t0)) / args.iters, 1e-9)
    gb = args.active * pages_per * ps * nkv * hd * 2 * 1 / 1e9
    print(f"{tag:28s}: {per*1e3:7.3f} ms/pass  ({gb/per:6.1f} GB/s)",
          flush=True)


# numeric cross-check vs the default config on a small random pool
def crosscheck():
    Pc, Bc = 64, 16
    kvc = {
        "kv": jnp.asarray(
            rng.integers(-127, 128, (L, 2, Pc, ps, nkv, hd), endpoint=False).astype(np.int8)
        ),
        "scale": jnp.asarray(
            rng.uniform(0.005, 0.02, (L, 2, Pc, 128)).astype(np.float32)
        ),
    }
    qc = jnp.asarray(rng.standard_normal((Bc, nq, hd)), jnp.bfloat16)
    ptc = np.zeros((Bc, W), np.int32)
    for i in range(Bc):
        ptc[i, :4] = (np.arange(4) + i * 4) % Pc
    lc = np.full(Bc, 3 * ps + 17, np.int32)
    lc[-2:] = 0
    ref = None
    for GS, CT in ((8, 128), (4, 256), (2, 256), (1, 512)):
        da.SEQ_GROUP, da.MAX_CHUNK_TOKENS = GS, CT
        da.STAGE_VMEM_BYTES = max(
            8 * 1024 * 1024, 2 * 2 * GS * CT * nkv * hd + 1024
        )
        out = np.asarray(jax.jit(
            lambda q_, kv_, pt_, l_: da.paged_decode_attention_pallas(
                q_, kv_, pt_, l_, scale, layer=0
            )
        )(qc, kvc, jnp.asarray(ptc), jnp.asarray(lc)), np.float32)
        if ref is None:
            ref = out
            print("crosscheck ref GS=8 done", flush=True)
        else:
            err = np.max(np.abs(out - ref))
            print(f"crosscheck GS={GS} CT={CT}: max|diff|={err:.5f}",
                  flush=True)
            assert err < 0.05, err


if os.environ.get("CROSSCHECK", "1") == "1":
    crosscheck()

print(f"B={B} active={args.active} len={args.len}", flush=True)
for GS, CT in ((8, 128), (8, 256), (4, 256), (4, 512), (16, 128), (16, 256)):
    da.SEQ_GROUP = GS
    da.MAX_CHUNK_TOKENS = CT
    da.STAGE_VMEM_BYTES = max(8, 2 * 2 * GS * CT * nkv * hd // (1024 * 1024) + 1) * 1024 * 1024
    try:
        bench(f"GS={GS} CT={CT}")
    except Exception as e:
        print(f"GS={GS} CT={CT}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
