"""Sweep prefill-attention kernel parameters (CHUNK_TOKENS, BLOCK_Q) on chip.

Times the ragged kernel standalone at the bench's step shape: NT=2176,
4 sequences x 512 tokens, int8 pool, ps=128.
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

from nanovllmx_tpu.ops.pallas import prefill_attention as pa

nq, nkv, hd, ps = 16, 8, 128, 128
L, P, W = 1, 512, 32
S = 16          # metadata rows (padded)
NSEQ, TLEN = 4, 512
ITERS = 56
rng = np.random.default_rng(0)
kv_pool = {
    "kv": jnp.zeros((L, 2, P, ps, nkv, hd), jnp.int8),
    "scale": jnp.full((L, 2, P, 128), 0.01, jnp.float32),
}
scale = 1.0 / np.sqrt(hd)

q_indptr = np.zeros(S + 1, np.int32)
q_start = np.zeros(S, np.int32)
kv_lens = np.zeros(S, np.int32)
pt = np.zeros((S, W), np.int32)
off = 0
for i in range(NSEQ):
    q_indptr[i + 1] = off + TLEN
    q_start[i] = 0
    kv_lens[i] = TLEN
    npg = TLEN // ps
    pt[i, :npg] = np.arange(npg) + i * npg
    off += TLEN
q_indptr[NSEQ + 1:] = off
NT = off + 128
q = jnp.asarray(rng.standard_normal((NT, nq, hd)), jnp.bfloat16)
q_indptr = jnp.asarray(q_indptr)
q_start = jnp.asarray(q_start)
kv_lens = jnp.asarray(kv_lens)
pt = jnp.asarray(pt)


def bench(tag, block_q):
    def many(q, kv_pool, iters):
        def body(carry, _):
            o = pa.ragged_prefill_attention_pallas(
                carry, kv_pool, pt, q_indptr, q_start, kv_lens, scale,
                layer=0, block_q=block_q,
            )
            return o, ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out.sum()

    manyj = jax.jit(many, static_argnums=(2,))
    float(manyj(q, kv_pool, ITERS))
    float(manyj(q, kv_pool, 2 * ITERS))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(manyj(q, kv_pool, ITERS))
        t1 = time.perf_counter()
        float(manyj(q, kv_pool, 2 * ITERS))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / ITERS)
    per = max(min(ts), 1e-9)
    ntok = NSEQ * TLEN
    print(f"{tag:24s}: {per*1e3:7.3f} ms/pass "
          f"({per*28*1e3:6.1f} ms/28-layer step, "
          f"{ntok/(per*28):8.0f} tok/s-step)", flush=True)


for CT, BQ in ((256, 128), (512, 128), (512, 256), (1024, 256), (256, 256),
               (1024, 512)):
    pa.CHUNK_TOKENS = CT
    # the wrapper is @jax.jit'd: a CHUNK_TOKENS change does NOT invalidate
    # its trace cache (block_q does — it is a static arg). Without clearing,
    # every CT variant silently re-times the first-compiled kernel.
    jax.clear_caches()
    try:
        bench(f"CT={CT} BQ={BQ}", BQ)
    except Exception as e:
        print(f"CT={CT} BQ={BQ}: FAILED {str(e)[:140]}", flush=True)
