"""Isolate decode-kernel costs: pure chunk DMA vs DMA+convert vs DMA+dot.

Streams the same chunk schedule as the decode kernel (C pages per chunk,
double-buffered) over a fake pool, with compute toggled by --mode.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ap = argparse.ArgumentParser()
ap.add_argument("--kv", default="bf16", choices=["bf16", "fp8", "int8"])
ap.add_argument("--mode", default="dma",
                choices=["dma", "convert", "dot", "dot8"])
ap.add_argument("--chunks", type=int, default=800)  # chunks per pass
ap.add_argument("--cp", type=int, default=16)       # pages per chunk
ap.add_argument("--iters", type=int, default=20)
args = ap.parse_args()

ps, nkv, hd, nq = 16, 8, 128, 16
C = args.cp
kv_dtype = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8,
            "bf16": jnp.bfloat16}[args.kv]
P = 4096

rng = np.random.default_rng(0)
pool = jnp.asarray(
    rng.standard_normal((1, 2, P, ps, nkv, hd), np.float32), kv_dtype
)
q = jnp.asarray(rng.standard_normal((nq, nkv * hd), np.float32), jnp.bfloat16)


def kernel(q_ref, kv_ref, o_ref, kvbuf, sem, acc, *, mode, nchunks):
    def start(slot, c):
        pltpu.make_async_copy(
            kv_ref.at[0, :, pl.ds((c * C) % (P - C), C)],
            kvbuf.at[:, slot], sem.at[slot],
        ).start()

    def wait(slot):
        pltpu.make_async_copy(
            kv_ref.at[0, :, pl.ds(0, C)], kvbuf.at[:, slot], sem.at[slot]
        ).wait()

    acc[...] = jnp.zeros_like(acc)
    start(0, 0)

    def body(c, slot):
        @pl.when(c + 1 < nchunks)
        def _():
            start(1 - slot, c + 1)
        wait(slot)
        if mode == "dot8":
            # all-int8 chunk compute: q8 @ k8^T -> int32 scores; softmax-ish
            # probs quantized to int8; p8 @ v8 -> int32 accum
            k8 = kvbuf[0, slot].reshape(C * ps, nkv * hd)
            v8 = kvbuf[1, slot].reshape(C * ps, nkv * hd)
            q8 = jnp.clip(q_ref[:] * 16.0, -127, 127).astype(jnp.int8)
            sc = jax.lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            p = jnp.exp(sc * (1.0 / 2048.0) - 1.0)
            p8 = jnp.clip(p * 127.0, -127, 127).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p8, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc[...] += pv.astype(jnp.float32) * (1.0 / 127.0)
        elif mode != "dma":
            k = kvbuf[0, slot].reshape(C * ps, nkv * hd).astype(jnp.bfloat16)
            v = kvbuf[1, slot].reshape(C * ps, nkv * hd).astype(jnp.bfloat16)
            if mode == "dot":
                sc = jax.lax.dot_general(
                    q_ref[:], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                pv = jax.lax.dot_general(
                    jnp.exp(sc - 1.0).astype(jnp.bfloat16), v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc[...] += pv
            else:
                acc[...] += k[: nq].astype(jnp.float32)
                acc[...] += v[: nq].astype(jnp.float32)
        return 1 - slot

    jax.lax.fori_loop(0, nchunks, body, jnp.int32(0))
    o_ref[...] = acc[...].astype(o_ref.dtype)


def run(iters):
    f = pl.pallas_call(
        functools.partial(kernel, mode=args.mode, nchunks=args.chunks),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, nkv * hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, C, ps, nkv, hd), kv_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((nq, nkv * hd), jnp.float32),
        ],
    )

    @functools.partial(jax.jit, static_argnums=(2,))
    def many(q, pool, n):
        # feed the output back as q so the scan body is NOT loop-invariant
        # (XLA hoists invariant pallas_calls out of the loop)
        def body(carry, _):
            out = f(carry, pool)
            return (carry + out * 1e-9).astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out.sum()

    float(many(q, pool, iters))
    float(many(q, pool, 2 * iters))
    t0 = time.perf_counter()
    float(many(q, pool, iters))
    t1 = time.perf_counter()
    float(many(q, pool, 2 * iters))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / iters
    gb = args.chunks * C * ps * nkv * hd * 2 * pool.dtype.itemsize / 1e9
    print(f"kv={args.kv} mode={args.mode} C={C}: {per*1e3:8.3f} ms/pass, "
          f"{gb:.3f} GB -> {gb/max(per,1e-9):6.1f} GB/s", flush=True)


run(args.iters)
