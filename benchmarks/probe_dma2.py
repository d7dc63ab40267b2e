"""Pure-DMA streaming rate vs buffer depth for the decode access pattern.

Streams the decode kernel's page schedule (GS sequences' pages per chunk,
K+V planes) from a pool into a VMEM ring of NSLOTS slots, no compute.
Answers: is the kernel's ~560 GB/s a DMA-pipeline-depth limit?
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=56)
ap.add_argument("--nkv", type=int, default=8,
                help="4 emulates the int4 pool's packed (half-width) rows")
args = ap.parse_args()

ps, nkv, hd = 128, args.nkv, 128
B, GS, PAGES_PER = 256, 8, 7
P = 2048
D = nkv * hd

pool = jnp.zeros((2, P, ps, nkv, hd), jnp.int8)
pt = np.zeros((B, 32), np.int32)
for i in range(B):
    pt[i, :PAGES_PER] = (np.arange(PAGES_PER) + i * PAGES_PER) % P
pt = jnp.asarray(pt)


def make_kernel(NSLOTS, C, with_scales):
    ngroups = B // GS
    CT = C * ps

    def kernel(pt_ref, pool_ref, out_ref, kbuf, vbuf, sem):
        def start_chunk(grp, chunk, slot):
            base = grp * GS
            for si in range(GS):
                for j in range(C):
                    pg = chunk * C + j

                    @pl.when(pg < PAGES_PER)
                    def _():
                        page = pt_ref[base + si, pg]
                        pltpu.make_async_copy(
                            pool_ref.at[0, page],
                            kbuf.at[slot, pl.ds(j * ps, ps), si],
                            sem.at[si, slot],
                        ).start()
                        pltpu.make_async_copy(
                            pool_ref.at[1, page],
                            vbuf.at[slot, si, pl.ds(j * ps, ps)],
                            sem.at[si, slot],
                        ).start()

        def wait_chunk(chunk, slot):
            for si in range(GS):
                for j in range(C):
                    pg = chunk * C + j

                    @pl.when(pg < PAGES_PER)
                    def _():
                        pltpu.make_async_copy(
                            pool_ref.at[0, 0],
                            kbuf.at[slot, pl.ds(0, ps), si],
                            sem.at[si, slot],
                        ).wait()
                        pltpu.make_async_copy(
                            pool_ref.at[0, 0],
                            vbuf.at[slot, si, pl.ds(0, ps)],
                            sem.at[si, slot],
                        ).wait()

        nch = -(-PAGES_PER // C)
        FL = ngroups * nch  # flat (group, chunk) schedule

        def flat(i):
            return i // nch, jax.lax.rem(i, nch)

        depth = NSLOTS - 1

        def body(i, acc):
            g2, c2 = flat(jnp.minimum(i + depth, FL - 1))

            @pl.when(i + depth < FL)
            def _():
                start_chunk(g2, c2, jax.lax.rem(i + depth, NSLOTS))
            g, c = flat(i)
            slot = jax.lax.rem(i, NSLOTS)
            wait_chunk(c, slot)
            return acc + 1

        for i in range(depth):
            g, c = flat(jnp.int32(i))
            start_chunk(g, c, jax.lax.rem(jnp.int32(i), NSLOTS))
        acc = jax.lax.fori_loop(0, FL, body, jnp.int32(0))
        out_ref[0] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, CT, GS, nkv, hd), jnp.int8),
            pltpu.VMEM((NSLOTS, GS, CT, nkv, hd), jnp.int8),
            pltpu.SemaphoreType.DMA((GS, NSLOTS)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def bench(NSLOTS, C):
    call = make_kernel(NSLOTS, C, False)

    @functools.partial(jax.jit, static_argnums=(2,))
    def many(pt, pool, iters):
        def body(carry, _):
            o = call(pt, pool)
            return carry + o[0], ()
        out, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return out

    float(many(pt, pool, args.iters))
    float(many(pt, pool, 2 * args.iters))
    t0 = time.perf_counter()
    float(many(pt, pool, args.iters))
    t1 = time.perf_counter()
    float(many(pt, pool, 2 * args.iters))
    t2 = time.perf_counter()
    per = max(((t2 - t1) - (t1 - t0)) / args.iters, 1e-9)
    gb = B * PAGES_PER * ps * D / 1e9 * 1  # K+V int8... 2 planes x ps x D/2
    gb = B * PAGES_PER * 2 * ps * nkv * hd / 1e9
    print(f"NSLOTS={NSLOTS} C={C}: {per*1e3:7.3f} ms/pass ({gb/per:6.1f} GB/s)",
          flush=True)


for NSLOTS, C in ((2, 1), (3, 1), (4, 1), (2, 2), (4, 2), (6, 1), (8, 1)):
    try:
        bench(NSLOTS, C)
    except Exception as e:
        print(f"NSLOTS={NSLOTS} C={C}: FAILED {str(e)[:130]}", flush=True)
