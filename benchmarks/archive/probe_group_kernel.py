"""Prototype: GROUP-BATCHED paged decode attention kernel.

Hypothesis (from probe_steps / probe_decode_kernel): the production kernel's
chunk loop is latency-serialized — each chunk iteration costs ~5 us of
dependent issue/wait/compute latency regardless of bytes, because one
sequence's online-softmax chain (DMA wait -> scores dot -> max/exp -> requant
-> PV dot -> acc update) is a serial dependency chain and Mosaic does not
software-pipeline across fori iterations.

Fix prototyped here: process GS sequences per chunk iteration, unrolled in
the kernel body. The GS chains are mutually independent, so the scheduler
can interleave them (ILP), amortising the per-iteration latency GS ways.

Usage: python benchmarks/probe_group_kernel.py --kv int8 --ps 128 --len 800
"""
import argparse
import functools
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
VMEM_BUDGET = 8 * 1024 * 1024


def _group_kernel(*refs, ps, nkv, hd, nq, scale, GS, ngroups, C, quant, ablate):
    if quant:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref, scales_ref,
         o_ref, kvbuf, sem, sbuf, ssem, qbd, qs, acc, m, l) = refs
    else:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref,
         o_ref, kvbuf, sem, qbd, acc, m, l) = refs
        scales_ref = sbuf = ssem = qs = None

    layer = layer_ref[0]
    g = nq // nkv
    CT = C * ps
    CR = max(1, CT // 128)

    head_of_q = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 0) // g
    kv_head = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 1)
    onehot = (head_of_q == kv_head).astype(jnp.float32)  # [nq, nkv]

    def npages_of(row):
        return pl.cdiv(seq_lens_ref[row], ps)

    def start_chunk(si, slot, row, chunk):
        """Issue the page DMAs of chunk `chunk` of sequence-row `row` into
        lane si of the group buffer (guarded per page)."""
        npg = npages_of(row)
        full = (npg - chunk * C) >= C

        def issue(j):
            page = page_table_ref[row, chunk * C + j]
            pltpu.make_async_copy(
                kv_ref.at[layer, :, page], kvbuf.at[si, slot, :, j],
                sem.at[si, slot],
            ).start()
            if quant:
                pltpu.make_async_copy(
                    scales_ref.at[layer, :, page],
                    sbuf.at[si, slot, :, j],
                    ssem.at[si, slot],
                ).start()

        @pl.when(full)
        def _():
            for j in range(C):
                issue(j)

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):
                @pl.when(chunk * C + j < npg)
                def _():
                    issue(j)
                if not quant:
                    @pl.when(chunk * C + j >= npg)
                    def _():
                        kvbuf[si, slot, 1, j] = jnp.zeros(
                            (ps, nkv, hd), kvbuf.dtype
                        )

    def wait_chunk(si, slot, row, chunk):
        npg = npages_of(row)
        full = (npg - chunk * C) >= C

        @pl.when(full)
        def _():
            pltpu.make_async_copy(
                kv_ref.at[0, :, pl.ds(0, C)], kvbuf.at[si, slot],
                sem.at[si, slot],
            ).wait()
            if quant:
                pltpu.make_async_copy(
                    scales_ref.at[0, :, pl.ds(0, C)], sbuf.at[si, slot],
                    ssem.at[si, slot],
                ).wait()

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):
                @pl.when(chunk * C + j < npg)
                def _():
                    pltpu.make_async_copy(
                        kv_ref.at[0, :, 0], kvbuf.at[si, slot, :, j],
                        sem.at[si, slot],
                    ).wait()
                    if quant:
                        pltpu.make_async_copy(
                            scales_ref.at[0, :, 0], sbuf.at[si, slot, :, 0],
                            ssem.at[si, slot],
                        ).wait()

    def group_body(grp, carry):
        base = grp * GS
        rows = [base + si for si in range(GS)]
        lens = [seq_lens_ref[r] for r in rows]
        nch = [pl.cdiv(pl.cdiv(L, ps), C) for L in lens]
        nch_max = functools.reduce(jnp.maximum, nch)

        # stage q (block-diagonal) + init softmax state, per live seq
        for si, r in enumerate(rows):
            @pl.when(lens[si] > 0)
            def _(si=si, r=r):
                qf = q_ref[r].astype(jnp.float32)
                qbd_si = (qf[:, None, :] * onehot[:, :, None]).reshape(
                    nq, nkv * hd
                )
                if quant:
                    s = jnp.maximum(
                        jnp.max(jnp.abs(qbd_si), axis=1, keepdims=True) / 127.0,
                        1e-30,
                    )
                    qs[si] = s
                    qbd[si] = jnp.round(qbd_si / s).astype(jnp.int8)
                else:
                    qbd[si] = qbd_si.astype(kvbuf.dtype)
                m[si] = jnp.full((nq, 1), NEG_INF, jnp.float32)
                l[si] = jnp.zeros((nq, 1), jnp.float32)
                acc[si] = jnp.zeros((nq, nkv * hd), jnp.float32)
                start_chunk(si, 0, r, 0)

        def chunk_body(c, ccarry):
            slot = jax.lax.rem(c, 2)
            # prefetch c+1 for every seq that still needs it
            for si, r in enumerate(rows):
                @pl.when(c + 1 < nch[si])
                def _(si=si, r=r):
                    start_chunk(si, 1 - slot, r, c + 1)
            # process chunk c of every live seq (independent chains -> ILP)
            for si, r in enumerate(rows):
                @pl.when(c < nch[si])
                def _(si=si, r=r):
                    wait_chunk(si, slot, r, c)
                    L = lens[si]
                    if ablate == "dma":
                        # consume one vreg of the buffer so nothing is elided
                        m[si] = jnp.maximum(
                            m[si],
                            kvbuf[si, slot, 0, 0, 0, :1].astype(jnp.float32)
                            .reshape(1, 1) + jnp.zeros((nq, 1), jnp.float32),
                        )
                        return
                    if quant:
                        k8 = kvbuf[si, slot, 0].reshape(CT, nkv * hd)
                        sc_i = jax.lax.dot_general(
                            qbd[si], k8,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                        kcol = sbuf[si, slot, 0].reshape(1, CT)
                        sc = sc_i.astype(jnp.float32) * (qs[si] * scale) * kcol
                    else:
                        k = kvbuf[si, slot, 0].reshape(CT, nkv * hd)
                        sc = jax.lax.dot_general(
                            qbd[si], k,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) * scale
                    if ablate == "scores":
                        m[si] = jnp.maximum(
                            m[si], jnp.max(sc, axis=1, keepdims=True)
                        )
                        return
                    pos = c * CT + jax.lax.broadcasted_iota(
                        jnp.int32, (nq, CT), 1
                    )
                    sc = jnp.where(pos < L, sc, NEG_INF)
                    if ablate == "mask":
                        m[si] = jnp.maximum(
                            m[si], jnp.max(sc, axis=1, keepdims=True)
                        )
                        return
                    m_prev = m[si]
                    m_new = jnp.maximum(
                        m_prev, jnp.max(sc, axis=1, keepdims=True)
                    )
                    corr = jnp.exp(m_prev - m_new)
                    p = jnp.exp(sc - m_new)
                    l[si] = l[si] * corr + jnp.sum(p, axis=1, keepdims=True)
                    if ablate == "softmax":
                        m[si] = m_new
                        return
                    if quant:
                        vcol = sbuf[si, slot, 1].reshape(1, CT)
                        vcol = jnp.where(
                            c * CT + jax.lax.broadcasted_iota(
                                jnp.int32, (1, CT), 1) < L,
                            vcol, 0.0,
                        )
                        pf = p * vcol
                        pscale = jnp.maximum(
                            jnp.max(pf, axis=1, keepdims=True) / 127.0, 1e-30
                        )
                        p8 = jnp.round(pf / pscale).astype(jnp.int8)
                        if ablate == "requant":
                            m[si] = m_new
                            acc[si] = acc[si] * corr
                            l[si] = l[si] + p8[:, :1].astype(jnp.float32)
                            return
                        v8 = kvbuf[si, slot, 1].reshape(CT, nkv * hd)
                        pv = jax.lax.dot_general(
                            p8, v8,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.float32) * pscale
                    else:
                        v = kvbuf[si, slot, 1].reshape(CT, nkv * hd)
                        pv = jax.lax.dot_general(
                            p.astype(v.dtype), v,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    acc[si] = acc[si] * corr + pv
                    m[si] = m_new
            return ccarry

        jax.lax.fori_loop(0, nch_max, chunk_body, 0)

        for si, r in enumerate(rows):
            @pl.when(lens[si] > 0)
            def _(si=si, r=r):
                a = acc[si].reshape(nq, nkv, hd)
                out = jnp.sum(a * onehot[:, :, None], axis=1)
                o_ref[r] = (out / jnp.maximum(l[si], 1e-30)).astype(o_ref.dtype)

            @pl.when(lens[si] == 0)
            def _(si=si, r=r):
                o_ref[r] = jnp.zeros((nq, hd), o_ref.dtype)

        return carry

    jax.lax.fori_loop(0, ngroups, group_body, 0)


@functools.partial(
    jax.jit, static_argnames=("scale", "GS", "interpret", "ablate")
)
def group_decode_attention(q, kv_pool, page_table, seq_lens, scale,
                           layer=0, GS=8, interpret=False, ablate="none"):
    quant = isinstance(kv_pool, dict)
    vals = kv_pool["kv"] if quant else kv_pool
    B, nq, hd = q.shape
    _, _, P, ps, nkv, _ = vals.shape
    itemsize = jnp.dtype(vals.dtype).itemsize
    CT = VMEM_BUDGET // (GS * 2 * 2 * nkv * hd * itemsize)
    CT = max(ps, CT // ps * ps)
    C = CT // ps
    ngroups = B // GS
    if quant:
        assert ps == 128

    kernel = functools.partial(
        _group_kernel, ps=ps, nkv=nkv, hd=hd, nq=nq, scale=scale, GS=GS,
        ngroups=ngroups, C=C, quant=quant, ablate=ablate,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [page_table, seq_lens, jnp.asarray(layer, jnp.int32).reshape(1),
                q, vals]
    scratch = [
        pltpu.VMEM((GS, 2, 2, C, ps, nkv, hd), vals.dtype),
        pltpu.SemaphoreType.DMA((GS, 2)),
    ]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(kv_pool["scale"])
        scratch += [
            pltpu.VMEM((GS, 2, 2, C, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((GS, 2)),
            pltpu.VMEM((GS, nq, nkv * hd), jnp.int8),
            pltpu.VMEM((GS, nq, 1), jnp.float32),
        ]
    else:
        scratch.append(pltpu.VMEM((GS, nq, nkv * hd), vals.dtype))
    scratch += [
        pltpu.VMEM((GS, nq, nkv * hd), jnp.float32),
        pltpu.VMEM((GS, nq, 1), jnp.float32),
        pltpu.VMEM((GS, nq, 1), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nq, hd), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--len", type=int, default=800)
    ap.add_argument("--iters", type=int, default=56)
    ap.add_argument("--num-pages", type=int, default=2048)
    ap.add_argument("--ps", type=int, default=128)
    ap.add_argument("--gs", type=int, default=8)
    ap.add_argument("--check", action="store_true",
                    help="compare against the XLA reference (small case)")
    ap.add_argument("--ablate", default="none",
                    choices=["none", "dma", "scores", "mask", "softmax",
                             "requant"])
    args = ap.parse_args()

    B, nq, nkv, hd, ps = 256, 16, 8, 128, args.ps
    W = 4096 // ps
    rng = np.random.default_rng(0)
    L = 1
    if args.kv == "int8":
        s128 = -(-args.num_pages * ps // 128)
        kv_pool = {
            "kv": jnp.asarray(
                rng.integers(-127, 128, (L, 2, args.num_pages, ps, nkv, hd)),
                jnp.int8,
            ),
            "scale": jnp.asarray(
                rng.uniform(0.01, 0.03, (L, 2, s128, 128)), jnp.float32
            ),
        }
    else:
        kv_pool = jnp.asarray(
            rng.standard_normal((L, 2, args.num_pages, ps, nkv, hd)),
            jnp.bfloat16,
        )
    q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.bfloat16)
    scale = 1.0 / np.sqrt(hd)
    pages_per = -(-args.len // ps)
    pt = np.zeros((B, W), np.int32)
    for i in range(B):
        pt[i, :pages_per] = (np.arange(pages_per) + i * pages_per) % args.num_pages
    pt = jnp.asarray(pt)

    if args.check:
        from nanovllmx_tpu.ops.attention import paged_decode_attention_xla

        lens = np.full(B, args.len, np.int32)
        lens[5] = 0
        lens[100] = 37
        lens_d = jnp.asarray(lens)
        got = group_decode_attention(
            q, kv_pool, pt, lens_d, scale, GS=args.gs
        )
        want = paged_decode_attention_xla(q, kv_pool, pt, lens_d, scale)
        want = np.where(
            (lens > 0)[:, None, None], np.asarray(want, np.float32), 0.0
        )
        err = np.abs(np.asarray(got, np.float32) - want).max()
        print("max |err| vs XLA:", err, flush=True)
        assert err < (0.12 if args.kv == "int8" else 0.02), err

    def bench(active):
        lens = np.zeros(B, np.int32)
        lens[:active] = args.len
        lens_d = jnp.asarray(lens)

        @functools.partial(jax.jit, static_argnums=(4,))
        def many(q, kv_pool, pt, lens, iters):
            def body(carry, _):
                o = group_decode_attention(
                    carry, kv_pool, pt, lens, scale, GS=args.gs,
                    ablate=args.ablate,
                )
                return o.astype(carry.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=iters)
            return out.sum()

        float(many(q, kv_pool, pt, lens_d, args.iters))
        float(many(q, kv_pool, pt, lens_d, 2 * args.iters))
        t0 = time.perf_counter()
        float(many(q, kv_pool, pt, lens_d, args.iters))
        t1 = time.perf_counter()
        float(many(q, kv_pool, pt, lens_d, 2 * args.iters))
        t2 = time.perf_counter()
        per_pass = max(((t2 - t1) - (t1 - t0)) / args.iters, 1e-9)
        itemsize = 1 if args.kv == "int8" else 2
        gb = active * pages_per * ps * nkv * hd * 2 * itemsize / 1e9
        print(
            f"GS={args.gs} ablate={args.ablate} active={active:4d} len={args.len}: "
            f"{per_pass*1e3:7.3f} ms/pass ({gb:.3f} GB -> "
            f"{gb/per_pass:6.1f} GB/s)",
            flush=True,
        )

    for a in (256,):
        bench(a)


if __name__ == "__main__":
    main()
