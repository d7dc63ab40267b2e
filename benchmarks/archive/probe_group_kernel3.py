"""Prototype v3: batched block-diagonal paged decode attention.

Ablation findings (probe_group_kernel --ablate, v5e, int8 ps=128 len=800):
pass = 2.40 ms of which scores dot ~0.6 ms, PV dot ~0.93 ms, softmax/requant
~0.2 ms, DMA ~0.65 ms. The per-sequence [16, .] MXU dots dominate: each pays
dispatch latency and pads M=16 -> 128 (8x waste).

v3 batches GS=8 sequences into ONE MXU dot per chunk iteration:
  * kvbuf layout [slots, planes, CT, GS, nkv*hd]: K plane reshapes to
    K_big [CT, GS*nkv*hd] with seq si's page tokens at column block si.
  * q_big [GS*nq, GS*nkv*hd] block-diagonal per sequence: scores_big =
    q_big @ K_big^T computes all GS sequences' scores in one dot with
    M = GS*nq = 128 — a full MXU tile, zero M padding.
  * PV: p8 [128, CT] @ V_big [CT, GS*nkv*hd] -> [128, GS*nkv*hd]; only the
    GS diagonal blocks are extracted (static slices) into the accumulator.
    The off-diagonal waste is MXU tiles, which the ablation shows are cheap
    relative to dispatches.
  * int8 per-token scales are preloaded whole-layer into VMEM (one 2 MB DMA
    per pass) and applied as per-page [1, 128] row multiplies on static lane
    slices — no per-page scale DMA, no lane relayout.

Usage: python benchmarks/probe_group_kernel3.py --len 800
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


def _kernel(*refs, ps, nkv, hd, nq, scale, GS, C, quant, ablate):
    if quant:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref, scales_ref,
         o_ref, kvbuf, sem, sall, ssem, qbd, qs, acc, m, l) = refs
    else:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref,
         o_ref, kvbuf, sem, qbd, acc, m, l) = refs
        scales_ref = sall = ssem = qs = None

    layer = layer_ref[0]
    g = nq // nkv
    D = nkv * hd
    CT = C * ps
    B = seq_lens_ref.shape[0]
    ngroups = B // GS
    M = GS * nq

    head_of_q = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 0) // g
    kv_head = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 1)
    onehot = (head_of_q == kv_head).astype(jnp.float32)  # [nq, nkv]

    # zero the block-diagonal q staging ONCE; groups rewrite only their
    # diagonal blocks afterwards
    qbd[...] = jnp.zeros_like(qbd)
    if quant:
        # whole-layer per-token scales -> VMEM (one descriptor, ~2 MB)
        pltpu.make_async_copy(scales_ref.at[layer], sall, ssem).start()
        pltpu.make_async_copy(scales_ref.at[0], sall, ssem).wait()

    def npages_of(row):
        return pl.cdiv(seq_lens_ref[row], ps)

    def start_chunk(si, slot, row, chunk):
        npg = npages_of(row)
        for j in range(C):
            @pl.when(chunk * C + j < npg)
            def _():
                page = page_table_ref[row, chunk * C + j]
                pltpu.make_async_copy(
                    kv_ref.at[layer, :, page],
                    kvbuf.at[slot, :, pl.ds(j * ps, ps), si],
                    sem.at[si, slot],
                ).start()

    def wait_chunk(si, slot, row, chunk):
        npg = npages_of(row)
        for j in range(C):
            @pl.when(chunk * C + j < npg)
            def _():
                pltpu.make_async_copy(
                    kv_ref.at[0, :, 0],
                    kvbuf.at[slot, :, pl.ds(0, ps), si],
                    sem.at[si, slot],
                ).wait()

    def group_body(grp, carry):
        base = grp * GS
        rows = [base + si for si in range(GS)]
        lens = [seq_lens_ref[r] for r in rows]
        nch = [pl.cdiv(pl.cdiv(L, ps), C) for L in lens]
        nch_max = functools.reduce(jnp.maximum, nch)

        # stage q into the diagonal blocks + init state + first DMA
        for si, r in enumerate(rows):
            @pl.when(lens[si] > 0)
            def _(si=si, r=r):
                if ablate == "nodma":
                    return
                qf = q_ref[r].astype(jnp.float32)
                qbd_si = (qf[:, None, :] * onehot[:, :, None]).reshape(nq, D)
                if quant:
                    s = jnp.maximum(
                        jnp.max(jnp.abs(qbd_si), axis=1, keepdims=True) / 127.0,
                        1e-30,
                    )
                    qs[pl.ds(si * nq, nq)] = s
                    qbd[pl.ds(si * nq, nq), pl.ds(si * D, D)] = jnp.round(
                        qbd_si / s
                    ).astype(qbd.dtype)
                else:
                    qbd[pl.ds(si * nq, nq), pl.ds(si * D, D)] = qbd_si.astype(
                        qbd.dtype
                    )
                start_chunk(si, 0, r, 0)
        m[...] = jnp.full_like(m, NEG_INF)
        l[...] = jnp.zeros_like(l)
        acc[...] = jnp.zeros_like(acc)

        # per-row valid length (rows grouped si*nq..) as [M, 1]
        lens_vec = jnp.concatenate(
            [jnp.full((nq, 1), L, jnp.int32) for L in lens], axis=0
        )

        def chunk_body(c, ccarry):
            slot = jax.lax.rem(c, 2)
            if ablate != "nodma":
                for si, r in enumerate(rows):
                    @pl.when(c + 1 < nch[si])
                    def _(si=si, r=r):
                        start_chunk(si, 1 - slot, r, c + 1)
                for si, r in enumerate(rows):
                    @pl.when(c < nch[si])
                    def _(si=si, r=r):
                        wait_chunk(si, slot, r, c)

            kbig = kvbuf[slot, 0].reshape(CT, GS * D)
            sc_i = jax.lax.dot_general(
                qbd[...], kbig,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )  # [M, CT]
            if quant:
                # per-(row, col) K scale matrix: row block si scales by seq
                # si's per-token scales (scatter-free construction: stack the
                # page rows, broadcast over the nq rows of each block)
                krows = jnp.concatenate([
                    jnp.concatenate([
                        sall[0, page_table_ref[rows[si], c * C + j]][None, :]
                        for j in range(C)
                    ], axis=1)
                    for si in range(GS)
                ], axis=0)  # [GS, CT]
                kmat = jnp.broadcast_to(
                    krows[:, None, :], (GS, nq, CT)
                ).reshape(M, CT)
                sc = sc_i.astype(jnp.float32) * (qs[...] * scale) * kmat
            else:
                sc = sc_i * scale

            if ablate == "dot":
                m[...] = jnp.maximum(m[...], jnp.max(sc, axis=1, keepdims=True))
                return ccarry
            pos = c * CT + jax.lax.broadcasted_iota(jnp.int32, (M, CT), 1)
            sc = jnp.where(pos < lens_vec, sc, NEG_INF)
            m_prev = m[...]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(sc - m_new)
            l[...] = l[...] * corr + jnp.sum(p, axis=1, keepdims=True)
            if ablate == "softmax":
                m[...] = m_new
                return ccarry

            if quant:
                # fold V column scales (same scatter-free construction)
                vrows = jnp.concatenate([
                    jnp.concatenate([
                        sall[1, page_table_ref[rows[si], c * C + j]][None, :]
                        for j in range(C)
                    ], axis=1)
                    for si in range(GS)
                ], axis=0)
                vmat = jnp.broadcast_to(
                    vrows[:, None, :], (GS, nq, CT)
                ).reshape(M, CT)
                pf = jnp.where(pos < lens_vec, p * vmat, 0.0)
                pscale = jnp.maximum(
                    jnp.max(pf, axis=1, keepdims=True) / 127.0, 1e-30
                )
                p8 = jnp.round(pf / pscale).astype(jnp.int8)
                if ablate == "requant":
                    m[...] = m_new
                    l[...] = l[...] + p8[:, :1].astype(jnp.float32)
                    return ccarry
                vbig = kvbuf[slot, 1].reshape(CT, GS * D)
                pv_big = jax.lax.dot_general(
                    p8, vbig,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [M, GS*D]
                for si in range(GS):
                    blk = pv_big[
                        si * nq:(si + 1) * nq, si * D:(si + 1) * D
                    ].astype(jnp.float32) * pscale[si * nq:(si + 1) * nq]
                    acc[pl.ds(si * nq, nq)] = (
                        acc[pl.ds(si * nq, nq)]
                        * corr[si * nq:(si + 1) * nq] + blk
                    )
            else:
                # zero masked columns explicitly: exp(NEG_INF - NEG_INF) = 1
                # on never-scored rows, and 0 * garbage-V must stay 0
                p = jnp.where(pos < lens_vec, p, 0.0)
                vbig = kvbuf[slot, 1].reshape(CT, GS * D)
                pv_big = jax.lax.dot_general(
                    p.astype(vbig.dtype), vbig,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for si in range(GS):
                    blk = pv_big[si * nq:(si + 1) * nq, si * D:(si + 1) * D]
                    acc[pl.ds(si * nq, nq)] = (
                        acc[pl.ds(si * nq, nq)]
                        * corr[si * nq:(si + 1) * nq] + blk
                    )
            m[...] = m_new
            return ccarry

        jax.lax.fori_loop(0, nch_max, chunk_body, 0)

        for si, r in enumerate(rows):
            @pl.when(lens[si] > 0)
            def _(si=si, r=r):
                a = acc[si * nq:(si + 1) * nq].reshape(nq, nkv, hd)
                out = jnp.sum(a * onehot[:, :, None], axis=1)
                out = out / jnp.maximum(l[si * nq:(si + 1) * nq], 1e-30)
                o_ref[r] = out.astype(o_ref.dtype)

            @pl.when(lens[si] == 0)
            def _(si=si, r=r):
                o_ref[r] = jnp.zeros((nq, hd), o_ref.dtype)

        return carry

    jax.lax.fori_loop(0, ngroups, group_body, 0)


@functools.partial(
    jax.jit, static_argnames=("scale", "GS", "C", "interpret", "ablate")
)
def decode_attention_v3(q, kv_pool, page_table, seq_lens, scale,
                        layer=0, GS=8, C=1, interpret=False, ablate="none"):
    quant = isinstance(kv_pool, dict)
    vals = kv_pool["kv"] if quant else kv_pool
    B, nq, hd = q.shape
    _, _, P, ps, nkv, _ = vals.shape
    D = nkv * hd
    CT = C * ps
    M = GS * nq
    if quant:
        assert ps % 128 == 0

    kernel = functools.partial(
        _kernel, ps=ps, nkv=nkv, hd=hd, nq=nq, scale=scale, GS=GS, C=C,
        quant=quant, ablate=ablate,
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
    mxu_t = jnp.int8 if quant else vals.dtype
    scratch = [
        pltpu.VMEM((2, 2, CT, GS, nkv, hd), vals.dtype),
        pltpu.SemaphoreType.DMA((GS, 2)),
    ]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(kv_pool["scale"])
        S128 = kv_pool["scale"].shape[2]
        scratch += [
            pltpu.VMEM((2, S128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    scratch += [
        pltpu.VMEM((M, GS * D), mxu_t),  # block-diagonal q
    ]
    if quant:
        scratch.append(pltpu.VMEM((M, 1), jnp.float32))  # q row scales
    scratch += [
        pltpu.VMEM((M, D), jnp.float32),
        pltpu.VMEM((M, 1), jnp.float32),
        pltpu.VMEM((M, 1), jnp.float32),
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
    ap.add_argument("--c", type=int, default=1)
    ap.add_argument("--ablate", default="none", choices=["none", "nodma", "dot", "softmax", "requant"])
    args = ap.parse_args()

    B, nq, nkv, hd, ps = 256, 16, 8, 128, args.ps
    W = 4096 // ps
    P = args.num_pages
    rng = np.random.default_rng(0)
    if args.kv == "int8":
        s128 = -(-P * ps // 128)
        kv_pool = {
            "kv": jnp.asarray(
                rng.integers(-127, 128, (1, 2, P, ps, nkv, hd)), jnp.int8
            ),
            "scale": jnp.asarray(
                rng.uniform(0.01, 0.03, (1, 2, s128, 128)), jnp.float32
            ),
        }
    else:
        kv_pool = jnp.asarray(
            rng.standard_normal((1, 2, P, ps, nkv, hd)), jnp.bfloat16
        )
    q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.bfloat16)
    scale = 1.0 / np.sqrt(hd)
    pages_per = -(-args.len // ps)
    pt = np.zeros((B, W), np.int32)
    for i in range(B):
        pt[i, :pages_per] = (np.arange(pages_per) + i * pages_per) % P
    pt = jnp.asarray(pt)

    def bench(active):
        lens = np.zeros(B, np.int32)
        lens[:active] = args.len
        lens_d = jnp.asarray(lens)

        @functools.partial(jax.jit, static_argnums=(4,))
        def many(q, kv_pool, pt, lens, iters):
            def body(carry, _):
                o = decode_attention_v3(
                    carry, kv_pool, pt, lens, scale, GS=args.gs, C=args.c,
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
            f"v3 {args.kv} GS={args.gs} C={args.c} ablate={args.ablate} "
            f"active={active:4d} "
            f"len={args.len}: {per_pass*1e3:7.3f} ms/pass "
            f"({gb:.3f} GB -> {gb/per_pass:6.1f} GB/s)",
            flush=True,
        )

    for a in (256, 64):
        bench(a)


if __name__ == "__main__":
    main()
