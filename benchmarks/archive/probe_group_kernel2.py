"""Prototype v2: grouped paged decode attention, descriptor-minimised.

Changes over probe_group_kernel (v1):
  * per-token int8 scales are PRELOADED whole-layer into VMEM once per kernel
    invocation (1 strided descriptor) instead of one scale DMA per page —
    halves the descriptor count of the int8 path.
  * optional combined-KV page layout [P, ps, 2*nkv, hd] (K heads then V
    heads): a page is one fully contiguous block -> simplest possible
    descriptor (vs the [2, ps, nkv, hd] strided 2-plane rectangle).
  * GS sequences per chunk iteration (independent chains -> ILP), as v1.

Usage: python benchmarks/probe_group_kernel2.py --layout combined --len 800
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


def _kernel(*refs, ps, nkv, hd, nq, scale, GS, ngroups, C, quant, combined):
    if quant:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref, scales_ref,
         o_ref, kvbuf, sem, sall, ssem, qbd, qs, acc, m, l) = refs
    else:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref,
         o_ref, kvbuf, sem, qbd, acc, m, l) = refs
        scales_ref = sall = ssem = qs = None

    layer = layer_ref[0]
    g = nq // nkv
    CT = C * ps
    SR = ps // 128  # 128-lane scale rows per page

    head_of_q = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 0) // g
    kv_head = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 1)
    onehot = (head_of_q == kv_head).astype(jnp.float32)  # [nq, nkv]

    if quant:
        # ONE descriptor: whole layer's K+V per-token scales -> VMEM
        pltpu.make_async_copy(
            scales_ref.at[layer], sall, ssem
        ).start()
        pltpu.make_async_copy(scales_ref.at[0], sall, ssem).wait()

    def npages_of(row):
        return pl.cdiv(seq_lens_ref[row], ps)

    def start_chunk(si, slot, row, chunk):
        npg = npages_of(row)
        full = (npg - chunk * C) >= C

        def issue(j):
            page = page_table_ref[row, chunk * C + j]
            if combined:
                src = kv_ref.at[layer, page]
            else:
                src = kv_ref.at[layer, :, page]
            pltpu.make_async_copy(
                src, kvbuf.at[si, slot, j], sem.at[si, slot]
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
                        if combined:
                            kvbuf[si, slot, j, :, nkv:] = jnp.zeros(
                                (ps, nkv, hd), kvbuf.dtype
                            )
                        else:
                            kvbuf[si, slot, j, 1] = jnp.zeros(
                                (ps, nkv, hd), kvbuf.dtype
                            )

    def wait_chunk(si, slot, row, chunk):
        npg = npages_of(row)
        full = (npg - chunk * C) >= C

        @pl.when(full)
        def _():
            if combined:
                ref = kv_ref.at[0, pl.ds(0, C)]
            else:
                ref = kv_ref.at[0, :, pl.ds(0, C)]
            pltpu.make_async_copy(
                ref, kvbuf.at[si, slot], sem.at[si, slot]
            ).wait()

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):
                @pl.when(chunk * C + j < npg)
                def _():
                    if combined:
                        ref = kv_ref.at[0, 0]
                    else:
                        ref = kv_ref.at[0, :, 0]
                    pltpu.make_async_copy(
                        ref, kvbuf.at[si, slot, j], sem.at[si, slot]
                    ).wait()

    def kbuf(si, slot):
        """[CT, nkv*hd] K operand from the chunk buffer."""
        if combined:
            return kvbuf[si, slot, :, :, :nkv].reshape(CT, nkv * hd)
        return kvbuf[si, slot, :, 0].reshape(CT, nkv * hd)

    def vbuf(si, slot):
        if combined:
            return kvbuf[si, slot, :, :, nkv:].reshape(CT, nkv * hd)
        return kvbuf[si, slot, :, 1].reshape(CT, nkv * hd)

    def scale_row(plane, row, chunk):
        """[1, CT] per-token scales of chunk `chunk`, from the VMEM-resident
        whole-layer scale buffer (dynamic page-row reads, no DMA)."""
        parts = []
        for j in range(C):
            page = page_table_ref[row, chunk * C + j]
            parts.append(sall[plane, page])  # [SR, 128]
        return jnp.concatenate(parts, axis=0).reshape(1, CT)

    def group_body(grp, carry):
        base = grp * GS
        rows = [base + si for si in range(GS)]
        lens = [seq_lens_ref[r] for r in rows]
        nch = [pl.cdiv(pl.cdiv(L, ps), C) for L in lens]
        nch_max = functools.reduce(jnp.maximum, nch)

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
            for si, r in enumerate(rows):
                @pl.when(c + 1 < nch[si])
                def _(si=si, r=r):
                    start_chunk(si, 1 - slot, r, c + 1)
            for si, r in enumerate(rows):
                @pl.when(c < nch[si])
                def _(si=si, r=r):
                    wait_chunk(si, slot, r, c)
                    L = lens[si]
                    if quant:
                        sc_i = jax.lax.dot_general(
                            qbd[si], kbuf(si, slot),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                        kcol = scale_row(0, r, c)
                        sc = sc_i.astype(jnp.float32) * (qs[si] * scale) * kcol
                    else:
                        sc = jax.lax.dot_general(
                            qbd[si], kbuf(si, slot),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) * scale
                    pos = c * CT + jax.lax.broadcasted_iota(
                        jnp.int32, (nq, CT), 1
                    )
                    sc = jnp.where(pos < L, sc, NEG_INF)
                    m_prev = m[si]
                    m_new = jnp.maximum(
                        m_prev, jnp.max(sc, axis=1, keepdims=True)
                    )
                    corr = jnp.exp(m_prev - m_new)
                    p = jnp.exp(sc - m_new)
                    l[si] = l[si] * corr + jnp.sum(p, axis=1, keepdims=True)
                    if quant:
                        vcol = scale_row(1, r, c)
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
                        pv = jax.lax.dot_general(
                            p8, vbuf(si, slot),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.float32) * pscale
                    else:
                        vv = vbuf(si, slot)
                        pv = jax.lax.dot_general(
                            p.astype(vv.dtype), vv,
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
    jax.jit, static_argnames=("scale", "GS", "combined", "interpret")
)
def decode_attention_v2(q, kv_pool, page_table, seq_lens, scale,
                        layer=0, GS=8, combined=False, interpret=False):
    quant = isinstance(kv_pool, dict)
    vals = kv_pool["kv"] if quant else kv_pool
    B, nq, hd = q.shape
    if combined:
        _, P, ps, nkv2, _ = vals.shape
        nkv = nkv2 // 2
    else:
        _, _, P, ps, nkv, _ = vals.shape
    itemsize = jnp.dtype(vals.dtype).itemsize
    CT = VMEM_BUDGET // (GS * 2 * 2 * nkv * hd * itemsize)
    CT = max(ps, CT // ps * ps)
    C = CT // ps
    ngroups = B // GS
    if quant:
        assert ps % 128 == 0

    kernel = functools.partial(
        _kernel, ps=ps, nkv=nkv, hd=hd, nq=nq, scale=scale, GS=GS,
        ngroups=ngroups, C=C, quant=quant, combined=combined,
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
    if combined:
        buf_shape = (GS, 2, C, ps, 2 * nkv, hd)
    else:
        buf_shape = (GS, 2, C, 2, ps, nkv, hd)
    scratch = [
        pltpu.VMEM(buf_shape, vals.dtype),
        pltpu.SemaphoreType.DMA((GS, 2)),
    ]
    if quant:
        # scale array [L, 2, P, SR, 128]: page p's rows at [:, p]
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(kv_pool["scale"])
        SR = ps // 128
        scratch += [
            pltpu.VMEM((2, P, SR, 128), jnp.float32),  # whole-layer scales
            pltpu.SemaphoreType.DMA(()),
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
    ap.add_argument("--layout", default="planes", choices=["planes", "combined"])
    ap.add_argument("--len", type=int, default=800)
    ap.add_argument("--iters", type=int, default=56)
    ap.add_argument("--num-pages", type=int, default=2048)
    ap.add_argument("--ps", type=int, default=128)
    ap.add_argument("--gs", type=int, default=8)
    args = ap.parse_args()

    B, nq, nkv, hd, ps = 256, 16, 8, 128, args.ps
    W = 4096 // ps
    rng = np.random.default_rng(0)
    combined = args.layout == "combined"
    P = args.num_pages
    if combined:
        shape = (1, P, ps, 2 * nkv, hd)
    else:
        shape = (1, 2, P, ps, nkv, hd)
    if args.kv == "int8":
        SR = ps // 128
        kv_pool = {
            "kv": jnp.asarray(rng.integers(-127, 128, shape), jnp.int8),
            "scale": jnp.asarray(
                rng.uniform(0.01, 0.03, (1, 2, P, SR, 128)), jnp.float32
            ),
        }
    else:
        kv_pool = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
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
                o = decode_attention_v2(
                    carry, kv_pool, pt, lens, scale, GS=args.gs,
                    combined=combined,
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
            f"v2 {args.kv} {args.layout} GS={args.gs} active={active:4d} "
            f"len={args.len}: {per_pass*1e3:7.3f} ms/pass "
            f"({gb:.3f} GB -> {gb/per_pass:6.1f} GB/s)",
            flush=True,
        )

    for a in (256, 128, 64):
        bench(a)


if __name__ == "__main__":
    main()
