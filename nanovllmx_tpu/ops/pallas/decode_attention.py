"""Pallas TPU kernel: paged decode attention (one query token per sequence).

Role of FlashInfer's `BatchDecodeWithPagedKVCacheWrapper` in the reference
(`nanovllmx/layers/attention.py:49-59`), built TPU-native:

* Pages are streamed HBM -> VMEM with double-buffered async DMA in chunks of
  `CHUNK_TOKENS` tokens, ONE copy per page covering both K and V planes
  (a [2, ps, nkv, hd] strided rectangle), so KV bytes are read exactly once
  with half the DMA-issue overhead of separate K/V copies (the XLA fallback
  materialises a gathered copy, ~3x the traffic). Full chunks issue their
  copies unguarded (one branch per chunk); only the tail chunk of a sequence
  pays per-page guards. Measured on v5e (benchmarks/probe_decode_kernel.py):
  ~370 GB/s at len 800 / ps 32, ~450 GB/s at len 3200 (pure chunk DMA runs
  at ~720 GB/s — the residual gap is per-sequence transition work and
  per-chunk softmax issue overhead).
* Grid = a handful of programs, each running a DYNAMIC fori loop over
  `SEQ_BLOCK` sequences. Inactive rows (seq_len == 0) cost a few scalar ops
  and a zero output write — no DMA, no softmax, no MXU. The runner compacts
  active sequences to the front of the batch, so a half-empty 256-row
  bucket costs ~active-only. (Two earlier designs were measured and
  rejected: per-seq static unrolling with fake-page streaming charged
  ~4.6 us per IDLE row per layer — ~600 ms per 16-step decode super-step at
  15% occupancy — and 32 small grid programs charged ~14 us each even when
  fully idle.)
* The chunk pipeline prefetches ACROSS sequence boundaries (the last chunk
  iteration of sequence s starts the first DMA of sequence s+1 if active),
  carried through the fori state, so the DMA stream never stalls between
  sequences.
* GQA heads are batched into a single MXU dot per chunk via a block-diagonal
  query layout: q[h, g, d] is placed in a [nq, nkv*hd] matrix with zeros
  outside head h's block, so `scores = q_bd @ K_chunk^T` computes all heads
  at once. The extra MXU flops (x nkv) cost ~9.5 ns per KV token at full
  batch (4 MXUs/core), on par with per-head dots but with far fewer small
  dispatches. The q_bd of each sequence is staged in VMEM scratch so idle
  rows skip the build.
* Flash-style online softmax accumulates across chunks in fp32.

INT8-quantized pools (`{"kv": int8, "scale": f32 [L, 2, S128, 128]}`, see
ops/attention.py) take an ALL-INT8 MXU path — v5e has no fast fp8/int8 ->
bf16 conversion (the relayout-heavy convert measured ~3x slower than the
DMA it feeds, benchmarks/probe_dma.py), so the kernel never dequantizes K/V:

* scores  = (q8_bd @ K8^T)_int32 * q_row_scale * k_col_scale
* p (softmax weights, fp32) folds the V column scales, is re-quantized
  per row to int8, and (p8 @ V8)_int32 * p_row_scale accumulates in fp32 —
  the SageAttention-style formulation of flash attention in int8.
* Per-token scales ride their own per-page DMA: the scale array is the flat
  per-token vector pre-tiled into 128-lane rows, so a page's [2, ps] scale
  rectangle lands lane-aligned in the chunk scale buffer with no relayout.

KV pool layout (one layer slice): [2, P, ps, nkv, hd] — a page's block
[ps, nkv, hd] reshapes to [ps, nkv*hd] contiguously, which is exactly the
K/V operand the block-diagonal dot needs: no in-VMEM transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
# tokens per KV stream chunk. The chunk loop is LATENCY bound, not bandwidth
# bound: one chunk iteration costs ~5 us of serialized issue/wait/compute
# latency regardless of chunk bytes (measured: bf16 ps=16 and int8 ps=128
# decode at identical ms/step despite 2x the bytes; quadrupling the chunk to
# 2048 tokens made steps ~2x SLOWER because the tail chunk's padded compute
# grows with the chunk). The chunk sizes the VMEM stage and the MXU dot.
CHUNK_TOKENS = 512
SEQ_BLOCK = 64     # sequences per grid program (dynamic loop inside)


def chunk_tokens(ps: int, nkv: int, hd: int, itemsize: int) -> int:
    return max(ps, CHUNK_TOKENS // ps * ps)


def _decode_kernel(
    *refs,
    ps: int, nkv: int, hd: int, nq: int, scale: float, SB: int, quant: bool,
):
    if quant:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref, scales_ref,
         o_ref, kvbuf, sem, sbuf, ssem, qbd_scratch, qs_scratch,
         acc_scratch, m_scratch, l_scratch) = refs
    else:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref,
         o_ref, kvbuf, sem, qbd_scratch,
         acc_scratch, m_scratch, l_scratch) = refs
        scales_ref = sbuf = ssem = qs_scratch = None

    prog = pl.program_id(0)
    base = prog * SB
    B = seq_lens_ref.shape[0]
    layer = layer_ref[0]
    g = nq // nkv
    C = kvbuf.shape[2]
    CT = C * ps               # tokens per chunk
    CR = CT // 128            # scale rows per chunk (lane-tiled)

    def seq_len(s):  # s: dynamic row index within this program's block
        return seq_lens_ref[base + s]

    def npages_of(s):
        return pl.cdiv(seq_len(s), ps)

    def _start_page(slot, s, page_idx, j):
        page = page_table_ref[s, page_idx]
        # one DMA covers the K and V planes of the page: source
        # [2, ps, nkv, hd] strided across the pool's plane axis
        pltpu.make_async_copy(
            kv_ref.at[layer, :, page], kvbuf.at[:, slot, j], sem.at[slot]
        ).start()
        if quant:
            # the page's per-token scales. With ps == 128 a page is exactly
            # one 128-lane row of the scale array (scalar row index — HBM
            # DMA cannot slice the lane dim, Mosaic requires full 128).
            if ps == 128:
                pltpu.make_async_copy(
                    scales_ref.at[layer, :, page],
                    sbuf.at[:, slot, j],
                    ssem.at[slot],
                ).start()
            else:  # interpret-mode only (compiled path asserts ps == 128)
                t0 = page * ps
                d0 = j * ps
                pltpu.make_async_copy(
                    scales_ref.at[layer, :, t0 // 128, pl.ds(t0 % 128, ps)],
                    sbuf.at[:, slot, d0 // 128, pl.ds(d0 % 128, ps)],
                    ssem.at[slot],
                ).start()

    def start_chunk(slot, s, chunk):
        # Fast path: a FULL chunk issues C unguarded copies (no per-page
        # branches — measured ~0.1 us of scalar-core work per guarded copy,
        # which capped the stream at ~45% of DMA bandwidth). Only the tail
        # chunk (at most one per sequence) pays per-page guards.
        full = (npages_of(s) - chunk * C) >= C

        @pl.when(full)
        def _():
            for j in range(C):
                _start_page(slot, s, chunk * C + j, j)

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):
                page_idx = chunk * C + j

                @pl.when(page_idx < npages_of(s))
                def _():
                    _start_page(slot, s, page_idx, j)

                if not quant:

                    @pl.when(page_idx >= npages_of(s))
                    def _():
                        # tail pages: V must be zeros, not garbage (p=0
                        # columns still contract against these rows;
                        # 0*NaN=NaN would poison the accumulator). K garbage
                        # is score-masked. (int8 path: garbage int8 is
                        # always finite and the V column scales are
                        # sanitized in-compute, so no zeroing is needed.)
                        kvbuf[1, slot, j] = jnp.zeros(
                            (ps, nkv, hd), kvbuf.dtype
                        )

    def wait_chunk(slot, s, chunk):
        # DMA semaphores count copied bytes; all of a chunk's copies signal
        # one shared semaphore. A full chunk waits once with a chunk-sized
        # descriptor; a partial chunk falls back per page.
        full = (npages_of(s) - chunk * C) >= C

        @pl.when(full)
        def _():
            pltpu.make_async_copy(
                kv_ref.at[0, :, pl.ds(0, C)], kvbuf.at[:, slot], sem.at[slot]
            ).wait()
            if quant:
                pltpu.make_async_copy(
                    scales_ref.at[0, :, pl.ds(0, CR)], sbuf.at[:, slot],
                    ssem.at[slot],
                ).wait()

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):

                @pl.when(chunk * C + j < npages_of(s))
                def _():
                    pltpu.make_async_copy(
                        kv_ref.at[0, :, 0], kvbuf.at[:, slot, j], sem.at[slot]
                    ).wait()
                    if quant and ps == 128:
                        pltpu.make_async_copy(
                            scales_ref.at[0, :, 0], sbuf.at[:, slot, 0],
                            ssem.at[slot],
                        ).wait()
                    elif quant:
                        pltpu.make_async_copy(
                            scales_ref.at[0, :, 0, pl.ds(0, ps)],
                            sbuf.at[:, slot, 0, pl.ds(0, ps)],
                            ssem.at[slot],
                        ).wait()

    # one-hot head map shared by all sequences
    head_of_q = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 0) // g
    kv_head = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 1)
    onehot = (head_of_q == kv_head).astype(jnp.float32)  # [nq, nkv]

    is_f8 = jnp.dtype(kv_ref.dtype).itemsize == 1
    mxu_t = jnp.bfloat16 if is_f8 else kv_ref.dtype

    def chunk_body(c, slot, *, s, nchunks, L, active_next, tail):
        # prefetch: next chunk of this sequence, or the FIRST chunk of the
        # next sequence if it is active (cross-boundary pipelining)
        @pl.when(c + 1 < nchunks)
        def _():
            start_chunk(1 - slot, s, c + 1)

        @pl.when((c + 1 >= nchunks) & active_next)
        def _():
            start_chunk(1 - slot, s + 1, 0)

        wait_chunk(slot, s, c)

        if quant:
            k8 = kvbuf[0, slot].reshape(CT, nkv * hd)
            sc_i = jax.lax.dot_general(
                qbd_scratch[:], k8,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [nq, CT]
            kcol = sbuf[0, slot].reshape(1, CT)
            sc = sc_i.astype(jnp.float32) * (qs_scratch[:] * scale) * kcol
        else:
            k = kvbuf[0, slot].reshape(CT, nkv * hd).astype(mxu_t)
            sc = jax.lax.dot_general(
                qbd_scratch[:], k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [nq, CT]

        if tail:
            # only the TAIL chunk holds positions >= L (partial last page /
            # garbage pages); clean chunks skip the iota+mask entirely
            pos = c * CT + jax.lax.broadcasted_iota(jnp.int32, (nq, CT), 1)
            sc = jnp.where(pos < L, sc, NEG_INF)

        m_prev = m_scratch[:]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(sc - m_new)  # [nq, CT]
        l_scratch[:] = l_scratch[:] * corr + jnp.sum(p, axis=1, keepdims=True)

        if quant:
            # fold the V column scales into p, requantize per row, and run
            # the PV contraction on the int8 MXU (p8=0 at masked columns, so
            # garbage V rows contribute exact int zeros)
            vcol = sbuf[1, slot].reshape(1, CT)
            if tail:
                # sanitize stale/garbage scales: 0 * p keeps NaN out
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
            v8 = kvbuf[1, slot].reshape(CT, nkv * hd)
            pv_i = jax.lax.dot_general(
                p8, v8,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [nq, nkv*hd]
            pv = pv_i.astype(jnp.float32) * pscale
        else:
            v = kvbuf[1, slot].reshape(CT, nkv * hd).astype(mxu_t)
            pv = jax.lax.dot_general(
                p.astype(mxu_t), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [nq, nkv*hd]

        acc_scratch[:] = acc_scratch[:] * corr + pv
        m_scratch[:] = m_new
        return 1 - slot

    def seq_body(s, carry):
        slot, prestarted = carry
        L = seq_len(s)
        active = L > 0
        nchunks = pl.cdiv(npages_of(s), C)  # 0 when inactive
        # is the NEXT row active? (clamped in-bounds; rows are never
        # prefetched across program-block boundaries)
        nxt = jnp.minimum(base + s + 1, B - 1)
        active_next = (s + 1 < SB) & (seq_lens_ref[nxt] > 0)

        @pl.when(active & jnp.logical_not(prestarted))
        def _():
            start_chunk(slot, s, 0)

        @pl.when(active)
        def _():
            # stage this sequence's block-diagonal q; idle rows skip this
            q = q_ref[s].astype(jnp.float32)  # [nq, hd]
            qf = (q[:, None, :] * onehot[:, :, None]).reshape(nq, nkv * hd)
            if quant:
                qs = jnp.maximum(
                    jnp.max(jnp.abs(qf), axis=1, keepdims=True) / 127.0,
                    1e-30,
                )
                qs_scratch[:] = qs
                qbd_scratch[:] = jnp.round(qf / qs).astype(jnp.int8)
            else:
                qbd_scratch[:] = qf.astype(mxu_t)
            m_scratch[:] = jnp.full((nq, 1), NEG_INF, jnp.float32)
            l_scratch[:] = jnp.zeros((nq, 1), jnp.float32)
            acc_scratch[:] = jnp.zeros((nq, nkv * hd), jnp.float32)

        # clean chunks (every position valid: (c+1)*CT <= L) run mask-free;
        # the at-most-one tail chunk pays the iota/where/sanitize ops
        nclean = L // CT
        slot = jax.lax.fori_loop(
            0, nclean,
            functools.partial(
                chunk_body, s=s, nchunks=nchunks, L=L,
                active_next=active_next, tail=False,
            ),
            slot,
        )
        slot = jax.lax.fori_loop(
            nclean, nchunks,
            functools.partial(
                chunk_body, s=s, nchunks=nchunks, L=L,
                active_next=active_next, tail=True,
            ),
            slot,
        )

        @pl.when(active)
        def _():
            acc = acc_scratch[:].reshape(nq, nkv, hd)
            out = jnp.sum(acc * onehot[:, :, None], axis=1)  # [nq, hd]
            out = out / jnp.maximum(l_scratch[:], 1e-30)
            o_ref[s] = out.astype(o_ref.dtype)

        @pl.when(jnp.logical_not(active))
        def _():
            o_ref[s] = jnp.zeros((nq, hd), o_ref.dtype)

        # chunk 0 of row s+1 was prefetched iff this row ran its chunk loop
        return slot, active & active_next

    jax.lax.fori_loop(0, SB, seq_body, (jnp.int32(0), jnp.bool_(False)))


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention_pallas(
    q: jax.Array,           # [B, nq, hd]
    kv_pool,                # [L, 2, P, ps, nkv, hd] or {"kv", "scale"} dict
    page_table: jax.Array,  # [B, W] int32
    seq_lens: jax.Array,    # [B] int32
    scale: float,
    layer: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    quant = isinstance(kv_pool, dict)
    vals = kv_pool["kv"] if quant else kv_pool
    B, nq, hd = q.shape
    _, _, P, ps, nkv, _ = vals.shape
    W = page_table.shape[1]
    C = chunk_tokens(ps, nkv, hd, jnp.dtype(vals.dtype).itemsize) // ps
    compute_dtype = q.dtype
    SB = SEQ_BLOCK
    while B % SB:
        SB //= 2
    is_f8 = jnp.dtype(vals.dtype).itemsize == 1
    mxu_t = jnp.bfloat16 if (is_f8 and not quant) else vals.dtype
    if quant and not interpret:
        # compiled scale DMA needs a page == one 128-lane scale row: HBM
        # DMAs cannot slice the lane dimension (Mosaic alignment rule)
        assert ps == 128, f"int8 KV Pallas path requires page_size=128, got {ps}"

    kernel = functools.partial(
        _decode_kernel,
        ps=ps, nkv=nkv, hd=hd, nq=nq, scale=scale, SB=SB, quant=quant,
    )
    in_specs = [
        pl.BlockSpec((SB, W), lambda b: (b, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seq_lens whole array
        pl.BlockSpec(memory_space=pltpu.SMEM),  # layer index
        pl.BlockSpec(
            (SB, nq, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pl.ANY),  # kv stays in HBM
    ]
    operands = [
        page_table, seq_lens, jnp.asarray(layer, jnp.int32).reshape(1), q,
        vals,
    ]
    scratch = [
        pltpu.VMEM((2, 2, C, ps, nkv, hd), vals.dtype),
        pltpu.SemaphoreType.DMA((2,)),  # one shared sem per buffer slot
    ]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # scales in HBM
        operands.append(kv_pool["scale"])
        CR = C * ps // 128
        scratch += [
            pltpu.VMEM((2, 2, CR, 128), jnp.float32),  # chunk scales
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((nq, nkv * hd), jnp.int8),      # q8 block-diagonal
            pltpu.VMEM((nq, 1), jnp.float32),          # q row scales
        ]
    else:
        scratch.append(pltpu.VMEM((nq, nkv * hd), mxu_t))  # q block-diagonal
    scratch += [
        pltpu.VMEM((nq, nkv * hd), jnp.float32),
        pltpu.VMEM((nq, 1), jnp.float32),
        pltpu.VMEM((nq, 1), jnp.float32),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B // SB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (SB, nq, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nq, hd), compute_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return out
