"""Pallas TPU kernel: paged decode attention (one query token per sequence).

Role of FlashInfer's `BatchDecodeWithPagedKVCacheWrapper` in the reference
(`nanovllmx/layers/attention.py:49-59`), built TPU-native:

* Pages are streamed HBM -> VMEM with double-buffered async DMA in chunks of
  `CHUNK_PAGES` pages, so KV bytes are read exactly once (the XLA fallback
  materialises a gathered copy, ~3x the traffic).
* Each program processes `SEQS_PER_PROGRAM` sequences, and the chunk
  pipeline prefetches ACROSS sequence boundaries (the last iteration of
  sequence s starts the first DMA of sequence s+1), so the stream never
  stalls: per-program/per-sequence fixed costs were the dominant term at
  batch 256 when every sequence was its own grid step.
* GQA heads are batched into a single MXU dot per chunk via a block-diagonal
  query layout: q[h, g, d] is placed in a [nq, nkv*hd] matrix with zeros
  outside head h's block, so `scores = q_bd @ K_chunk^T` computes all heads
  at once. The extra MXU flops (x nkv) are free: decode attention is
  HBM-bound.
* Flash-style online softmax accumulates across chunks in fp32.
* Zero-length (inactive padding) rows are processed as one fake page and
  masked to zero output, keeping the pipeline uniform.

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
CHUNK_PAGES = 16   # pages per DMA chunk (16 x 16 tokens = 256-token chunks)
SEQS_PER_PROGRAM = 8


def _decode_kernel(
    # inputs
    page_table_ref,  # [GQ, W] int32 (SMEM, blocked): this program's tables
    seq_lens_ref,    # [B] int32 (SMEM, whole array)
    layer_ref,       # [1] int32 (SMEM): layer to read/whose planes to use
    q_ref,           # [GQ, nq, hd] VMEM (blocked)
    kv_ref,          # [L, 2, P, ps, nkv, hd] HBM (FULL pool)
    # outputs
    o_ref,           # [GQ, nq, hd] VMEM
    # scratch
    kbuf, vbuf,      # [2, C, ps, nkv, hd] VMEM
    sem,             # DMA sems [2]
    acc_scratch, m_scratch, l_scratch,
    *,
    ps: int, nkv: int, hd: int, nq: int, scale: float, GQ: int,
):
    prog = pl.program_id(0)
    layer = layer_ref[0]
    g = nq // nkv
    C = kbuf.shape[1]
    page_elems = ps * nkv * hd

    def npages_of(s):
        # inactive rows (L == 0) stream one fake page to keep the pipeline
        # uniform; their output is zeroed at the end
        L = seq_lens_ref[prog * GQ + s]
        return jnp.maximum(pl.cdiv(L, ps), 1)

    def start_chunk(slot, s, chunk):
        for j in range(C):
            page_idx = chunk * C + j

            @pl.when(page_idx < npages_of(s))
            def _():
                page = page_table_ref[s, page_idx]
                pltpu.make_async_copy(
                    kv_ref.at[layer, 0, page], kbuf.at[slot, j], sem.at[slot]
                ).start()
                pltpu.make_async_copy(
                    kv_ref.at[layer, 1, page], vbuf.at[slot, j], sem.at[slot]
                ).start()

            @pl.when(page_idx >= npages_of(s))
            def _():
                # tail pages: V must be zeros, not garbage (p=0 columns still
                # contract against these rows; 0*NaN=NaN would poison the
                # accumulator). K garbage is score-masked.
                vbuf[slot, j] = jnp.zeros((ps, nkv, hd), vbuf.dtype)

    def wait_chunk(slot, s, chunk):
        # DMA semaphores count copied ELEMENTS; all of a chunk's copies
        # signal one shared semaphore. A full chunk waits once with a
        # chunk-sized descriptor; a partial chunk falls back per page.
        full = (npages_of(s) - chunk * C) >= C

        @pl.when(full)
        def _():
            pltpu.make_async_copy(
                kv_ref.at[0, 0, pl.ds(0, C)], kbuf.at[slot], sem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                kv_ref.at[0, 1, pl.ds(0, C)], vbuf.at[slot], sem.at[slot]
            ).wait()

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):

                @pl.when(chunk * C + j < npages_of(s))
                def _():
                    pltpu.make_async_copy(
                        kv_ref.at[0, 0, 0], kbuf.at[slot, j], sem.at[slot]
                    ).wait()
                    pltpu.make_async_copy(
                        kv_ref.at[0, 1, 0], vbuf.at[slot, j], sem.at[slot]
                    ).wait()

    # one-hot head map shared by all sequences of this program
    head_of_q = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 0) // g
    kv_head = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 1)
    onehot = (head_of_q == kv_head).astype(jnp.float32)  # [nq, nkv]

    is_f8 = jnp.dtype(kv_ref.dtype).itemsize == 1
    mxu_t = jnp.bfloat16 if is_f8 else kv_ref.dtype

    # prologue: first chunk of sequence 0
    start_chunk(0, 0, 0)
    slot_cursor = 0  # python-level parity tracking is impossible (dynamic
    # chunk counts); the slot is threaded through fori carries instead.

    slot = jnp.int32(0)
    for s in range(GQ):  # static unroll over this program's sequences
        L = seq_lens_ref[prog * GQ + s]
        nchunks = pl.cdiv(npages_of(s), C)

        q = q_ref[s].astype(jnp.float32)  # [nq, hd]
        q_bd = (q[:, None, :] * onehot[:, :, None]).reshape(nq, nkv * hd)
        q_bd = q_bd.astype(mxu_t)

        m_scratch[:] = jnp.full((nq, 1), NEG_INF, jnp.float32)
        l_scratch[:] = jnp.zeros((nq, 1), jnp.float32)
        acc_scratch[:] = jnp.zeros((nq, nkv * hd), jnp.float32)

        def chunk_body(c, slot, s=s, nchunks=nchunks, q_bd=q_bd, L=L):
            # prefetch: next chunk of this sequence, or the FIRST chunk of
            # the next sequence (cross-boundary pipelining)
            @pl.when(c + 1 < nchunks)
            def _():
                start_chunk(1 - slot, s, c + 1)

            if s + 1 < GQ:

                @pl.when(c + 1 >= nchunks)
                def _():
                    start_chunk(1 - slot, s + 1, 0)

            wait_chunk(slot, s, c)

            k = kbuf[slot].reshape(C * ps, nkv * hd).astype(mxu_t)
            v = vbuf[slot].reshape(C * ps, nkv * hd).astype(mxu_t)

            sc = jax.lax.dot_general(
                q_bd, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [nq, C*ps]

            pos = c * C * ps + jax.lax.broadcasted_iota(
                jnp.int32, (nq, C * ps), 1
            )
            sc = jnp.where(pos < L, sc, NEG_INF)

            m_prev = m_scratch[:]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(sc - m_new)  # [nq, C*ps]
            l_scratch[:] = l_scratch[:] * corr + jnp.sum(
                p, axis=1, keepdims=True
            )
            pv = jax.lax.dot_general(
                p.astype(mxu_t), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [nq, nkv*hd]
            acc_scratch[:] = acc_scratch[:] * corr + pv
            m_scratch[:] = m_new
            return 1 - slot

        slot = jax.lax.fori_loop(0, nchunks, chunk_body, slot)

        acc = acc_scratch[:].reshape(nq, nkv, hd)
        out = jnp.sum(acc * onehot[:, :, None], axis=1)  # [nq, hd]
        out = out / jnp.maximum(l_scratch[:], 1e-30)
        # inactive rows (L == 0) streamed a fake fully-masked page, which
        # degenerates to mean(V): zero them explicitly
        out = jnp.where(L > 0, out, 0.0)
        o_ref[s] = out.astype(o_ref.dtype)
    del slot_cursor


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention_pallas(
    q: jax.Array,           # [B, nq, hd]
    kv_pool: jax.Array,     # [L, 2, P, ps, nkv, hd] (FULL pool)
    page_table: jax.Array,  # [B, W] int32
    seq_lens: jax.Array,    # [B] int32
    scale: float,
    layer: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    B, nq, hd = q.shape
    _, _, P, ps, nkv, _ = kv_pool.shape
    W = page_table.shape[1]
    C = CHUNK_PAGES
    compute_dtype = q.dtype
    GQ = SEQS_PER_PROGRAM if B % SEQS_PER_PROGRAM == 0 else (
        8 if B % 8 == 0 else B
    )

    kernel = functools.partial(
        _decode_kernel, ps=ps, nkv=nkv, hd=hd, nq=nq, scale=scale, GQ=GQ
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // GQ,),
        in_specs=[
            pl.BlockSpec((GQ, W), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seq_lens whole array
            pl.BlockSpec(memory_space=pltpu.SMEM),  # layer index
            pl.BlockSpec(
                (GQ, nq, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # kv stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (GQ, nq, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nq, hd), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C, ps, nkv, hd), kv_pool.dtype),
            pltpu.VMEM((2, C, ps, nkv, hd), kv_pool.dtype),
            pltpu.SemaphoreType.DMA((2,)),  # one shared sem per buffer slot
            pltpu.VMEM((nq, nkv * hd), jnp.float32),
            pltpu.VMEM((nq, 1), jnp.float32),
            pltpu.VMEM((nq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(page_table, seq_lens,
      jnp.asarray(layer, jnp.int32).reshape(1), q, kv_pool)
    return out
