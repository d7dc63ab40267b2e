"""Pallas TPU kernel: paged decode attention (one query token per sequence).

Role of FlashInfer's `BatchDecodeWithPagedKVCacheWrapper` in the reference
(`nanovllmx/layers/attention.py:49-59`), built TPU-native:

* Pages are streamed HBM -> VMEM with double-buffered async DMA in chunks of
  `CHUNK_PAGES` pages, so KV bytes are read exactly once (the XLA fallback
  materialises a gathered copy, ~3x the traffic).
* GQA heads are batched into a single MXU dot per chunk via a block-diagonal
  query layout: q[h, g, d] is placed in a [nq, nkv*hd] matrix with zeros
  outside head h's block, so `scores = q_bd @ K_chunk^T` computes all heads
  at once ([16, 1024] @ [1024, 128] per chunk) instead of nkv tiny dots.
  The extra MXU flops (x nkv) are free: decode attention is HBM-bound.
* Flash-style online softmax accumulates across chunks in fp32.

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
CHUNK_PAGES = 16  # pages per DMA chunk (16 x 16 tokens = 256-token chunks)


def _decode_kernel(
    # inputs
    page_table_ref,  # [RB, W] int32 (SMEM, blocked): RB-row slab of tables
    seq_lens_ref,    # [B] int32 (SMEM, whole array)
    q_ref,           # [1, nq, hd] VMEM (blocked by b)
    kv_ref,          # [2, P, ps, nkv, hd] HBM
    # outputs
    o_ref,           # [1, nq, hd] VMEM
    # scratch
    kbuf, vbuf,      # [2, C, ps, nkv, hd] VMEM
    sem,             # DMA sems [2]
    *,
    ps: int, nkv: int, hd: int, nq: int, W: int, scale: float, RB: int,
):
    # Page-table rows ride the grid pipeline into SMEM in RB-row slabs
    # instead of one whole-array scalar prefetch: [max_bs, pages_per_seq]
    # int32 can exceed SMEM (256 KB at bs=256/ctx=4096); a slab is RB KB.
    b = pl.program_id(0)
    row = b % RB
    g = nq // nkv
    C = kbuf.shape[1]
    L = seq_lens_ref[b]
    npages = pl.cdiv(L, ps)
    nchunks = pl.cdiv(npages, C)

    def start_chunk(slot, chunk):
        # one DMA per page (pages are scattered in the pool); all 2C copies
        # of a chunk signal ONE semaphore so the consumer waits once instead
        # of 2C times (semaphore ops were the bottleneck at small pages)
        for j in range(C):
            page_idx = chunk * C + j

            @pl.when(page_idx < npages)
            def _():
                page = page_table_ref[row, page_idx]
                pltpu.make_async_copy(
                    kv_ref.at[0, page], kbuf.at[slot, j], sem.at[slot]
                ).start()
                pltpu.make_async_copy(
                    kv_ref.at[1, page], vbuf.at[slot, j], sem.at[slot]
                ).start()

            @pl.when(page_idx >= npages)
            def _():
                # tail pages of the last chunk: V must be zeros, not garbage
                # (p=0 columns still contract against these rows; 0*NaN=NaN
                # would poison the accumulator). K garbage is score-masked.
                vbuf[slot, j] = jnp.zeros((ps, nkv, hd), vbuf.dtype)

    def wait_chunk(slot, chunk):
        # DMA semaphores count copied ELEMENTS; all of a chunk's copies
        # signal one shared semaphore. A full chunk waits once with a
        # chunk-sized descriptor (the wait amount is what matters); only the
        # final partial chunk falls back to per-page waits.
        full = (npages - chunk * C) >= C

        @pl.when(full)
        def _():
            pltpu.make_async_copy(
                kv_ref.at[0, pl.ds(0, C)], kbuf.at[slot], sem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                kv_ref.at[1, pl.ds(0, C)], vbuf.at[slot], sem.at[slot]
            ).wait()

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):

                @pl.when(chunk * C + j < npages)
                def _():
                    pltpu.make_async_copy(
                        kv_ref.at[0, 0], kbuf.at[slot, j], sem.at[slot]
                    ).wait()
                    pltpu.make_async_copy(
                        kv_ref.at[1, 0], vbuf.at[slot, j], sem.at[slot]
                    ).wait()

    @pl.when(npages == 0)
    def _():
        o_ref[0] = jnp.zeros((nq, hd), o_ref.dtype)

    @pl.when(npages > 0)
    def _():
        def body(acc_scratch, m_scratch, l_scratch):
            # block-diagonal query: [nq, nkv*hd], zero outside own head block
            q = q_ref[0].astype(jnp.float32)  # [nq, hd]
            head_of_q = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 0) // g
            kv_head = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 1)
            onehot = (head_of_q == kv_head).astype(jnp.float32)  # [nq, nkv]
            q_bd = (q[:, None, :] * onehot[:, :, None]).reshape(nq, nkv * hd)

            m_scratch[:] = jnp.full((nq, 1), NEG_INF, jnp.float32)
            l_scratch[:] = jnp.zeros((nq, 1), jnp.float32)
            acc_scratch[:] = jnp.zeros((nq, nkv * hd), jnp.float32)

            start_chunk(0, 0)

            # MXU eats bf16 natively; fp8 KV is upcast chunk-wise in VMEM
            is_f8 = jnp.dtype(kv_ref.dtype).itemsize == 1
            mxu_t = jnp.bfloat16 if is_f8 else kv_ref.dtype
            q_bd_kv = q_bd.astype(mxu_t)

            def chunk_body(c, _):
                slot = c % 2

                @pl.when(c + 1 < nchunks)
                def _():
                    start_chunk((c + 1) % 2, c + 1)

                wait_chunk(slot, c)

                k = kbuf[slot].reshape(C * ps, nkv * hd).astype(mxu_t)
                v = vbuf[slot].reshape(C * ps, nkv * hd).astype(mxu_t)

                s = jax.lax.dot_general(
                    q_bd_kv, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [nq, C*ps]

                pos = c * C * ps + jax.lax.broadcasted_iota(
                    jnp.int32, (nq, C * ps), 1
                )
                s = jnp.where(pos < L, s, NEG_INF)

                m_prev = m_scratch[:]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                corr = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)  # [nq, C*ps]
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

            jax.lax.fori_loop(0, nchunks, chunk_body, None)

            # select each query row's own head block and normalise
            acc = acc_scratch[:].reshape(nq, nkv, hd)
            onehot3 = onehot[:, :, None]
            out = jnp.sum(acc * onehot3, axis=1)  # [nq, hd]
            out = out / jnp.maximum(l_scratch[:], 1e-30)
            o_ref[0] = out.astype(o_ref.dtype)

        pl.run_scoped(
            body,
            acc_scratch=pltpu.VMEM((nq, nkv * hd), jnp.float32),
            m_scratch=pltpu.VMEM((nq, 1), jnp.float32),
            l_scratch=pltpu.VMEM((nq, 1), jnp.float32),
        )


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret")
)
def paged_decode_attention_pallas(
    q: jax.Array,           # [B, nq, hd]
    kv_layer: jax.Array,    # [2, P, ps, nkv, hd]
    page_table: jax.Array,  # [B, W] int32
    seq_lens: jax.Array,    # [B] int32
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    B, nq, hd = q.shape
    _, P, ps, nkv, _ = kv_layer.shape
    W = page_table.shape[1]
    C = CHUNK_PAGES
    compute_dtype = q.dtype

    # SMEM blocks need row counts divisible by 8 (or the full array)
    RB = 8 if B % 8 == 0 else B
    kernel = functools.partial(
        _decode_kernel, ps=ps, nkv=nkv, hd=hd, nq=nq, W=W, scale=scale, RB=RB
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((RB, W), lambda b: (b // RB, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seq_lens whole array
            pl.BlockSpec(
                (1, nq, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # kv stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, nq, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nq, hd), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C, ps, nkv, hd), kv_layer.dtype),
            pltpu.VMEM((2, C, ps, nkv, hd), kv_layer.dtype),
            pltpu.SemaphoreType.DMA((2,)),  # one shared sem per buffer slot
        ],
        interpret=interpret,
    )(page_table, seq_lens, q, kv_layer)
    return out
