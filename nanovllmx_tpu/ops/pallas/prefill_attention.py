"""Pallas TPU kernel: ragged chunked-prefill paged attention.

Role of FlashInfer's `BatchPrefillWithPagedKVCacheWrapper` in the reference
(`nanovllmx/layers/attention.py:49-59`), built TPU-native for the flat-packed
prefill batch layout:

* Queries arrive FLAT: `q[NT, nq, hd]` holds every scheduled chunk's tokens
  back to back; `q_indptr[S+1]` delimits the per-sequence ranges (the
  reference builds the same qo_indptr for FlashInfer,
  `layers/attention.py:62-101`). Flat packing means the transformer MLP/proj
  work is sized by REAL tokens — the padded-grid alternative (rows x Tc)
  paid up to max_prefill_seqs x the FLOPs when many short chunks shared a
  batch.
* Grid = one program per sequence; programs with an empty q range are
  near-free skips. Each program tiles its q rows into BQ-row blocks and
  streams that sequence's KV pages HBM->VMEM with double-buffered DMA in
  CHUNK_PAGES-page chunks, capped causally at the block's last row.
* GQA: scores are computed per kv-head with real [BQ*g, hd] x [hd, Ct] MXU
  dots (g = query group size) — NOT the decode kernel's block-diagonal
  trick, which multiplies FLOPs by nkv and is only free when HBM-bound;
  prefill attention is compute-bound.
* Flash-style online softmax in fp32 across KV chunks.
* q blocks and the output ride VMEM scratch and are DMA'd from/to HBM per
  block, so VMEM usage is independent of NT (~3.5 MB total at defaults).

Causality note: a chunk's own K/V rows are written to the pool BEFORE
attention runs (`models/decoder.py` calls `write_kv` first), so the mask is
simply `kv_pos <= q_pos` with `kv_pos < kv_len`, where `kv_len` counts the
prefix INCLUDING this chunk — same contract as `paged_prefill_attention_xla`.

The caller must allocate q/out with at least BLOCK_Q rows of tail padding
beyond `q_indptr[S]` (a sequence's last block may overhang its range; the
overhang rows are garbage and are overwritten by the next program — the grid
is sequential — or land in the tail padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
CHUNK_PAGES = 16   # pages per KV DMA chunk (16 x 16 tokens = 256-token chunks)
BLOCK_Q = 128      # q rows per block


def _ragged_prefill_kernel(
    # SMEM inputs
    q_indptr_ref,    # [S+1] int32
    q_start_ref,     # [S] int32: absolute position of each chunk's first row
    kv_lens_ref,     # [S] int32: valid KV tokens incl. this chunk
    page_table_ref,  # [S, W] int32
    layer_ref,       # [1] int32
    # HBM inputs
    q_hbm,           # [NT, nq, hd]
    kv_hbm,          # [L, 2, P, ps, nkv, hd] (FULL pool)
    # output
    o_hbm,           # [NT, nq, hd]
    # scratch
    qbuf,            # [BQ, nq, hd] VMEM
    kbuf, vbuf,      # [2, C, ps, nkv, hd] VMEM
    obuf,            # [BQ, nq, hd] VMEM
    acc_s,           # [nkv, BQ*g, hd] f32
    m_s, l_s,        # [nkv, BQ*g, 1] f32
    qsem, osem,      # DMA sems ()
    kvsem,           # DMA sems [2]
    *,
    ps: int, nkv: int, hd: int, nq: int, scale: float, BQ: int,
):
    s = pl.program_id(0)
    layer = layer_ref[0]
    g = nq // nkv
    C = kbuf.shape[1]
    Ct = C * ps

    q_off = q_indptr_ref[s]
    q_len = q_indptr_ref[s + 1] - q_off
    q0 = q_start_ref[s]
    kv_len = kv_lens_ref[s]
    nqb = pl.cdiv(q_len, BQ)

    is_f8 = jnp.dtype(kv_hbm.dtype).itemsize == 1
    mxu_t = jnp.bfloat16 if is_f8 else kv_hbm.dtype

    def start_kv(slot, chunk, npages):
        for j in range(C):
            pidx = chunk * C + j

            @pl.when(pidx < npages)
            def _():
                page = page_table_ref[s, pidx]
                pltpu.make_async_copy(
                    kv_hbm.at[layer, 0, page], kbuf.at[slot, j], kvsem.at[slot]
                ).start()
                pltpu.make_async_copy(
                    kv_hbm.at[layer, 1, page], vbuf.at[slot, j], kvsem.at[slot]
                ).start()

            @pl.when(pidx >= npages)
            def _():
                # tail pages: V must be zeros (p=0 rows still contract);
                # K garbage is score-masked
                vbuf[slot, j] = jnp.zeros((ps, nkv, hd), vbuf.dtype)

    def wait_kv(slot, chunk, npages):
        # the DMA semaphore counts copied bytes; a full chunk waits once with
        # a chunk-sized descriptor, a partial chunk falls back per page
        full = (npages - chunk * C) >= C

        @pl.when(full)
        def _():
            pltpu.make_async_copy(
                kv_hbm.at[0, 0, pl.ds(0, C)], kbuf.at[slot], kvsem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                kv_hbm.at[0, 1, pl.ds(0, C)], vbuf.at[slot], kvsem.at[slot]
            ).wait()

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):

                @pl.when(chunk * C + j < npages)
                def _():
                    pltpu.make_async_copy(
                        kv_hbm.at[0, 0, 0], kbuf.at[slot, j], kvsem.at[slot]
                    ).wait()
                    pltpu.make_async_copy(
                        kv_hbm.at[0, 0, 0], vbuf.at[slot, j], kvsem.at[slot]
                    ).wait()

    def q_block(b, _):
        row0 = q_off + b * BQ
        # synchronous q-block load (512 KB; ~1 us vs ~10 us of block compute)
        qcp = pltpu.make_async_copy(
            q_hbm.at[pl.ds(row0, BQ)], qbuf, qsem
        )
        qcp.start()

        # causal cap: this block's rows see KV positions < eff_len
        eff_len = jnp.minimum(kv_len, q0 + (b + 1) * BQ)
        npages = jnp.maximum(pl.cdiv(eff_len, ps), 1)
        nc = pl.cdiv(npages, C)
        start_kv(0, 0, npages)

        qcp.wait()

        acc_s[...] = jnp.zeros_like(acc_s)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)

        # absolute position of each q row (after per-head reshape row = i*g+j)
        q_pos = q0 + b * BQ + jax.lax.broadcasted_iota(
            jnp.int32, (BQ * g, Ct), 0
        ) // g

        def chunk_body(c, kslot):
            @pl.when(c + 1 < nc)
            def _():
                start_kv(1 - kslot, c + 1, npages)

            wait_kv(kslot, c, npages)

            k = kbuf[kslot].reshape(Ct, nkv, hd)
            v = vbuf[kslot].reshape(Ct, nkv, hd)
            kv_pos = c * Ct + jax.lax.broadcasted_iota(
                jnp.int32, (BQ * g, Ct), 1
            )
            keep = (kv_pos <= q_pos) & (kv_pos < kv_len)

            for h in range(nkv):
                q_h = qbuf[:, h * g:(h + 1) * g, :].reshape(BQ * g, hd)
                k_h = k[:, h, :].astype(mxu_t)   # [Ct, hd]
                v_h = v[:, h, :].astype(mxu_t)
                sc = jax.lax.dot_general(
                    q_h.astype(mxu_t), k_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale                         # [BQ*g, Ct]
                sc = jnp.where(keep, sc, NEG_INF)
                m_prev = m_s[h]
                m_new = jnp.maximum(
                    m_prev, jnp.max(sc, axis=1, keepdims=True)
                )
                corr = jnp.exp(m_prev - m_new)
                p = jnp.exp(sc - m_new)           # masked cols underflow to 0
                l_s[h] = l_s[h] * corr + jnp.sum(p, axis=1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(mxu_t), v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                 # [BQ*g, hd]
                acc_s[h] = acc_s[h] * corr + pv
                m_s[h] = m_new
            return 1 - kslot

        jax.lax.fori_loop(0, nc, chunk_body, jnp.int32(0))

        for h in range(nkv):
            out_h = acc_s[h] / jnp.maximum(l_s[h], 1e-30)
            obuf[:, h * g:(h + 1) * g, :] = out_h.reshape(BQ, g, hd).astype(
                obuf.dtype
            )
        ocp = pltpu.make_async_copy(obuf, o_hbm.at[pl.ds(row0, BQ)], osem)
        ocp.start()
        ocp.wait()
        return 0

    jax.lax.fori_loop(0, nqb, q_block, 0)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "block_q")
)
def ragged_prefill_attention_pallas(
    q: jax.Array,            # [NT, nq, hd] flat-packed (NT >= total_q + BQ)
    kv_pool: jax.Array,      # [L, 2, P, ps, nkv, hd] (FULL pool)
    page_table: jax.Array,   # [S, W] int32
    q_indptr: jax.Array,     # [S+1] int32, ascending, q_indptr[S] <= NT - BQ
    q_start: jax.Array,      # [S] int32
    kv_lens: jax.Array,      # [S] int32
    scale: float,
    layer: jax.Array | int = 0,
    interpret: bool = False,
    block_q: int = BLOCK_Q,
) -> jax.Array:
    NT, nq, hd = q.shape
    _, _, P, ps, nkv, _ = kv_pool.shape
    S, W = page_table.shape
    g = nq // nkv
    C = CHUNK_PAGES
    BQ = block_q

    kernel = functools.partial(
        _ragged_prefill_kernel,
        ps=ps, nkv=nkv, hd=hd, nq=nq, scale=scale, BQ=BQ,
    )
    return pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # q_indptr
            pl.BlockSpec(memory_space=pltpu.SMEM),  # q_start
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens
            pl.BlockSpec(memory_space=pltpu.SMEM),  # page_table (whole)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # layer
            pl.BlockSpec(memory_space=pl.ANY),      # q stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # kv pool stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NT, nq, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BQ, nq, hd), q.dtype),
            pltpu.VMEM((2, C, ps, nkv, hd), kv_pool.dtype),
            pltpu.VMEM((2, C, ps, nkv, hd), kv_pool.dtype),
            pltpu.VMEM((BQ, nq, hd), q.dtype),
            pltpu.VMEM((nkv, BQ * g, hd), jnp.float32),
            pltpu.VMEM((nkv, BQ * g, 1), jnp.float32),
            pltpu.VMEM((nkv, BQ * g, 1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: later programs
            # legitimately overwrite earlier programs' overhang rows
        ),
        interpret=interpret,
    )(
        q_indptr, q_start, kv_lens, page_table,
        jnp.asarray(layer, jnp.int32).reshape(1), q, kv_pool,
    )
