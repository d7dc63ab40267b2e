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

INT8-quantized pools run the same all-int8 MXU formulation as the decode
kernel (see decode_attention.py): q is quantized per row once per block,
scores = int32 dot x row/col scales, the V column scales fold into p which
requantizes to int8 per row. v5e has no fast int8->bf16 relayout, so K/V are
never dequantized. Per-token scales stream with their own per-page DMA from
the lane-tiled scale array (ops/attention.py layout).

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
LOG2E = 1.4426950408889634  # base-2 softmax (see decode_attention.fast_exp2)
# CT=512/BQ=256 beat the old CT=256/BQ=128 13% on-chip (0.245 vs 0.282
# ms/pass at 4x512 tokens) once probe_prefill_sweep actually retraced per
# variant (its pre-r5 numbers silently re-timed one kernel — jit cache)
CHUNK_TOKENS = 256  # tokens per KV DMA chunk
BLOCK_Q = 128       # q rows per block

from nanovllmx_tpu.ops.pallas.decode_attention import fast_exp2  # noqa: E402


def _ragged_prefill_kernel(
    *refs,
    ps: int, nkv: int, hd: int, nq: int, scale: float, BQ: int, quant: bool,
    int4: bool = False,
):
    if quant:
        (q_indptr_ref, q_start_ref, kv_lens_ref, page_table_ref, layer_ref,
         q_hbm, kv_hbm, scales_hbm, o_hbm,
         qbuf, kbuf, vbuf, obuf, sbuf, q8buf, qsbuf,
         acc_s, m_s, l_s, qsem, osem, kvsem, ssem) = refs
    else:
        (q_indptr_ref, q_start_ref, kv_lens_ref, page_table_ref, layer_ref,
         q_hbm, kv_hbm, o_hbm,
         qbuf, kbuf, vbuf, obuf,
         acc_s, m_s, l_s, qsem, osem, kvsem) = refs
        scales_hbm = sbuf = q8buf = qsbuf = ssem = None

    s = pl.program_id(0)
    layer = layer_ref[0]
    g = nq // nkv
    C = kbuf.shape[1]
    Ct = C * ps
    CR = Ct // 128 if quant else 0

    q_off = q_indptr_ref[s]
    q_len = q_indptr_ref[s + 1] - q_off
    q0 = q_start_ref[s]
    kv_len = kv_lens_ref[s]
    nqb = pl.cdiv(q_len, BQ)

    is_f8 = jnp.dtype(kv_hbm.dtype).itemsize == 1
    mxu_t = jnp.bfloat16 if (is_f8 and not quant) else kv_hbm.dtype

    def start_kv(slot, chunk, npages):
        full = (npages - chunk * C) >= C

        def one(j, pidx):
            page = page_table_ref[s, pidx]
            pltpu.make_async_copy(
                kv_hbm.at[layer, 0, page], kbuf.at[slot, j], kvsem.at[slot]
            ).start()
            pltpu.make_async_copy(
                kv_hbm.at[layer, 1, page], vbuf.at[slot, j], kvsem.at[slot]
            ).start()
            if quant and ps == 128:
                # a page is exactly one 128-lane scale row (HBM DMA cannot
                # slice the lane dim — Mosaic alignment rule)
                pltpu.make_async_copy(
                    scales_hbm.at[layer, :, page],
                    sbuf.at[:, slot, j],
                    ssem.at[slot],
                ).start()
            elif quant:  # interpret-mode only
                t0 = page * ps
                d0 = j * ps
                pltpu.make_async_copy(
                    scales_hbm.at[layer, :, t0 // 128, pl.ds(t0 % 128, ps)],
                    sbuf.at[:, slot, d0 // 128, pl.ds(d0 % 128, ps)],
                    ssem.at[slot],
                ).start()

        @pl.when(full)
        def _():
            for j in range(C):
                one(j, chunk * C + j)

        @pl.when(jnp.logical_not(full))
        def _():
            for j in range(C):
                pidx = chunk * C + j

                @pl.when(pidx < npages)
                def _():
                    one(j, pidx)

                if not quant:

                    @pl.when(pidx >= npages)
                    def _():
                        # tail pages: V must be zeros (p=0 rows still
                        # contract); K garbage is score-masked. int8 garbage
                        # is finite and V scales are sanitized in-compute.
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
            if quant:
                pltpu.make_async_copy(
                    scales_hbm.at[0, :, pl.ds(0, CR)], sbuf.at[:, slot],
                    ssem.at[slot],
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
                    if quant and ps == 128:
                        pltpu.make_async_copy(
                            scales_hbm.at[0, :, 0], sbuf.at[:, slot, 0],
                            ssem.at[slot],
                        ).wait()
                    elif quant:
                        pltpu.make_async_copy(
                            scales_hbm.at[0, :, 0, pl.ds(0, ps)],
                            sbuf.at[:, slot, 0, pl.ds(0, ps)],
                            ssem.at[slot],
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

        if quant:
            # quantize the whole q block once: per (row, head) scales
            qf = qbuf[...].astype(jnp.float32)  # [BQ, nq, hd]
            qs = jnp.maximum(
                jnp.max(jnp.abs(qf), axis=2, keepdims=True) / 127.0, 1e-30
            )  # [BQ, nq, 1]
            qsbuf[...] = qs
            q8buf[...] = jnp.round(qf / qs).astype(jnp.int8)

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

            kv_pos = c * Ct + jax.lax.broadcasted_iota(
                jnp.int32, (BQ * g, Ct), 1
            )
            keep = (kv_pos <= q_pos) & (kv_pos < kv_len)

            if quant:
                nkvp = nkv // 2 if int4 else nkv
                k8 = kbuf[kslot].reshape(Ct, nkvp, hd)
                v8 = vbuf[kslot].reshape(Ct, nkvp, hd)
                kcol = sbuf[0, kslot].reshape(1, Ct)
                vcol = sbuf[1, kslot].reshape(1, Ct)
                # sanitize with the LOADED extent (eff_len), not kv_len:
                # columns past eff_len were never DMA'd this block and the
                # stale scale bits could be NaN (0 * NaN would poison pf)
                vcol = jnp.where(
                    (c * Ct + jax.lax.broadcasted_iota(
                        jnp.int32, (1, Ct), 1)) < eff_len,
                    vcol, 0.0,
                )

            for h in range(nkv):
                if quant:
                    if int4:
                        # signed-byte packing (pack_int4_kv): head h lives
                        # in nibble h // (nkv/2) of packed head h % (nkv/2)
                        # — lo = (b & 15) - 8, hi = b >> 4 (arithmetic)
                        nib = h // (nkv // 2)
                        hp = h % (nkv // 2)
                        kb = k8[:, hp, :].astype(jnp.int32)
                        vb = v8[:, hp, :].astype(jnp.int32)
                        if nib == 0:
                            k8_h = ((kb & 15) - 8).astype(jnp.int8)
                            v8_h = ((vb & 15) - 8).astype(jnp.int8)
                        else:
                            k8_h = (kb >> 4).astype(jnp.int8)
                            v8_h = (vb >> 4).astype(jnp.int8)
                    else:
                        k8_h = k8[:, h, :]
                        v8_h = v8[:, h, :]
                    q8_h = q8buf[:, h * g:(h + 1) * g, :].reshape(BQ * g, hd)
                    qs_h = qsbuf[:, h * g:(h + 1) * g, :].reshape(BQ * g, 1)
                    sc_i = jax.lax.dot_general(
                        q8_h, k8_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    sc = sc_i.astype(jnp.float32) * (
                        qs_h * (scale * LOG2E)
                    ) * kcol
                else:
                    q_h = qbuf[:, h * g:(h + 1) * g, :].reshape(BQ * g, hd)
                    k_h = kbuf[kslot].reshape(Ct, nkv, hd)[:, h, :].astype(
                        mxu_t
                    )
                    sc = jax.lax.dot_general(
                        q_h.astype(mxu_t), k_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * (scale * LOG2E)               # [BQ*g, Ct]
                sc = jnp.where(keep, sc, NEG_INF)
                m_prev = m_s[h]
                m_new = jnp.maximum(
                    m_prev, jnp.max(sc, axis=1, keepdims=True)
                )
                corr = fast_exp2(m_prev - m_new)
                p = fast_exp2(sc - m_new)         # masked cols underflow to ~0
                l_s[h] = l_s[h] * corr + jnp.sum(p, axis=1, keepdims=True)
                if quant:
                    pf = p * vcol
                    pscale = jnp.maximum(
                        jnp.max(pf, axis=1, keepdims=True) / 127.0, 1e-30
                    )
                    p8 = jnp.round(pf / pscale).astype(jnp.int8)
                    pv_i = jax.lax.dot_general(
                        p8, v8_h,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    pv = pv_i.astype(jnp.float32) * pscale
                else:
                    v_h = vbuf[kslot].reshape(Ct, nkv, hd)[:, h, :].astype(
                        mxu_t
                    )
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
    kv_pool,                 # [L, 2, P, ps, nkv, hd] or {"kv","scale"} dict
    page_table: jax.Array,   # [S, W] int32
    q_indptr: jax.Array,     # [S+1] int32, ascending, q_indptr[S] <= NT - BQ
    q_start: jax.Array,      # [S] int32
    kv_lens: jax.Array,      # [S] int32
    scale: float,
    layer: jax.Array | int = 0,
    interpret: bool = False,
    block_q: int = BLOCK_Q,
) -> jax.Array:
    quant = isinstance(kv_pool, dict)
    vals = kv_pool["kv"] if quant else kv_pool
    int4 = quant and "p4" in kv_pool
    NT, nq, hd = q.shape
    _, _, P, ps, nkvp, _ = vals.shape
    nkv = 2 * nkvp if int4 else nkvp  # logical kv heads
    S, W = page_table.shape
    g = nq // nkv
    C = max(1, CHUNK_TOKENS // ps)
    BQ = block_q
    if quant and not interpret:
        # compiled scale DMA needs a page == one 128-lane scale row: HBM
        # DMAs cannot slice the lane dimension (Mosaic alignment rule)
        assert ps == 128, f"int8 KV Pallas path requires page_size=128, got {ps}"

    kernel = functools.partial(
        _ragged_prefill_kernel,
        ps=ps, nkv=nkv, hd=hd, nq=nq, scale=scale, BQ=BQ, quant=quant,
        int4=int4,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # q_indptr
        pl.BlockSpec(memory_space=pltpu.SMEM),  # q_start
        pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_lens
        pl.BlockSpec(memory_space=pltpu.SMEM),  # page_table (whole)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # layer
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),      # q stays in HBM
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),      # kv pool stays in HBM
    ]
    # NOTE (r4, measured): XLA's memory-space assignment round-trips the
    # 57 MB scale plane HBM->VMEM(S1)->HBM once per layer around these
    # custom calls (~4 ms/prefill step of copy traffic). Pinning via
    # BlockSpec/with_memory_space_constraint did not dissuade it; the
    # int8 pool itself is too big to fit so only scales are affected.
    operands = [
        q_indptr, q_start, kv_lens, page_table,
        jnp.asarray(layer, jnp.int32).reshape(1), q, vals,
    ]
    if quant:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
        )  # scales in HBM
        operands.append(kv_pool["scale"])
    scratch = [
        pltpu.VMEM((BQ, nq, hd), q.dtype),
        pltpu.VMEM((2, C, ps, nkvp, hd), vals.dtype),
        pltpu.VMEM((2, C, ps, nkvp, hd), vals.dtype),
        pltpu.VMEM((BQ, nq, hd), q.dtype),
    ]
    if quant:
        CR = C * ps // 128
        scratch += [
            pltpu.VMEM((2, 2, CR, 128), jnp.float32),  # chunk K/V scales
            pltpu.VMEM((BQ, nq, hd), jnp.int8),        # q8 block
            pltpu.VMEM((BQ, nq, 1), jnp.float32),      # q row scales
        ]
    scratch += [
        pltpu.VMEM((nkv, BQ * g, hd), jnp.float32),
        pltpu.VMEM((nkv, BQ * g, 1), jnp.float32),
        pltpu.VMEM((nkv, BQ * g, 1), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    return pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((NT, nq, hd), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: later programs
            # legitimately overwrite earlier programs' overhang rows
            # (large-head models exceed the 16 MB default scoped-vmem cap
            # by the q/acc scratch; v5e has 128 MB)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
