"""Pallas TPU kernel: paged decode attention (one query token per sequence).

Role of FlashInfer's `BatchDecodeWithPagedKVCacheWrapper` in the reference
(`nanovllmx/layers/attention.py:49-59`), built TPU-native. The design was
driven by on-chip ablations (benchmarks/probe_group_kernel*.py, v5e, int8
ps=128 len=800 B=256, per layer pass):

  * per-sequence [nq, .] dots (v1 design): 2.37 ms — every sequence's
    scores/PV dot pads M=nq(16) -> 128 on the MXU (8x waste) and pays a
    dispatch; the serial online-softmax chain leaves hardware idle.
  * batched scores dot + everything through requant: 0.75 ms (~640 GB/s,
    near the DMA rate). The wide PV dot ([M, GS*D] output materialising
    ~1000 int32 vregs per iteration + diagonal extraction) alone cost the
    remaining 1.44 ms.

Cost model (r5, measured with per-variant retraces — the r4 ablation runs
were cache-poisoned: DEBUG_ABLATE changes do not invalidate the jit cache,
so every r4 "ablation" silently re-timed the full kernel):
  * the DMA schedule floor is 0.326 ms/pass at int4 sizes / ~0.63 at int8
    (skeleton ablation == pure-DMA replica, probe_dma2/probe_dma3);
  * MXU dots fed from REF reads overlap the DMA completely; dots fed from
    COMPUTED values (e.g. unpacked nibbles) serialize at full MXU cost on
    the critical path, and landing the values in scratch first is even
    slower (0.95 ms) — Mosaic materializes either way;
  * the block-diagonal formulation pays GS x the necessary MACs in the
    contraction dim (the off-diagonal zeros still stream through the MXU).
    int8 hides this under its 2x DMA bytes; int4 is compute-bound, so its
    scores dot runs at GS=4 (see below).

Production design (v4):
  * GS sequences are processed per chunk iteration as ONE batched pair of
    MXU dots. q is staged block-diagonally: q_bd [GS*nq, GS*D] (D = nkv*hd),
    so `scores = q_bd @ K_big^T` computes every sequence's scores against its
    OWN pages in one dispatch with M = GS*nq = 128 — a full MXU tile.
  * K pages land in a [CT, GS, D] buffer (K_big = reshape [CT, GS*D]);
    V pages land in a [GS, CT, D] buffer (V_stack = reshape [GS*CT, D]).
    PV multiplies a block-diagonal p_bd [M, GS*CT] (built by masked
    broadcast, no scatter) against V_stack -> [M, D]: output is 32x smaller
    than the naive batched PV and needs no extraction.
  * K and V take one single-plane DMA copy per page each; descriptor issue
    is fully overlapped (see ablation above).
  * int8 pools (`{"kv", "scale"}`, per-token scales — ops/attention.py) run
    the SageAttention-style all-int8 MXU path: scores = (q8 @ K8^T) * q_row
    * k_col, p folds the V column scales and requantises per row to int8.
    The whole layer's per-token scales are preloaded into VMEM once per
    invocation (one ~2 MB descriptor); per-page scale rows are then VMEM
    reads — no per-page scale DMA.
  * Flash-style online softmax in fp32 across chunks; rows grouped by
    sequence share the [M, 1] m/l state.
  * The runner sorts decode batches longest-first, so the GS sequences of a
    group have near-equal page counts and the group's chunk loop (which runs
    to the group max) wastes little.

KV pool layout (one layer slice): [2, P, ps, nkv, hd]; a page's [ps, nkv, hd]
block reshapes to [ps, D] contiguously on both buffer layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
LOG2E = 1.4426950408889634  # softmax in base 2 (see fast_exp2)
# VMEM budget for the multi-buffered K+V staging (both layouts)
STAGE_VMEM_BYTES = 8 * 1024 * 1024
# staging slots (DMA pipeline depth). 3 was MEASURED SLOWER on v5e
# (0.87 vs 0.73 ms/pass at the bench shape): the one-chunk-ahead prefetch
# already hides the transfer, and the third buffer only adds VMEM
# pressure and scheduling overhead.
import os as _os
NSLOTS = int(_os.environ.get("NVX_NSLOTS", "2"))
# measured (r5 kernel): int8 stays at CT=128 (0.781 vs 0.787 at CT=256 —
# DMA-bound, bigger chunks only add tail-page waste); int4 runs CT=256
# (0.706 -> 0.650 ms/pass standalone, 7,737 -> 8,364 tok/s end-to-end —
# compute-bound, so halving the chunk count amortises the per-chunk serial
# chain; CT=512 wins the len=800 probe but loses end-to-end to ceil-to-4-
# page copy+compute waste at the trace's shorter lengths)
MAX_CHUNK_TOKENS = 128
MAX_CHUNK_TOKENS_INT4 = 256
SEQ_GROUP = 8      # sequences batched per MXU dot (GS*nq should reach 128)
# perf-ablation switches (benchmarks/probe_kernel_ablate.py): trace-time
# constants that stub out pieces of the compute chain to localize cost.
# Production value is the empty set.
DEBUG_ABLATE: frozenset = frozenset()


def fast_exp2(x):
    """Polynomial 2^x for x <= 0: exponent via int bit trick, degree-4
    Taylor on the fraction (max rel err ~1.4e-3 — far below the int8/bf16
    precision the softmax weights are immediately cast to). The VPU lowers
    builtin exp/exp2 through a much longer range-reduction chain; this was
    ~0.15 ms of a 0.84 ms decode pass (benchmarks/probe_kernel_ablate.py)."""
    x = jnp.maximum(x, -126.0)
    xf = jnp.floor(x)
    r = x - xf
    # 2^r = e^(r ln2), Taylor degree 4
    p = 1.0 + r * (0.69314718 + r * (0.24022651 + r * (
        0.05550411 + r * 0.00967841)))
    e = jax.lax.bitcast_convert_type(
        (xf.astype(jnp.int32) + 127) << 23, jnp.float32
    )
    return e * p


def chunk_tokens(ps: int, GS: int, D: int, itemsize: int,
                 int4: bool = False) -> int:
    """Largest page-aligned chunk whose staging fits the VMEM budget."""
    import os
    default = MAX_CHUNK_TOKENS_INT4 if int4 else MAX_CHUNK_TOKENS
    max_ct = int(os.environ.get("NVX_MAX_CT", default))
    ct = STAGE_VMEM_BYTES // (NSLOTS * 2 * GS * D * itemsize)
    return max(ps, min(max_ct, ct) // ps * ps)


def _decode_kernel(
    *refs,
    ps: int, nkv: int, hd: int, nq: int, scale: float, GS: int, C: int,
    quant: bool, interpret: bool, Kw: int = 0, CTW: int = 0, Kpad: int = 0,
    int4: bool = False,
):
    if quant and Kw:
        (page_table_ref, seq_lens_ref, wlens_ref, wrow0_ref, layer_ref,
         q_ref, kv_ref, scales_ref, wk_ref, wv_ref,
         o_ref, kbuf, vbuf, sem, sbuf, ssem, qbd, qs, acc, m, l,
         sched_ref, lens_v, wkstage, wvstage, wsem, wk8, wv8, wspad) = refs
    elif quant and int4:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref, scales_ref,
         o_ref, kbuf, vbuf, sem, sbuf, ssem, qbd, qs, acc, m, l,
         sched_ref, lens_v, qcorr) = refs
        wlens_ref = wrow0_ref = wk_ref = wv_ref = None
        wkstage = wvstage = wsem = None
        wk8 = wv8 = wspad = None
    elif quant:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref, scales_ref,
         o_ref, kbuf, vbuf, sem, sbuf, ssem, qbd, qs, acc, m, l,
         sched_ref, lens_v) = refs
        wlens_ref = wrow0_ref = wk_ref = wv_ref = None
        wkstage = wvstage = wsem = None
        wk8 = wv8 = wspad = None
    elif Kw:
        (page_table_ref, seq_lens_ref, wlens_ref, wrow0_ref, layer_ref,
         q_ref, kv_ref, wk_ref, wv_ref,
         o_ref, kbuf, vbuf, sem, qbd, acc, m, l,
         sched_ref, lens_v, wkstage, wvstage, wsem) = refs
        scales_ref = sbuf = ssem = qs = None
        wk8 = wv8 = wspad = None
    else:
        (page_table_ref, seq_lens_ref, layer_ref, q_ref, kv_ref,
         o_ref, kbuf, vbuf, sem, qbd, acc, m, l,
         sched_ref, lens_v) = refs
        scales_ref = sbuf = ssem = qs = None
        wlens_ref = wrow0_ref = wk_ref = wv_ref = None
        wkstage = wvstage = wsem = None
        wk8 = wv8 = wspad = None

    layer = layer_ref[0]
    g = nq // nkv
    D = nkv * hd       # logical feature width (int4: 2x the packed width)
    D2 = D // 2
    CT = C * ps
    sr = ps // 128 if ps % 128 == 0 else 0  # scale rows per page
    B = seq_lens_ref.shape[0]
    ngroups = B // GS
    M = GS * nq
    is_f8 = jnp.dtype(kbuf.dtype).itemsize == 1 and not quant
    mxu_t = jnp.bfloat16 if is_f8 else kbuf.dtype

    def _unpack_lo(b):
        """UNSIGNED low-nibble plane (int8, 0..15) of signed-byte-packed
        int4 data (pack_int4_kv: b = lo + 16*hi + 8, so b's low nibble is
        lo + 8 and b >> 4 is hi). Only the lo plane is ever unpacked: the
        hi-plane dot is recovered from the RAW byte dot algebraically
        (x . b - x . lo_u = 16 * x . hi, exact in int32). A single 32-bit
        lane AND with a byte-uniform mask is the whole unpack — elementwise
        i8 shift/sub forces Mosaic through int32 relayouts of the chunk
        (probe_int4_unpack), and mask/shift-unpacked DOT OPERANDS serialize
        at full MXU cost while pure ref-read operands overlap the DMA
        entirely (probe_dma3, r5)."""
        if interpret:
            return (b.astype(jnp.int32) & 15).astype(jnp.int8)
        return pltpu.bitcast(
            pltpu.bitcast(b, jnp.int32) & 0x0F0F0F0F, jnp.int8
        )

    def _unpack_hix(b):
        """Hi-plane of signed-byte-packed int4 data as the UNSIGNED
        excess-8 values hi + 8 (0..15): the stored hi nibble is two's
        complement, and `nib XOR 8` == hi + 8 for all hi in [-8, 7] —
        XOR is bitwise, so it is byte-safe at 32-bit lane granularity
        (add/sub per byte would carry across byte boundaries)."""
        if interpret:
            return (((b.astype(jnp.int32) >> 4) & 15) ^ 8).astype(jnp.int8)
        w = pltpu.bitcast(b, jnp.int32)
        nib = jax.lax.shift_right_logical(
            pltpu.bitcast(w, jnp.uint32), jnp.uint32(4)
        ).astype(jnp.int32) & 0x0F0F0F0F
        return pltpu.bitcast(nib ^ 0x08080808, jnp.int8)

    head_of_q = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 0) // g
    kv_head = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv), 1)
    onehot = (head_of_q == kv_head).astype(jnp.float32)  # [nq, nkv]
    # output extraction mask: row m of a group block (query head m % nq)
    # reads kv head (m % nq) // g of its [nkv, hd] accumulator slice
    kvh_m = jax.lax.broadcasted_iota(jnp.int32, (M, nkv), 0) % nq // g
    kv_col = jax.lax.broadcasted_iota(jnp.int32, (M, nkv), 1)
    outmask = (kv_col == kvh_m).astype(jnp.float32)    # [M, nkv]
    # p_bd block placement: row block si -> column block si
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (M, GS, 1), 0) // nq
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (M, GS, 1), 1)
    blockmask = (row_blk == col_blk).astype(jnp.float32)  # [M, GS, 1]

    # off-diagonal q_bd blocks must be zero; groups rewrite only diagonals
    qbd[...] = jnp.zeros_like(qbd)
    if not quant:
        # K/V staging must never hold NaN/inf bits: q_bd / p_bd have exact
        # zeros at off-diagonal blocks, but 0 * NaN = NaN inside a float MXU
        # dot. Zero once; all later contents are finite page data.
        kbuf[...] = jnp.zeros_like(kbuf)
        vbuf[...] = jnp.zeros_like(vbuf)
    if quant and sr:
        # scale staging cells past a sequence's last page are read (then
        # masked) — they must hold finite values, and uninitialised VMEM
        # may carry NaN bits (0 * NaN = NaN survives the mask)
        sbuf[...] = jnp.zeros_like(sbuf)
    if Kw:
        # window V staging rows past Kw are never DMA'd: zero once so the
        # padded-column part of the PV dot multiplies exact zeros (float
        # pools: 0 * NaN = NaN; quant pools: amax over them must be finite)
        wvstage[...] = jnp.zeros_like(wvstage)
        if quant:
            # K landing rows [Kw, Kpad) feed the amax — keep them finite
            wkstage[...] = jnp.zeros_like(wkstage)
            wspad[...] = jnp.zeros_like(wspad)
    def npages_of(row):
        return pl.cdiv(seq_lens_ref[row], ps)

    W_pt = page_table_ref.shape[1]

    # Every (seq, chunk <= group max) copies exactly C pages — sequences past
    # their own last page copy whatever page index sits in their table tail
    # (zeros from init: page 0 — valid pool memory, garbage later masked by
    # lens) instead of skipping. Fixed copy counts let the whole chunk
    # complete with THREE byte-counted waits (K, V, scales) instead of up to
    # 4*GS*C per-descriptor waits, and the UNCLAMPED table read keeps the
    # per-descriptor scalar work to one SMEM load: descriptor issue is
    # serial scalar-core work that cannot overlap anything, and the whole
    # per-chunk scalar chain (issue + cursor math + clamps) — NOT bytes or
    # MXU/VPU compute — bounds this kernel (every compute ablation measured
    # within 8% of the full kernel while the pure-DMA replica ran 2.4x
    # faster; benchmarks/probe_kernel_ablate.py, probe_dma2.py, v5e).
    # Longest-first batch order keeps groups homogeneous, so tail re-copies
    # add only a few % bytes.
    def start_chunk(si, slot, row, chunk):
        for j in range(C):
            idx = chunk * C + j
            if C > 1:
                # C > 1 can step past the table width on the group's last
                # chunk; C == 1 never can (chunk < cdiv(W_pt, C))
                idx = jnp.minimum(idx, W_pt - 1)
            page = page_table_ref[row, idx]
            pltpu.make_async_copy(
                kv_ref.at[layer, 0, page],
                kbuf.at[slot, pl.ds(j * ps, ps), si],
                sem.at[si, slot],
            ).start()
            pltpu.make_async_copy(
                kv_ref.at[layer, 1, page],
                vbuf.at[slot, si, pl.ds(j * ps, ps)],
                sem.at[si, slot],
            ).start()
            if quant and sr and "const_scales" not in DEBUG_ABLATE:
                # per-page scale rows stream WITH the page (one [2, sr, 128]
                # descriptor covers BOTH planes) instead of a whole-plane
                # VMEM preload: lifts the old 786k-token pool cap and kills
                # the Mosaic sublane-alignment hazard outright.
                pltpu.make_async_copy(
                    scales_ref.at[layer, :, pl.ds(page * sr, sr)],
                    sbuf.at[slot, :, si, pl.ds(j * sr, sr)],
                    ssem.at[slot],
                ).start()

    def wait_chunk_all(slot):
        """Byte-counted waits per (sequence, slot): K and V copies of a
        sequence signal ONE semaphore; each wait below sizes the combined
        K+V byte count via the two same-sized staging slices (src == dst
        only sizes the wait)."""
        for si in range(GS):
            pltpu.make_async_copy(
                kbuf.at[slot, :, si], kbuf.at[slot, :, si], sem.at[si, slot]
            ).wait()
            pltpu.make_async_copy(
                vbuf.at[slot, si], vbuf.at[slot, si], sem.at[si, slot]
            ).wait()
        if quant and sr and "const_scales" not in DEBUG_ABLATE:
            pltpu.make_async_copy(
                sbuf.at[slot], sbuf.at[slot], ssem.at[slot]
            ).wait()

    def scale_rows(plane, rows, c, slot):
        """[M, CT] per-token scale matrix for chunk c: row block si carries
        sequence si's per-token scales (staged VMEM reads, scatter-free)."""
        if sr:
            parts = []
            for si in range(GS):
                seg = sbuf[slot, plane, si]  # [C*sr, 128]
                parts.append(seg.reshape(1, CT))
            rows_m = jnp.concatenate(parts, axis=0)  # [GS, CT]
        else:
            # interpret-mode only (compiled int8 requires ps % 128 == 0):
            # gather per-token scales straight from the HBM ref
            assert interpret
            flat = scales_ref[layer].reshape(2, -1)
            parts = []
            for si in range(GS):
                segs = []
                for j in range(C):
                    page = page_table_ref[rows[si], c * C + j]
                    t0 = page * ps
                    idx = t0 + jax.lax.broadcasted_iota(
                        jnp.int32, (1, ps), 1
                    )
                    segs.append(flat[plane][idx])
                parts.append(jnp.concatenate(segs, axis=1))
            rows_m = jnp.concatenate(parts, axis=0)
        return jnp.broadcast_to(rows_m[:, None, :], (GS, nq, CT)).reshape(
            M, CT
        )

    # ---- compacted flat (group, chunk) schedule ----
    # A per-group chunk loop pauses DMA issue at every group boundary
    # (q staging, state init, extraction run with nothing in flight); the
    # flat walk below keeps a one-chunk-ahead PREFETCH CURSOR that crosses
    # group boundaries, so descriptor issue never stalls. Measured on the
    # pure-DMA replica of this schedule: ~750 GB/s flat vs ~560 GB/s
    # per-group (benchmarks/probe_dma2.py, v5e).
    #
    # The schedule is FULLY PRECOMPUTED into one packed SMEM word per flat
    # step — (group << 16) | (chunk << 1) | is_last — so the hot loop's
    # cursor work is a single SMEM read + two shifts. The earlier live
    # cursor (advance(): gnch read + compare + two selects, run twice per
    # step) was part of the serial scalar chain that bounded the kernel.
    def build_sched(gi, cursor):
        base = gi * GS
        npg = functools.reduce(
            jnp.maximum, [npages_of(base + si) for si in range(GS)]
        )
        nch = pl.cdiv(npg, C)

        def fill(c, _):
            sched_ref[cursor + c] = (
                (gi << 16) | (c << 1) | (c + 1 == nch).astype(jnp.int32)
            )
            return 0

        jax.lax.fori_loop(0, nch, fill, 0)

        @pl.when(nch == 0)
        def _():
            # idle group: not in the schedule; its rows emit zeros here so
            # the flat loop's cost stays proportional to ACTIVE groups
            o_ref[pl.ds(base, GS)] = jnp.zeros((GS, nq, hd), o_ref.dtype)

        return cursor + nch

    FL = jax.lax.fori_loop(0, ngroups, build_sched, jnp.int32(0))

    def issue(entry, slot):
        base = (entry >> 16) * GS
        c = (entry >> 1) & 0x7FFF
        for si in range(GS):
            start_chunk(si, slot, base + si, c)

    def stage_group(g):
        """q staging + softmax-state init for group g (at its first chunk;
        runs while the chunk's DMA is in flight). Also stages the group's
        per-row lens column ONCE (the hot loop previously concatenated it
        per chunk — GS SMEM reads + a sublane build on the scalar chain)."""
        base = g * GS
        for si in range(GS):
            lens_v[pl.ds(si * nq, nq)] = jnp.full(
                (nq, 1), seq_lens_ref[base + si], jnp.int32
            )
            @pl.when(seq_lens_ref[base + si] > 0)
            def _(si=si):
                qf = q_ref[base + si].astype(jnp.float32)
                qbd_si = (qf[:, None, :] * onehot[:, :, None]).reshape(nq, D)
                if quant:
                    s = jnp.maximum(
                        jnp.max(jnp.abs(qbd_si), axis=1, keepdims=True)
                        / 127.0,
                        1e-30,
                    )
                    # fold softmax scale AND log2(e): scores live in base-2
                    # (p = exp2(sc - m)), which normalizes identically
                    qs[pl.ds(si * nq, nq)] = s * (scale * LOG2E)
                    q8si = jnp.round(qbd_si / s)
                    if int4:
                        # split the block-diagonal q into nibble-plane
                        # halves matching the head-pair-packed K: plane 0
                        # contracts heads [0, nkv/2), plane 1 the rest
                        qbd[0, pl.ds(si * nq, nq), pl.ds(si * D2, D2)] = (
                            q8si[:, :D2].astype(jnp.int8)
                        )
                        qbd[1, pl.ds(si * nq, nq), pl.ds(si * D2, D2)] = (
                            q8si[:, D2:].astype(jnp.int8)
                        )
                        # offset-8 fold: both score planes are unsigned
                        # excess-8, so the correction is 8 * rowsum over
                        # the FULL q row. Chunk-invariant -> computed ONCE
                        # per group (values <= 127 * D sum exactly in f32)
                        qcorr[pl.ds(si * nq, nq)] = 8.0 * jnp.sum(
                            q8si, axis=1, keepdims=True
                        )
                    else:
                        qbd[pl.ds(si * nq, nq), pl.ds(si * D, D)] = (
                            q8si.astype(qbd.dtype)
                        )
                else:
                    qbd[pl.ds(si * nq, nq), pl.ds(si * D, D)] = (
                        qbd_si.astype(qbd.dtype)
                    )
        m[...] = jnp.full_like(m, NEG_INF)
        l[...] = jnp.zeros_like(l)
        acc[...] = jnp.zeros_like(acc)

    def stage_window(g):
        """Issue the group's window-row DMAs (deferred-store decode: the
        superstep's own tokens live in bf16 side buffers, not the pool).

        K rows land at wkstage[0:Kw, si] (chunk-token-major, like kbuf);
        V rows land at wvstage[si, 0:Kw] (sequence-major, like vbuf).
        wrow0 offsets into the window buffers' batch rows (pipeline
        parallelism runs one microbatch of a full-B buffer at a time)."""
        base = g * GS
        nrow = wk_ref.shape[1]
        for si in range(GS):
            r = jnp.minimum(wrow0_ref[0] + base + si, nrow - 1)
            pltpu.make_async_copy(
                wk_ref.at[layer, r], wkstage.at[pl.ds(0, Kw), si],
                wsem.at[0],
            ).start()
            pltpu.make_async_copy(
                wv_ref.at[layer, r], wvstage.at[si, pl.ds(0, Kw)],
                wsem.at[1],
            ).start()

    def window_compute(g):
        """Attend over the window rows as one extra mini-chunk, PADDED to a
        lane-aligned CTW (multiple of 128) so the block-diagonal build
        `(M, GS, CTW) -> (M, GS*CTW)` keeps a 128-aligned minor dim — the
        unpadded `(M, GS, Kw)` shape cast is rejected by Mosaic
        (infer-vector-layout, BENCH_r03). Columns >= wlens are masked; the
        staging tails are zeroed once at kernel start.

        Quantized pools quantize the bf16 window rows in-kernel with the
        SAME per-token symmetric formula the superstep-end bulk store uses
        (amax/127, floor 1e-8), so scores match across the superstep
        boundary. K per-token scales are staged in a (CTW, GS) sublane
        buffer and expanded to the [M, CTW] score-scale matrix with a
        one-hot MXU dot (a lane-dim transpose would need the same
        unaligned relayout the reshape did)."""
        base = g * GS
        pltpu.make_async_copy(
            wkstage.at[pl.ds(0, Kw)], wkstage.at[pl.ds(0, Kw)], wsem.at[0]
        ).wait()
        pltpu.make_async_copy(
            wvstage.at[:, pl.ds(0, Kw)], wvstage.at[:, pl.ds(0, Kw)],
            wsem.at[1],
        ).wait()
        wlen_vec = jnp.concatenate(
            [jnp.full((nq, 1), wlens_ref[base + si], jnp.int32)
             for si in range(GS)], axis=0,
        )
        tpos = jax.lax.broadcasted_iota(jnp.int32, (M, CTW), 1)
        if quant:
            wkf = wkstage[...].astype(jnp.float32).reshape(Kpad, GS, D)
            wks = jnp.maximum(
                jnp.max(jnp.abs(wkf), axis=2) / 127.0, 1e-8
            )  # [Kpad, GS]
            wk8[pl.ds(0, Kpad)] = jnp.round(wkf / wks[:, :, None]).astype(
                jnp.int8
            ).reshape(Kpad, GS, nkv, hd)
            wspad[pl.ds(0, Kpad)] = wks
            wvf = wvstage[...].astype(jnp.float32).reshape(GS, CTW, D)
            wvs = jnp.maximum(
                jnp.max(jnp.abs(wvf), axis=2) / 127.0, 1e-8
            )  # [GS, CTW]
            wv8[...] = jnp.round(wvf / wvs[:, :, None]).astype(
                jnp.int8
            ).reshape(GS, CTW, nkv, hd)
            sc_i = jax.lax.dot_general(
                qbd[...], wk8[...].reshape(CTW, GS * D),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [M, CTW]
            # kmat[m, t] = wspad[t, si_m]: one-hot row-block selector @
            # sublane-staged scales (wspad rows >= Kpad are zero -> masked)
            sel = (jax.lax.broadcasted_iota(jnp.int32, (M, GS), 0) // nq
                   == jax.lax.broadcasted_iota(jnp.int32, (M, GS), 1)
                   ).astype(jnp.float32)
            kmat = jax.lax.dot_general(
                sel, wspad[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [M, CTW]
            sc = sc_i.astype(jnp.float32) * qs[...] * kmat
        else:
            wkc = wkstage[...].astype(mxu_t).reshape(CTW, GS * D)
            sc = jax.lax.dot_general(
                qbd[...], wkc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E)
        sc = jnp.where(tpos < wlen_vec, sc, NEG_INF)
        m_prev = m[...]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
        corr = fast_exp2(m_prev - m_new)
        p = fast_exp2(sc - m_new)
        l[...] = l[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        if quant:
            vmat = jnp.broadcast_to(
                wvs[:, None, :], (GS, nq, CTW)
            ).reshape(M, CTW)
            pf = p * vmat
            pscale = jnp.maximum(
                jnp.max(pf, axis=1, keepdims=True) / 127.0, 1e-30
            )
            p8c = jnp.round(pf * (1.0 / pscale))
            p8 = (p8c[:, None, :] * blockmask).reshape(
                M, GS * CTW
            ).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p8, wv8[...].reshape(GS * CTW, D),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * pscale
        else:
            p_bd = (p[:, None, :] * blockmask).reshape(M, GS * CTW)
            pv = jax.lax.dot_general(
                p_bd.astype(mxu_t),
                wvstage[...].astype(mxu_t).reshape(GS * CTW, D),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc[...] = acc[...] * corr + pv
        m[...] = m_new

    def compute_chunk(g, c, slot, rows):
        if int4:
            # S = q0 . lo + q1 . hi: both planes unpacked as UNSIGNED
            # excess-8 values (lo: one AND; hi: shift+AND+XOR — see
            # _unpack_hix), dotted with the matching q halves; the
            # combined offset fold `8 * rowsum(q0 + q1)` (qcorr) is
            # hoisted per group. The kernel is COMPUTE-bound, so dot
            # COUNT is what matters: a raw-byte ref dot would add a
            # third score dot for no byte savings (measured 0.761 vs
            # 0.716 ms/pass).
            if "no_scores" in DEBUG_ABLATE:
                sc_i = jnp.zeros((M, CT), jnp.int32)
            else:
                kb = kbuf[slot].reshape(CT, GS * D2)
                sc_i = jax.lax.dot_general(
                    qbd[0], _unpack_lo(kb),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ) + jax.lax.dot_general(
                    qbd[1], _unpack_hix(kb),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [M, CT]
        else:
            kbig = kbuf[slot].reshape(CT, GS * D)
            if is_f8:
                kbig = kbig.astype(mxu_t)
            if "no_scores" in DEBUG_ABLATE:
                sc_i = jnp.zeros((M, CT),
                                 jnp.int32 if quant else jnp.float32)
            else:
                sc_i = jax.lax.dot_general(
                    qbd[...], kbig,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if quant else jnp.float32
                    ),
                )  # [M, CT]
        if quant:
            sc_f = sc_i.astype(jnp.float32)
            if int4:
                sc_f = sc_f - qcorr[...]
            if "const_scales" in DEBUG_ABLATE:
                sc = sc_f * qs[...]
            else:
                kmat = scale_rows(0, rows, c, slot)
                sc = sc_f * qs[...] * kmat
        else:
            sc = sc_i * (scale * LOG2E)

        pos = c * CT + jax.lax.broadcasted_iota(jnp.int32, (M, CT), 1)
        sc = jnp.where(pos < lens_v[...], sc, NEG_INF)
        m_prev = m[...]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
        corr = fast_exp2(m_prev - m_new)
        if "no_exp" in DEBUG_ABLATE:
            p = jnp.maximum(sc - m_new, 0.0)
        else:
            p = fast_exp2(sc - m_new)
        l[...] = l[...] * corr + jnp.sum(p, axis=1, keepdims=True)

        if quant:
            # out-of-range positions already carry p == 0 via the
            # NEG_INF score mask; vmat is finite (sbuf zero-init), so
            # no re-mask needed
            if "const_scales" in DEBUG_ABLATE:
                vmat = 1.0
            else:
                vmat = scale_rows(1, rows, c, slot)
            pf = p * vmat
            pscale = jnp.maximum(
                jnp.max(pf, axis=1, keepdims=True) / 127.0, 1e-30
            )
            # requantize on the NARROW [M, CT] tile (one mul+round there
            # instead of on the GS-x wider block-diagonal build; int8
            # vector MUL/select don't legalize in Mosaic, so the block
            # placement itself stays an fp32 mul + cast)
            p8c = jnp.round(pf * (1.0 / pscale))
            if "no_bd" in DEBUG_ABLATE:
                p8 = jnp.broadcast_to(
                    p8c[:, None, :], (M, GS, CT)
                ).reshape(M, GS * CT).astype(jnp.int8)
            else:
                p8 = (p8c[:, None, :] * blockmask).reshape(
                    M, GS * CT
                ).astype(jnp.int8)
            if int4:
                # pv_lo = p8 . lo = Lv - 8 * rowsum(p8) (Lv dots the
                # AND-only lo plane; rowsum on the NARROW [M, CT] tile —
                # p8c rowsum == p8 rowsum, off-diagonal blocks are zero);
                # pv_hi = p8 . hi = (Bv - Lv) >> 4 with Bv the RAW byte
                # dot straight off the staging ref (overlaps the DMA)
                if "no_pv" in DEBUG_ABLATE:
                    acc[...] = acc[...] * corr
                    m[...] = m_new
                    return
                vb = vbuf[slot].reshape(GS * CT, D2)
                vlo = _unpack_lo(vb)
                Lv = jax.lax.dot_general(
                    p8, vlo,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [M, D2]
                Bv = jax.lax.dot_general(
                    p8, vb,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                pvc = 8.0 * jnp.sum(p8c, axis=1, keepdims=True)  # [M, 1]
                pv_lo = (Lv.astype(jnp.float32) - pvc) * pscale
                pv_hi = jax.lax.shift_right_arithmetic(
                    Bv - Lv, 4
                ).astype(jnp.float32) * pscale
                # head-major acc: plane halves land in aligned lane slices
                acc[:, :D2] = acc[:, :D2] * corr + pv_lo
                acc[:, D2:] = acc[:, D2:] * corr + pv_hi
                m[...] = m_new
                return
            vstack = vbuf[slot].reshape(GS * CT, D)
            if "no_pv" in DEBUG_ABLATE:
                pv = jnp.zeros((M, D), jnp.float32)
            else:
                pv = jax.lax.dot_general(
                    p8, vstack,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * pscale  # [M, D]
        else:
            p_bd = (p[:, None, :] * blockmask).reshape(M, GS * CT)
            vstack = vbuf[slot].reshape(GS * CT, D)
            if is_f8:
                vstack = vstack.astype(mxu_t)
            pv = jax.lax.dot_general(
                p_bd.astype(mxu_t), vstack,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [M, D]
        acc[...] = acc[...] * corr + pv
        m[...] = m_new

    def extract(g):
        lens_vec = lens_v[...]
        a = acc[...].reshape(M, nkv, hd)
        out = jnp.sum(a * outmask[:, :, None], axis=1)  # [M, hd]
        out = out / jnp.maximum(l[...], 1e-30)
        out = jnp.where(lens_vec > 0, out, 0.0)  # idle rows emit zeros
        o_ref[pl.ds(g * GS, GS)] = out.astype(o_ref.dtype).reshape(
            GS, nq, hd
        )

    SZ = sched_ref.shape[0]

    def flat_body(i, carry):
        # carry = the packed sched entries for flat steps i .. i+NSLOTS-1:
        # the hot loop touches SMEM once (the i+NSLOTS lookahead read) and
        # unpacks cursors with shifts — no live cursor arithmetic.
        entry = carry[0]
        slot = jax.lax.rem(i, NSLOTS)
        pslot = jax.lax.rem(i + NSLOTS - 1, NSLOTS)

        @pl.when(i + NSLOTS - 1 < FL)
        def _():
            issue(carry[NSLOTS - 1], pslot)

        g = entry >> 16
        c = (entry >> 1) & 0x7FFF
        base = g * GS
        rows = [base + si for si in range(GS)]

        if "skeleton" in DEBUG_ABLATE:
            # DMA skeleton: issue + wait only — the floor of the loop
            # structure itself (o_ref written by build_sched idle arm only)
            wait_chunk_all(slot)
            nxt = sched_ref[
                jnp.maximum(jnp.minimum(i + NSLOTS, FL - 1), 0)
            ]
            return (*carry[1:], nxt)

        @pl.when(c == 0)
        def _():
            stage_group(g)
            if Kw:
                stage_window(g)

        wait_chunk_all(slot)

        compute_chunk(g, c, slot, rows)

        @pl.when((entry & 1) == 1)
        def _():
            if Kw:
                window_compute(g)
            extract(g)

        nxt = sched_ref[
            jnp.maximum(jnp.minimum(i + NSLOTS, FL - 1), 0)
        ]
        return (*carry[1:], nxt)

    # pre-issue the first NSLOTS-1 chunks so the loop's prefetch cursor
    # always leads by NSLOTS-1 (two chunks in flight in steady state)
    first = []
    for s in range(NSLOTS):
        first.append(sched_ref[jnp.maximum(jnp.minimum(s, FL - 1), 0)])
    for s in range(NSLOTS - 1):
        @pl.when(s < FL)
        def _(s=s):
            issue(first[s], jnp.int32(s))

    jax.lax.fori_loop(0, FL, flat_body, tuple(first))


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention_pallas(
    q: jax.Array,           # [B, nq, hd]
    kv_pool,                # [L, 2, P, ps, nkv, hd] or {"kv", "scale"} dict
    page_table: jax.Array,  # [B, W] int32
    seq_lens: jax.Array,    # [B] int32 (window mode: POOL tokens only)
    scale: float,
    layer: jax.Array | int = 0,
    interpret: bool = False,
    window: tuple | None = None,  # (wk [L,B,Kw,nkv,hd], wv same, wlens [B])
    window_row0: jax.Array | int = 0,
) -> jax.Array:
    """Paged decode attention; with `window`, also attends over per-sequence
    bf16 side-buffer rows (the deferred-store decode superstep: the window's
    K/V never touch the pool until the superstep-end bulk store). Window
    buffers must hold finite values everywhere (the runner zero-initializes
    them once); wlens[b] = number of valid window rows for row b;
    window_row0 offsets batch row b to window-buffer row window_row0 + b
    (the PP schedule runs one microbatch of the full-B buffers per call)."""
    quant = isinstance(kv_pool, dict)
    vals = kv_pool["kv"] if quant else kv_pool
    int4 = quant and "p4" in kv_pool
    B, nq, hd = q.shape
    _, _, P, ps, nkvp, _ = vals.shape
    nkv = 2 * nkvp if int4 else nkvp  # logical kv heads
    D = nkv * hd
    W = page_table.shape[1]
    compute_dtype = q.dtype
    if quant and not interpret:
        # compiled int8 scale reads need a page == whole 128-lane rows
        assert ps % 128 == 0, (
            f"int8 KV Pallas path requires page_size % 128 == 0, got {ps}"
        )
    if int4:
        assert window is None, "int4 KV does not support window mode"

    # pad the batch to a whole number of GS-sequence groups (padded rows are
    # seq_len 0 and produce zeros). int4 defaults to GS=4: the kernel is
    # COMPUTE-bound (halved DMA + unpack/dot chain), and the block-diagonal
    # scores dot pays GS-proportional MAC waste in the contraction dim —
    # GS=4 halves it for a half-empty M tile (measured 0.716 vs 0.749
    # ms/pass at B=256 len=800; GS=2 is worse, 0.895). int8 stays DMA-bound
    # at GS=8 (probe_decode_kernel/probe_kernel_ablate, v5e).
    import os as _os
    default_gs = 4 if int4 else SEQ_GROUP
    GS = min(int(_os.environ.get("NVX_SEQ_GROUP", default_gs)), B)
    Bp = -(-B // GS) * GS
    wk = wv = wlens = None
    Kw = CTW = Kpad = 0
    if window is not None:
        wk, wv, wlens = window
        Kw = wk.shape[2]
        # window mini-chunk padded to a 128-lane-aligned column count (the
        # block-diagonal reshape needs a 128-multiple minor dim) and an
        # 8-sublane-aligned K landing row count (vector stores into the
        # scale/int8 staging slice whole sublanes)
        CTW = -(-Kw // 128) * 128
        Kpad = -(-Kw // 8) * 8
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0), (0, 0)))
        page_table = jnp.pad(page_table, ((0, Bp - B), (0, 0)))
        seq_lens = jnp.pad(seq_lens, (0, Bp - B))
        if window is not None:
            wlens = jnp.pad(wlens, (0, Bp - B))

    itemsize = jnp.dtype(vals.dtype).itemsize
    Dp = nkvp * hd  # packed feature width (== D except int4: D/2)
    C = chunk_tokens(ps, GS, Dp, itemsize, int4=int4) // ps

    kernel = functools.partial(
        _decode_kernel,
        ps=ps, nkv=nkv, hd=hd, nq=nq, scale=scale, GS=GS, C=C, quant=quant,
        interpret=interpret, Kw=Kw, CTW=CTW, Kpad=Kpad, int4=int4,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # page table (whole)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seq lens
        pl.BlockSpec(memory_space=pltpu.SMEM),  # layer index
        pl.BlockSpec(memory_space=pltpu.VMEM),  # q
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),      # kv stays in HBM
    ]
    operands = [
        page_table, seq_lens, jnp.asarray(layer, jnp.int32).reshape(1), q,
        vals,
    ]
    if Kw:
        in_specs.insert(2, pl.BlockSpec(memory_space=pltpu.SMEM))  # wlens
        operands.insert(2, wlens)
        in_specs.insert(3, pl.BlockSpec(memory_space=pltpu.SMEM))  # wrow0
        operands.insert(
            3, jnp.asarray(window_row0, jnp.int32).reshape(1)
        )
    is_f8 = itemsize == 1 and not quant
    mxu_t = jnp.int8 if quant else (jnp.bfloat16 if is_f8 else vals.dtype)
    CT = C * ps
    M = GS * nq
    scratch = [
        pltpu.VMEM((NSLOTS, CT, GS, nkvp, hd), vals.dtype),  # K staging
        pltpu.VMEM((NSLOTS, GS, CT, nkvp, hd), vals.dtype),  # V staging
        pltpu.SemaphoreType.DMA((GS, NSLOTS)),  # [sequence, slot]
    ]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))  # scales in HBM
        operands.append(kv_pool["scale"])
        # per-page scale rows stream with their pages (no whole-plane VMEM
        # preload): staging is [2 slots, 2 planes, GS, C * ps/128, 128] —
        # independent of pool size, so arbitrarily large pools work (the
        # old preload capped pools at ~786k tokens and faulted Mosaic on
        # non-8-aligned planes)
        sr = ps // 128 if ps % 128 == 0 else 1
        scratch += [
            pltpu.VMEM((NSLOTS, 2, GS, C * sr, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOTS,)),  # scale rows, per slot
        ]
    if Kw:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))  # wk in HBM
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))  # wv in HBM
        operands.append(wk)
        operands.append(wv)
    if int4:
        # two nibble-plane halves of the block-diagonal q (each contracts
        # one unpacked plane of the head-pair-packed K)
        scratch.append(pltpu.VMEM((2, M, GS * (D // 2)), jnp.int8))
    else:
        scratch.append(pltpu.VMEM((M, GS * D), mxu_t))  # block-diagonal q
    if quant:
        scratch.append(pltpu.VMEM((M, 1), jnp.float32))  # q row scales
    WC = -(-W // C)  # max chunks any group can schedule
    scratch += [
        pltpu.VMEM((M, D), jnp.float32),
        pltpu.VMEM((M, 1), jnp.float32),
        pltpu.VMEM((M, 1), jnp.float32),
        # precomputed packed flat schedule: (group << 16 | chunk << 1 | last)
        pltpu.SMEM((max((Bp // GS) * WC, 1),), jnp.int32),
        # per-row seq lens staged once per group (VMEM column)
        pltpu.VMEM((M, 1), jnp.int32),
    ]
    if Kw:
        scratch += [
            # K landing buffer: quant quantizes out of it (Kpad rows keep
            # the amax finite); float pools dot straight from it (CTW rows,
            # garbage tail masked at the scores)
            pltpu.VMEM(((Kpad if quant else CTW), GS, nkv, hd), wk.dtype),
            pltpu.VMEM((GS, CTW, nkv, hd), wv.dtype),  # window V staging
            pltpu.SemaphoreType.DMA((2,)),             # window K/V
        ]
        if quant:
            scratch += [
                pltpu.VMEM((CTW, GS, nkv, hd), jnp.int8),   # wk8
                pltpu.VMEM((GS, CTW, nkv, hd), jnp.int8),   # wv8
                pltpu.VMEM((CTW, GS), jnp.float32),         # K scale stage
            ]
    if int4:
        # per-row offset-8 score correction (8 * rowsum(q8)), group-invariant
        scratch.append(pltpu.VMEM((M, 1), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, nq, hd), compute_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        # the default 16 MB scoped-vmem cap rejects the bf16/window
        # variants (staging 8 MB + the fp32 block-diagonal intermediates);
        # v5e has 128 MB of VMEM and this kernel owns the chip while it
        # runs, so give it headroom (compile gate covers every variant)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*operands)
    return out[:B] if Bp != B else out
