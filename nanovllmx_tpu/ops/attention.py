"""Paged attention over the page-granular KV pool.

This module defines the attention *interface* used by the model forward pass
and provides the pure-XLA reference implementations. The Pallas TPU kernels in
`nanovllmx_tpu.ops.pallas` implement the same contract and are selected by
`nanovllmx_tpu.ops.backend` on TPU (the reference's FlashInfer wrapper role,
`nanovllmx/layers/attention.py:49-59`, without the per-step host-side plan()).

KV pool layout: `[num_layers, 2, num_pages, page_size, num_kv_heads,
head_dim]` — K at plane 0, V at plane 1. A token's global slot is
`page_table[seq, token // page_size] * page_size + token % page_size`.

Quantized (int8) pools are a dict `{"kv": int8 values (same layout),
"scale": f32 [L, 2, S128, 128]}` with per-token-per-plane symmetric scales
(shared across kv heads; with qk-norm models K rows are RMS-normalised so a
shared-head scale loses almost nothing, and V error is gated by the ppl
harness). The scale array is the flat per-token vector pre-tiled into
128-lane rows (S128 = ceil(P*ps/128); token t lives at [t // 128, t % 128])
so the Pallas kernels can DMA a page's scales as a lane-aligned rectangle
with no in-VMEM relayout. fp8_e4m3 pools exist but are NOT recommended on
v5e: the fp8->bf16 conversion is emulated (~60 GB/s measured,
benchmarks/probe_dma.py) and ends up 4x slower than bf16 end to end.

The FULL pool (all layers) is threaded through the layer scan as a loop
carry and addressed with layer-offset indices: slicing a per-layer view
inside the scan would make XLA materialise a copy of the ~0.5 GB slice
every layer (the dominant cost when this was first measured), while
scatter/gather on the carried buffer stays in place.

Shapes are static: the page table is always `pages_per_seq` wide and per-
sequence valid lengths arrive as arrays (`seq_lens`), exactly like the
reference pads CUDA-graph buffers to `max_bs * context_len`
(`layers/attention.py:158-162`). Padding rows carry seq_len == 0 and
out-of-bounds write slots (scatter-dropped), mirroring the reference's -1
sentinel (`core/kv_cache.py:24-25`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30  # large-negative instead of -inf: keeps masked softmax NaN-free

# padding-row write sentinel: far beyond any layer plane of the flat pool,
# so `base + OOB_SLOT` can never alias another layer (the per-layer
# `P*ps` sentinel would land exactly on the next plane)
OOB_SLOT = 1 << 30


def pool_values(kv_pool) -> jax.Array:
    """The int8/bf16 value array of a pool (quantized pools are dicts)."""
    return kv_pool["kv"] if isinstance(kv_pool, dict) else kv_pool


def pool_is_quantized(kv_pool) -> bool:
    return isinstance(kv_pool, dict)


def pool_is_int4(kv_pool) -> bool:
    """Packed-int4 pool: int8-typed head-pair-packed bytes, marked by the
    zero-size "p4" leaf (the SIGNED byte encoding lets the decode kernel
    dot raw pool bytes straight off the staging ref — see pack_int4_kv)."""
    return isinstance(kv_pool, dict) and "p4" in kv_pool


def pool_num_kv_heads(kv_pool) -> int:
    """Logical kv heads (the int4 pool's head axis is halved by packing)."""
    nh = pool_values(kv_pool).shape[-2]
    return 2 * nh if pool_is_int4(kv_pool) else nh


def unpack_int4_kv(packed: jax.Array, axis: int = -2) -> jax.Array:
    """int8 [..., nkv//2, hd] -> int8 [..., nkv, hd]: byte b = lo + 16*hi + 8
    (see pack_int4_kv) -> lo = (b & 15) - 8, hi = b >> 4 (arithmetic)."""
    b = packed.astype(jnp.int32)
    lo = (b & 15) - 8
    hi = b >> 4  # arithmetic shift == exact floor division by 16
    return jnp.concatenate([lo, hi], axis=axis).astype(jnp.int8)


def pack_int4_kv(x8: jax.Array) -> jax.Array:
    """int [..., nkv, hd] in [-7, 7] -> int8 [..., nkv//2, hd] head-pair
    packed as the SIGNED byte b = lo + 16*hi + 8 (low nibble excess-8, high
    nibble two's complement; b in [-120, 127]).

    This encoding makes a raw byte an int8 VALUE linear in (lo, hi), so the
    decode kernel can run one MXU dot straight off the staged pool bytes
    (x . b = x . lo + 16 * (x . hi) + 8 * sum(x)) and recover the hi plane
    algebraically from the low-plane dot — dots fed from pure ref reads
    stream at full overlap, while mask/shift-unpacked operands serialize
    (benchmarks/probe_dma3.py, r5)."""
    nkv = x8.shape[-2]
    n2 = nkv // 2
    lo = x8[..., :n2, :].astype(jnp.int32)
    hi = x8[..., n2:, :].astype(jnp.int32)
    return (lo + 16 * hi + 8).astype(jnp.int8)


def make_kv_pool(shape, kv_dtype, init=jnp.zeros, packed4: bool = False):
    """Allocate a pool: raw array, or {kv, scale} when kv_dtype is int8
    (or packed int4 with `packed4`: uint8 values with the kv-head axis
    halved — each byte holds heads h and h + nkv/2 of one token — and the
    same per-token f32 scale plane, amax/7 instead of amax/127).

    The scale plane's row count is rounded UP to a multiple of 8: the decode
    kernel preloads the whole [2, s128, 128] plane into VMEM, and Mosaic
    hard-faults the chip on a non-multiple-of-8 sublane count (confirmed on
    v5e: any pool with pages % 8 != 0 at ps=128 crashed the TPU service).
    Padding rows are never addressed — token t lives at [t//128, t%128] and
    t < P*ps always."""
    if kv_dtype == jnp.int8 or packed4:
        L, _, P, ps, nkv, hd = shape
        s128 = -(-P * ps // 128)
        s128 = -(-s128 // 8) * 8  # sublane-align for the VMEM preload
        if packed4:
            assert nkv % 2 == 0, "int4 KV packing needs an even kv-head count"
            vshape = (L, 2, P, ps, nkv // 2, hd)
            return {
                "kv": init(vshape, jnp.int8),
                "scale": init((L, 2, s128, 128), jnp.float32),
                # zero-size marker leaf: int4 pools share the int8 value
                # dtype (signed byte encoding), so dtype alone cannot
                # distinguish them
                "p4": jnp.zeros((0,), jnp.int8),
            }
        return {
            "kv": init(shape, jnp.int8),
            "scale": init((L, 2, s128, 128), jnp.float32),
        }
    return init(shape, kv_dtype)


def _plan_scale_windows(ks, vs, swin0):
    """[2, Sp, 128] new-scale rows for the store plan: entry i's lanes are
    the CONTIGUOUS token-row window ks[swin0[i] + lane] (lanes outside the
    plan's smask are merged away by the store kernel). A 128-wide
    dynamic-slice per entry lowers to an efficient windowed gather; the
    per-element [Sp, 128] gather it replaces cost ~2.5 ms/prefill step on
    v5e. Padding absorbs swin0 in [-127, 0) (partial leading pages)."""
    ks_p = jnp.pad(ks, (128, 128))
    vs_p = jnp.pad(vs, (128, 128))
    # one gather of 128-wide windows (vmap-of-dynamic_slice unrolled into
    # thousands of [1, 128] slice fusions on TPU)
    starts = (swin0 + 128)[:, None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def take(arr):
        return jax.lax.gather(
            arr, starts, dnums, slice_sizes=(128,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    return jnp.stack([take(ks_p), take(vs_p)])


def write_kv(
    kv_pool, k: jax.Array, v: jax.Array, slots: jax.Array,
    layer: jax.Array,
    unique_pages: bool = False,
    pallas_store: bool = False,
    store_plan: dict | None = None,
):
    """Scatter new K/V rows into the full pool at `layer`.

    kv_pool: [L, 2, P, ps, nkv, hd]; k, v: [N, nkv, hd]; slots: [N] global
    token slots. Padding rows use OOB_SLOT and are dropped by the scatter —
    the XLA equivalent of the reference Triton kernel's -1 skip
    (`core/kv_cache.py:24-25`). One combined scatter for K and V keeps the
    carried pool buffer in place inside the layer scan.

    Quantized pools additionally compute per-token-per-plane symmetric int8
    scales (amax over heads x head_dim / 127) and write them into the
    lane-tiled scale array at the same token slots. That write is an
    ELEMENT-granular scatter (token t -> row t//128, lane t%128), which XLA
    lowers very slowly on TPU (~3.5 ms per decode step; the row-granular
    gather-modify-scatter variant still ~1 ms, and in prefill XLA also
    copies the whole plane per layer when buffer assignment cannot alias it
    through the scan). On TPU both pool rows and scale lanes are stored by
    the aliased Pallas kernels in `ops/pallas/kv_write`:

    * decode (`unique_pages=True`, one token per sequence, per-sequence
      exclusive pages => distinct scale rows): combined row scatter +
      vectorized scale-row read-modify-write in one kernel call.
    * prefill (`store_plan` from the runner): contiguous token runs become
      block DMAs and scale rows are built whole from host lane masks.
    """
    vals = pool_values(kv_pool)
    L, _, P, ps, nkv, hd = vals.shape
    plane = P * ps
    base = layer * (2 * plane)
    idx = jnp.concatenate([base + slots, base + plane + slots])
    N = slots.shape[0]
    if pool_is_quantized(kv_pool):
        int4 = pool_is_int4(kv_pool)
        qmax = 7.0 if int4 else 127.0
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        ks = jnp.maximum(jnp.max(jnp.abs(kf), axis=(1, 2)) / qmax, 1e-8)
        vs = jnp.maximum(jnp.max(jnp.abs(vf), axis=(1, 2)) / qmax, 1e-8)
        k8 = jnp.round(kf / ks[:, None, None]).astype(jnp.int8)
        v8 = jnp.round(vf / vs[:, None, None]).astype(jnp.int8)
        if int4:
            k8 = jnp.clip(k8, -7, 7)
            v8 = jnp.clip(v8, -7, 7)
            kp, vp = pack_int4_kv(k8), pack_int4_kv(v8)
        else:
            kp, vp = k8, v8
        # K-then-V halves for the XLA/prefill paths; the decode scatter
        # kernel takes token-major interleaved [N, 2, nkv, hd] rows (one
        # 2-plane descriptor per token)
        rows8 = jnp.concatenate([kp, vp])
        rows8_il = jnp.stack([kp, vp], axis=1)
        scales = kv_pool["scale"]
        S128 = scales.shape[2]
        T = S128 * 128  # lane-tiled tokens per plane
        # Pallas paths take pool + scale plane in NATIVE shape: a flat
        # .reshape view at the custom-call boundary made XLA layout
        # assignment copy the whole scale plane per layer per prefill
        # step (~15 of 27 ms measured, r4)
        if pallas_store and store_plan is not None and ps % 128 == 0:
            from nanovllmx_tpu.ops.pallas.kv_write import store_kv_prefill

            snew = _plan_scale_windows(ks, vs, store_plan["swin0"])
            pool, scales = store_kv_prefill(
                vals, rows8, layer, store_plan, scale=scales, snew=snew,
            )
            return {**kv_pool, "kv": pool, "scale": scales}
        if pallas_store and unique_pages and ps % 128 == 0:
            from nanovllmx_tpu.ops.pallas.kv_write import scatter_kv_rows

            pool, scales = scatter_kv_rows(
                vals, rows8_il, layer, slots, scale=scales,
                svals=jnp.concatenate([ks, vs]),
            )
            return {**kv_pool, "kv": pool, "scale": scales}
        flat = vals.reshape(L * 2 * plane, nkv, hd)
        srows = scales.reshape(L * 2 * S128, 128)
        sidx = jnp.concatenate(
            [layer * (2 * T) + slots, layer * (2 * T) + T + slots]
        )
        svals = jnp.concatenate([ks, vs])
        if pallas_store:
            from nanovllmx_tpu.ops.pallas.kv_write import scatter_kv_rows

            # a token row is a SUB-TILE of the int8 layout, so XLA's scatter
            # is a per-row read-modify-write (~3.4 ms per decode step on
            # v5e); the Pallas kernel issues one 2-plane DMA per token
            flat = scatter_kv_rows(vals, rows8_il, layer, slots).reshape(
                L * 2 * plane, nkv, hd
            )
        else:
            flat = flat.at[idx].set(rows8, mode="drop")
        if unique_pages and ps % 128 == 0:
            # row-granular read-modify-write: exact because each target
            # element lives in a distinct 128-lane row (requires a page to
            # span whole rows, i.e. ps % 128 == 0 — smaller pages share
            # rows and would collide)
            rows = sidx // 128  # OOB slots stay out of range -> dropped
            lanes = sidx % 128
            cur = srows[jnp.minimum(rows, srows.shape[0] - 1)]  # [2N, 128]
            lane_ids = jnp.arange(128)[None, :]
            upd = jnp.where(
                lane_ids == lanes[:, None], svals[:, None], cur
            )
            srows = srows.at[rows].set(upd, mode="drop")
            new_scales = srows.reshape(scales.shape)
        else:
            sflat = scales.reshape(L * 2 * T)
            sflat = sflat.at[sidx].set(svals, mode="drop")
            new_scales = sflat.reshape(scales.shape)
        return {
            **kv_pool,
            "kv": flat.reshape(vals.shape),
            "scale": new_scales,
        }
    upd = jnp.concatenate([k, v]).astype(vals.dtype)
    if pallas_store and store_plan is not None:
        from nanovllmx_tpu.ops.pallas.kv_write import store_kv_prefill

        return store_kv_prefill(vals, upd, layer, store_plan)
    if pallas_store:
        from nanovllmx_tpu.ops.pallas.kv_write import scatter_kv_rows

        return scatter_kv_rows(
            vals, jnp.stack([k, v], axis=1).astype(vals.dtype), layer, slots
        )
    flat = vals.reshape(L * 2 * plane, nkv, hd)
    flat = flat.at[idx].set(upd, mode="drop")
    return flat.reshape(L, 2, P, ps, nkv, hd)


def bulk_store_window(kv_pool, wk, wv, store_plan: dict):
    """Superstep-end bulk store of the decode window buffers into the pool.

    wk/wv: [L, B, Kw, nkv, hd] bf16 side buffers (deferred-store decode,
    `models/decoder.run_layers` window mode). The host plan covers the
    per-sequence token spans actually scheduled (PrefillStorePlan over
    [start, end) with src row i*Kw + t); quantization matches the kernel's
    in-window formula exactly (per-token symmetric amax/127, floor 1e-8),
    so attention scores are identical across the superstep boundary."""
    from nanovllmx_tpu.ops.pallas.kv_write import store_kv_prefill

    vals = pool_values(kv_pool)
    L, _, P, ps, nkv, hd = vals.shape
    B, Kw = wk.shape[1], wk.shape[2]
    N = B * Kw
    if pool_is_quantized(kv_pool):
        # PrefillStorePlan only emits scale rows when ps == 128; any other
        # page size would silently leave stale scales (ADVICE r03)
        assert ps % 128 == 0, (
            f"bulk_store_window on a quantized pool requires page_size % "
            f"128 == 0, got {ps}"
        )
        swin0 = store_plan["swin0"]

        # quantize PER LAYER inside the scan: an up-front whole-buffer pass
        # materialises ~1.2 GB of f32/int8 temporaries at the bench config
        # (wk.astype(f32) alone is 470 MB, and the packed rows8 scan input
        # another 234 MB) — it OOMed HBM at the superstep compile
        def body(carry, xs):
            pool, scales, layer = carry
            wk_l, wv_l = xs  # [B, Kw, nkv, hd]
            kf = wk_l.astype(jnp.float32)
            vf = wv_l.astype(jnp.float32)
            ks = jnp.maximum(
                jnp.max(jnp.abs(kf), axis=(2, 3)) / 127.0, 1e-8
            )
            vs = jnp.maximum(
                jnp.max(jnp.abs(vf), axis=(2, 3)) / 127.0, 1e-8
            )
            k8 = jnp.round(kf / ks[..., None, None]).astype(jnp.int8)
            v8 = jnp.round(vf / vs[..., None, None]).astype(jnp.int8)
            rows_l = jnp.concatenate(
                [k8.reshape(N, nkv, hd), v8.reshape(N, nkv, hd)]
            )
            sv_l = jnp.concatenate([ks.reshape(N), vs.reshape(N)])
            snew = _plan_scale_windows(sv_l[:N], sv_l[N:], swin0)
            pool, scales = store_kv_prefill(
                pool, rows_l, layer, store_plan, scale=scales, snew=snew,
            )
            return (pool, scales, layer + 1), None

        (pool, scales, _), _ = jax.lax.scan(
            body, (vals, kv_pool["scale"], jnp.int32(0)), (wk, wv)
        )
        return {**kv_pool, "kv": pool, "scale": scales}

    def body(carry, xs):
        pool, layer = carry
        wk_l, wv_l = xs
        rows_l = jnp.concatenate(
            [wk_l.reshape(N, nkv, hd), wv_l.reshape(N, nkv, hd)]
        ).astype(vals.dtype)
        pool = store_kv_prefill(pool, rows_l, layer, store_plan)
        return (pool, layer + 1), None

    (pool, _), _ = jax.lax.scan(body, (vals, jnp.int32(0)), (wk, wv))
    return pool


def gather_kv(
    kv_pool, page_table: jax.Array, layer: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Gather each sequence's K/V rows at `layer`: returns (k, v), each
    [B, maxP*ps, nkv, hd]. XLA fallback path only — the Pallas kernels stream
    pages HBM->VMEM instead of materialising this. Page indices are offset
    into the flat [L*2*P] page axis so no per-layer slice is materialised.
    Quantized pools return dequantized float32."""
    vals = pool_values(kv_pool)
    L, _, P, ps, nkv, hd = vals.shape
    B, maxP = page_table.shape
    flat = vals.reshape(L * 2 * P, ps, nkv, hd)
    kpages = layer * 2 * P + page_table
    vpages = kpages + P
    k = flat[kpages].reshape(B, maxP * ps, nkv, hd)
    v = flat[vpages].reshape(B, maxP * ps, nkv, hd)
    if pool_is_int4(kv_pool):
        k = unpack_int4_kv(k)
        v = unpack_int4_kv(v)
        nkv *= 2
    if pool_is_quantized(kv_pool):
        scales = kv_pool["scale"]
        T = scales.shape[2] * 128
        sflat = scales.reshape(L * 2 * T)
        tok = page_table[:, :, None] * ps + jnp.arange(ps)[None, None, :]
        tok = tok.reshape(B, maxP * ps)
        ks = sflat[layer * 2 * T + tok]  # [B, maxP*ps]
        vs = sflat[layer * 2 * T + T + tok]
        k = k.astype(jnp.float32) * ks[..., None, None]
        v = v.astype(jnp.float32) * vs[..., None, None]
    return k, v


def _masked_softmax(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """Softmax over the last axis with a boolean keep-mask; fully-masked rows
    produce zeros (not NaN), so padding rows stay inert."""
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - jax.lax.stop_gradient(m))
    e = jnp.where(mask, e, 0.0)
    s = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(s, 1e-30)


def paged_decode_attention_xla(
    q: jax.Array,
    kv_pool: jax.Array,
    page_table: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    layer: jax.Array | int = 0,
) -> jax.Array:
    """One-token-per-sequence paged attention (decode).

    q: [B, nq, hd]; page_table: [B, maxP]; seq_lens: [B] = number of valid KV
    tokens (including the token written this step). Returns [B, nq, hd].
    """
    _, _, _, ps, nkv, hd = pool_values(kv_pool).shape
    nkv = pool_num_kv_heads(kv_pool)
    B, nq = q.shape[0], q.shape[1]
    group = nq // nkv
    k, v = gather_kv(kv_pool, page_table, jnp.asarray(layer))  # [B, S, nkv, hd]
    S = k.shape[1]

    qg = q.reshape(B, nkv, group, hd).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    logits = jnp.einsum("bkgd,bskd->bkgs", qg, kf) * scale  # [B, nkv, g, S]
    mask = (jnp.arange(S)[None, :] < seq_lens[:, None])[:, None, None, :]
    p = _masked_softmax(logits, mask)
    out = jnp.einsum("bkgs,bskd->bkgd", p, v.astype(jnp.float32))
    return out.reshape(B, nq, hd).astype(q.dtype)


def ragged_prefill_attention_xla(
    q: jax.Array,            # [NT, nq, hd] flat-packed chunk tokens
    kv_pool: jax.Array,
    page_table: jax.Array,   # [S, W] per-sequence page tables
    seg_ids: jax.Array,      # [NT] int32: owning sequence row (pad -> any)
    positions: jax.Array,    # [NT] int32: absolute position of each token
    scale: float,
    layer: jax.Array | int = 0,
    block_pages: int = 4,
) -> jax.Array:
    """Ragged chunked-prefill attention, pure-XLA fallback.

    Exploits the identity: a chunk's own K/V is already in the pool, so the
    causal KV set of a flat token at absolute position p is exactly positions
    [0, p] of its own sequence — i.e. ragged prefill IS decode with per-token
    page-table rows (`page_table[seg_ids]`) and per-token seq_lens
    (`positions + 1`). Blocked over page-blocks with an online softmax so the
    per-token gathered KV copy stays bounded (this gather duplicates shared
    pages across tokens — correctness fallback, not the perf path; the
    Pallas kernel streams each page once).
    """
    _, _, _, ps, nkv, hd = pool_values(kv_pool).shape
    nkv = pool_num_kv_heads(kv_pool)
    NT, nq = q.shape[0], q.shape[1]
    group = nq // nkv
    layer = jnp.asarray(layer)
    W = page_table.shape[1]
    bp = min(block_pages, W)
    nblocks = -(-W // bp)
    pad = nblocks * bp - W
    pt_tok = jnp.pad(page_table, ((0, 0), (0, pad)))[seg_ids]  # [NT, W+pad]
    blk = bp * ps
    kv_len_tok = positions + 1                                 # causal set

    qg = q.reshape(NT, nkv, group, hd).astype(jnp.float32)

    def block_step(carry, i):
        m, l, acc = carry  # m,l: [NT, nkv, g, 1]; acc: [NT, nkv, g, hd]
        pages = jax.lax.dynamic_slice(pt_tok, (0, i * bp), (NT, bp))
        k, v = gather_kv(kv_pool, pages, layer)  # [NT, blk, nkv, hd]
        s = jnp.einsum(
            "tkgd,tskd->tkgs", qg, k.astype(jnp.float32)
        ) * scale
        kv_pos = i * blk + jnp.arange(blk)[None, :]
        keep = (kv_pos < kv_len_tok[:, None])[:, None, None, :]
        s = jnp.where(keep, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(keep, p, 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "tkgs,tskd->tkgd", p, v.astype(jnp.float32)
        )
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((NT, nkv, group, 1), NEG_INF, jnp.float32),
        jnp.zeros((NT, nkv, group, 1), jnp.float32),
        jnp.zeros((NT, nkv, group, hd), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(block_step, init, jnp.arange(nblocks))
    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(NT, nq, hd).astype(q.dtype)


def paged_prefill_attention_xla(
    q: jax.Array,
    kv_pool: jax.Array,
    page_table: jax.Array,
    kv_lens: jax.Array,
    q_start: jax.Array,
    scale: float,
    block_pages: int = 8,
    layer: jax.Array | int = 0,
) -> jax.Array:
    """Chunked-prefill paged attention: a chunk of Tc query tokens per
    sequence attends causally over that sequence's full KV prefix (including
    the chunk itself, already written to the pool).

    Flash-style formulation in plain XLA: `lax.scan` over KV page-blocks with
    an online softmax, so only [.., Tc, block] score tiles ever materialise —
    never the full [B, nkv, g, Tc, S] tensor (which at Tc=512, S=4096 would
    be half a gigabyte per layer).

    q: [B, Tc, nq, hd]; kv_lens: [B] valid KV tokens; q_start: [B] absolute
    position of the chunk's first query token. Returns [B, Tc, nq, hd].
    """
    L_, _, _, ps, nkv, hd = pool_values(kv_pool).shape
    nkv = pool_num_kv_heads(kv_pool)
    B, Tc, nq = q.shape[0], q.shape[1], q.shape[2]
    group = nq // nkv
    W = page_table.shape[1]
    layer = jnp.asarray(layer)
    bp = min(block_pages, W)
    nblocks = -(-W // bp)
    # pad page table to a whole number of blocks (garbage pages are masked)
    pad = nblocks * bp - W
    pt = jnp.pad(page_table, ((0, 0), (0, pad)))
    blk = bp * ps  # tokens per block

    qg = q.reshape(B, Tc, nkv, group, hd).astype(jnp.float32)
    q_pos = q_start[:, None] + jnp.arange(Tc)[None, :]  # [B, Tc]

    def block_step(carry, i):
        m, l, acc = carry  # m,l: [B, Tc, nkv, g, 1]; acc: [B, Tc, nkv, g, hd]
        pages = jax.lax.dynamic_slice(pt, (0, i * bp), (B, bp))
        k, v = gather_kv(kv_pool, pages, layer)
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
        s = jnp.einsum("btkgd,bskd->btkgs", qg, k) * scale  # [B,Tc,nkv,g,blk]
        kv_pos = i * blk + jnp.arange(blk)[None, None, :]
        mask = (kv_pos < kv_lens[:, None, None]) & (kv_pos <= q_pos[:, :, None])
        s = jnp.where(mask[:, :, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask[:, :, None, None, :], p, 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum("btkgs,bskd->btkgd", p, v)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((B, Tc, nkv, group, 1), NEG_INF, jnp.float32),
        jnp.zeros((B, Tc, nkv, group, 1), jnp.float32),
        jnp.zeros((B, Tc, nkv, group, hd), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(block_step, init, jnp.arange(nblocks))
    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(B, Tc, nq, hd).astype(q.dtype)
