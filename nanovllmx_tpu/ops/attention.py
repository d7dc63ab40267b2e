"""Paged attention over the page-granular KV pool.

This module defines the attention *interface* used by the model forward pass
and provides the pure-XLA reference implementations. The Pallas TPU kernels in
`nanovllmx_tpu.ops.pallas` implement the same contract and are selected by
`nanovllmx_tpu.ops.backend` on TPU (the reference's FlashInfer wrapper role,
`nanovllmx/layers/attention.py:49-59`, without the per-step host-side plan()).

KV pool layout: `[num_layers, 2, num_pages, page_size, num_kv_heads,
head_dim]` — K at plane 0, V at plane 1. A token's global slot is
`page_table[seq, token // page_size] * page_size + token % page_size`.

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


def write_kv(
    kv_pool: jax.Array, k: jax.Array, v: jax.Array, slots: jax.Array,
    layer: jax.Array,
) -> jax.Array:
    """Scatter new K/V rows into the full pool at `layer`.

    kv_pool: [L, 2, P, ps, nkv, hd]; k, v: [N, nkv, hd]; slots: [N] global
    token slots. Padding rows use OOB_SLOT and are dropped by the scatter —
    the XLA equivalent of the reference Triton kernel's -1 skip
    (`core/kv_cache.py:24-25`). One combined scatter for K and V keeps the
    carried pool buffer in place inside the layer scan.
    """
    L, _, P, ps, nkv, hd = kv_pool.shape
    plane = P * ps
    flat = kv_pool.reshape(L * 2 * plane, nkv, hd)
    base = layer * (2 * plane)
    idx = jnp.concatenate([base + slots, base + plane + slots])
    upd = jnp.concatenate([k, v]).astype(kv_pool.dtype)
    flat = flat.at[idx].set(upd, mode="drop")
    return flat.reshape(L, 2, P, ps, nkv, hd)


def gather_kv(
    kv_pool: jax.Array, page_table: jax.Array, layer: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Gather each sequence's K/V rows at `layer`: returns (k, v), each
    [B, maxP*ps, nkv, hd]. XLA fallback path only — the Pallas kernels stream
    pages HBM->VMEM instead of materialising this. Page indices are offset
    into the flat [L*2*P] page axis so no per-layer slice is materialised."""
    L, _, P, ps, nkv, hd = kv_pool.shape
    B, maxP = page_table.shape
    flat = kv_pool.reshape(L * 2 * P, ps, nkv, hd)
    kpages = layer * 2 * P + page_table
    vpages = kpages + P
    k = flat[kpages].reshape(B, maxP * ps, nkv, hd)
    v = flat[vpages].reshape(B, maxP * ps, nkv, hd)
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
    _, _, _, ps, nkv, hd = kv_pool.shape
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
    _, _, _, ps, nkv, hd = kv_pool.shape
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
    L_, _, _, ps, nkv, hd = kv_pool.shape
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
