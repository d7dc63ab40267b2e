"""Ragged flat-packed prefill attention: XLA fallback and Pallas kernel vs
the padded-grid XLA reference (`paged_prefill_attention_xla`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllmx_tpu.ops import attention as attn_ops
from nanovllmx_tpu.ops.pallas.prefill_attention import (
    ragged_prefill_attention_pallas,
)

PS = 16  # page size


def _quantize_pool(kv):
    """Per-token-per-plane int8 quantization (mirrors write_kv's scheme)."""
    L, _, P, ps, nkv, hd = kv.shape
    kvf = np.asarray(kv, np.float32)
    amax = np.abs(kvf).max(axis=(4, 5))
    scales = np.maximum(amax / 127.0, 1e-8)
    q8 = np.rint(kvf / scales[..., None, None]).astype(np.int8)
    s128 = -(-P * ps // 128)
    sflat = np.zeros((L, 2, s128 * 128), np.float32)
    sflat[:, :, : P * ps] = scales.reshape(L, 2, P * ps)
    return {
        "kv": jnp.asarray(q8),
        "scale": jnp.asarray(sflat.reshape(L, 2, s128, 128)),
    }


def _mk_case(rng, S, W, NT, nq=4, nkv=2, hd=32, dtype=jnp.float32,
             kv_dtype=None, num_pages=64, n_live=None):
    """Random ragged prefill batch over a shared paged pool.

    Each live sequence s gets a prior kv prefix of `prior` tokens and a
    fresh chunk of `q_len` tokens (chunk K/V already written to the pool,
    as the model does before attention)."""
    n_live = S if n_live is None else n_live
    kv_pool = jax.random.normal(
        rng, (2, 2, num_pages, PS, nkv, hd), jnp.float32
    )
    if kv_dtype == "int8":
        kv_pool = _quantize_pool(kv_pool)
    elif kv_dtype == "int4":
        from tests.test_pallas_decode import quantize_pool_int4

        kv_pool = quantize_pool_int4(kv_pool)
    else:
        kv_pool = kv_pool.astype(kv_dtype or dtype)

    page_table = np.zeros((S, W), np.int32)
    q_indptr = np.zeros(S + 1, np.int32)
    q_start = np.zeros(S, np.int32)
    kv_lens = np.zeros(S, np.int32)
    rs = np.random.RandomState(0)
    free = list(rs.permutation(num_pages))
    off = 0
    for s in range(n_live):
        prior = int(rs.randint(0, W * PS // 2))
        q_len = int(rs.randint(1, min(W * PS - prior, (NT - 16) // n_live)))
        total = prior + q_len
        npages = -(-total // PS)
        pages = [free.pop() for _ in range(npages)]
        page_table[s, :npages] = pages
        q_start[s] = prior
        kv_lens[s] = total
        q_indptr[s + 1] = off + q_len
        off += q_len
    q_indptr[n_live + 1:] = off

    q = jax.random.normal(
        jax.random.fold_in(rng, 1), (NT, nq, hd), jnp.float32
    ).astype(dtype)
    positions = np.zeros(NT, np.int32)
    seg_ids = np.zeros(NT, np.int32)
    for s in range(n_live):
        a, b = q_indptr[s], q_indptr[s + 1]
        positions[a:b] = q_start[s] + np.arange(b - a)
        seg_ids[a:b] = s
    return (q, kv_pool, jnp.asarray(page_table), jnp.asarray(q_indptr),
            jnp.asarray(q_start), jnp.asarray(kv_lens),
            jnp.asarray(seg_ids), jnp.asarray(positions))


def _padded_reference(q, kv_pool, page_table, q_indptr, q_start, kv_lens,
                      scale, layer=0):
    """Run each sequence alone through the padded-grid reference path."""
    S = page_table.shape[0]
    out = np.zeros(np.asarray(q).shape, np.float32)
    for s in range(S):
        a, b = int(q_indptr[s]), int(q_indptr[s + 1])
        if b <= a:
            continue
        Tc = b - a
        o = attn_ops.paged_prefill_attention_xla(
            q[None, a:b], kv_pool, page_table[s:s + 1],
            kv_lens[s:s + 1], q_start[s:s + 1], scale, layer=layer,
        )
        out[a:b] = np.asarray(o[0], np.float32)
    return out


@pytest.mark.parametrize("kv_dtype", [None, jnp.float8_e4m3fn])
def test_ragged_xla_matches_padded(kv_dtype):
    rng = jax.random.PRNGKey(0)
    case = _mk_case(rng, S=4, W=8, NT=96, kv_dtype=kv_dtype)
    q, kv_pool, pt, qip, qst, kvl, seg, pos = case
    scale = 32 ** -0.5
    got = attn_ops.ragged_prefill_attention_xla(
        q, kv_pool, pt, seg, pos, scale, layer=1
    )
    want = _padded_reference(q, kv_pool, pt, qip, qst, kvl, scale, layer=1)
    total_q = int(qip[-1])
    np.testing.assert_allclose(
        np.asarray(got[:total_q], np.float32), want[:total_q],
        rtol=2e-2 if kv_dtype else 2e-3, atol=2e-2 if kv_dtype else 2e-3,
    )


@pytest.mark.parametrize("kv_dtype", [None, jnp.float8_e4m3fn, "int8", "int4"])
@pytest.mark.parametrize("n_live", [4, 2, 1])
def test_ragged_pallas_interpret_matches_xla(kv_dtype, n_live):
    rng = jax.random.PRNGKey(2)
    case = _mk_case(rng, S=4, W=8, NT=96, kv_dtype=kv_dtype, n_live=n_live)
    q, kv_pool, pt, qip, qst, kvl, seg, pos = case
    scale = 32 ** -0.5
    want = attn_ops.ragged_prefill_attention_xla(
        q, kv_pool, pt, seg, pos, scale, layer=1
    )
    got = ragged_prefill_attention_pallas(
        q, kv_pool, pt, qip, qst, kvl, scale, layer=1,
        interpret=True, block_q=16,
    )
    total_q = int(qip[-1])
    # int8 path additionally quantizes q and p in-kernel (~1% tolerance);
    # the XLA reference only dequantizes K/V
    tol = 2e-3 if kv_dtype is None else (
        0.04 if kv_dtype in ("int8", "int4") else 2e-2)
    np.testing.assert_allclose(
        np.asarray(got[:total_q], np.float32),
        np.asarray(want[:total_q], np.float32),
        rtol=tol, atol=tol,
    )


def test_ragged_pallas_single_long_seq():
    """One sequence spanning many q blocks and KV chunks."""
    rng = jax.random.PRNGKey(3)
    S, W, NT = 2, 16, 272  # 256 q rows + block_q padding
    q, kv_pool, pt, qip, qst, kvl, seg, pos = _mk_case(
        rng, S=S, W=W, NT=NT, n_live=1, num_pages=64
    )
    # force a long chunk: 200 q rows on 40 prior tokens
    pt = np.zeros((S, W), np.int32)
    pages = np.arange(1, 16)
    pt[0, :15] = pages
    pt = jnp.asarray(pt)
    qip = jnp.asarray([0, 200, 200], jnp.int32)
    qst = jnp.asarray([40, 0], jnp.int32)
    kvl = jnp.asarray([240, 0], jnp.int32)
    pos = np.zeros(NT, np.int32)
    pos[:200] = 40 + np.arange(200)
    seg = np.zeros(NT, np.int32)
    scale = 32 ** -0.5
    want = attn_ops.ragged_prefill_attention_xla(
        q, kv_pool, pt, jnp.asarray(seg), jnp.asarray(pos), scale, layer=0
    )
    got = ragged_prefill_attention_pallas(
        q, kv_pool, pt, qip, qst, kvl, scale, layer=0,
        interpret=True, block_q=16,
    )
    np.testing.assert_allclose(
        np.asarray(got[:200], np.float32),
        np.asarray(want[:200], np.float32),
        rtol=2e-3, atol=2e-3,
    )
