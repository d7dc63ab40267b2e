"""Flash-style XLA prefill attention vs a brute-force dense reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from nanovllmx_tpu.ops.attention import paged_prefill_attention_xla


def dense_reference(q, kv_layer, page_table, kv_lens, q_start, scale):
    """O(Tc*S) per-sequence dense attention with explicit loops (numpy)."""
    q = np.asarray(q, np.float32)
    kv = np.asarray(kv_layer, np.float32)[1]  # tests address layer 1
    pt = np.asarray(page_table)
    B, Tc, nq, hd = q.shape
    _, P, ps, nkv, _ = kv.shape
    g = nq // nkv
    out = np.zeros_like(q)
    for b in range(B):
        L = int(kv_lens[b])
        ks, vs = [], []
        for t in range(L):
            page = pt[b, t // ps]
            ks.append(kv[0, page, t % ps])  # [nkv, hd]
            vs.append(kv[1, page, t % ps])
        if not ks:
            continue
        K = np.stack(ks)  # [L, nkv, hd]
        V = np.stack(vs)
        for ti in range(Tc):
            pos = int(q_start[b]) + ti
            for h in range(nq):
                kvh = h // g
                s = (K[:, kvh] @ q[b, ti, h]) * scale  # [L]
                m = np.arange(L) <= pos
                s = np.where(m, s, -1e30)
                p = np.exp(s - s.max())
                p = p / p.sum()
                out[b, ti, h] = p @ V[:, kvh]
    return out


def make_case(B, Tc, nq, nkv, hd, ps, W, kv_lens, q_start, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, Tc, nq, hd)), jnp.float32)
    P = 64
    kv = jnp.asarray(rng.normal(size=(2, 2, P, ps, nkv, hd)), jnp.float32)
    pt = np.zeros((B, W), np.int32)
    nxt = 1
    for b in range(B):
        for i in range(-(-int(kv_lens[b]) // ps)):
            pt[b, i] = nxt % P
            nxt += 1
    return q, kv, jnp.asarray(pt), np.asarray(kv_lens, np.int32), np.asarray(q_start, np.int32)


@pytest.mark.parametrize("case", [
    # (Tc, kv_lens, q_start): fresh prefill from position 0
    (8, [8, 5], [0, 0]),
    # continued chunk: queries start mid-sequence with cached prefix
    (8, [24, 20], [16, 12]),
    # kv wider than one block (block_pages=2 -> 8-token blocks)
    (16, [40, 33], [24, 17]),
])
def test_matches_dense(case):
    Tc, kv_lens, q_start = case
    B = len(kv_lens)
    q, kv, pt, lens, qs = make_case(B, Tc, 4, 2, 16, 4, 16, kv_lens, q_start)
    got = paged_prefill_attention_xla(
        q, kv, pt, jnp.asarray(lens), jnp.asarray(qs), scale=0.25,
        block_pages=2, layer=1,
    )
    ref = dense_reference(q, kv, pt, lens, qs, scale=0.25)
    got = np.asarray(got)
    # compare only valid query rows (ti < kv_lens - q_start)
    for b in range(B):
        valid = int(lens[b]) - int(qs[b])
        np.testing.assert_allclose(got[b, :valid], ref[b, :valid],
                                   rtol=2e-3, atol=2e-3)


def test_padding_rows_inert():
    # row with kv_len 0 must not produce NaN
    q, kv, pt, lens, qs = make_case(2, 8, 4, 2, 16, 4, 16, [12, 0], [4, 0])
    got = np.asarray(paged_prefill_attention_xla(
        q, kv, pt, jnp.asarray(lens), jnp.asarray(qs), scale=0.25,
        block_pages=2, layer=1,
    ))
    assert not np.isnan(got).any()
    assert np.all(got[1] == 0)
