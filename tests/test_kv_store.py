"""Interpret-mode tests for the Pallas KV+scale store kernels.

Ground truth is the plain XLA formulation: `.at[idx].set` for rows and the
flat element scatter for scales (`ops/attention.write_kv` fallback paths).
The kernels take the pool/scale plane in NATIVE shapes ([L,2,P,ps,nkv,hd] /
[L,2,S128,128]); tests compare against flat-view expectations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllmx_tpu.ops.pallas.kv_write import (
    PrefillStorePlan,
    scatter_kv_rows,
    store_kv_prefill,
)

L, P, PS, NKV, HD = 2, 8, 128, 2, 128
PT = P * PS  # tokens per plane


def _pool():
    rng = np.random.default_rng(0)
    pool = rng.integers(-50, 50, (L, 2, P, PS, NKV, HD)).astype(np.int8)
    scale = rng.uniform(0.01, 0.02, (L, 2, P, 128)).astype(np.float32)
    return pool, scale


def test_scatter_rows_with_scales_matches_xla():
    rng = np.random.default_rng(1)
    pool, scale = _pool()
    N = 5
    layer = 1
    # distinct pages per token (decode guarantee)
    slots = np.array(
        [0 * PS + 3, 2 * PS + 127, 5 * PS, 6 * PS + 64, 7 * PS + 1]
    )
    rows8 = rng.integers(-127, 127, (2 * N, NKV, HD)).astype(np.int8)
    svals = rng.uniform(0.05, 0.1, 2 * N).astype(np.float32)
    # add one OOB padding slot (dropped)
    slots_p = np.concatenate([slots, [1 << 30]]).astype(np.int32)
    rows_p = np.concatenate(
        [rows8[:N], rows8[:1], rows8[N:], rows8[:1]]
    )
    svals_p = np.concatenate(
        [svals[:N], [9.9], svals[N:], [9.9]]
    ).astype(np.float32)

    Np = len(slots_p)
    rows_il = np.stack([rows_p[:Np], rows_p[Np:]], axis=1)
    got_pool, got_scale = scatter_kv_rows(
        jnp.asarray(pool), jnp.asarray(rows_il), layer,
        jnp.asarray(slots_p),
        scale=jnp.asarray(scale), svals=jnp.asarray(svals_p),
        interpret=True,
    )

    idx = np.concatenate([
        layer * 2 * PT + slots, layer * 2 * PT + PT + slots,
    ])
    exp_flat = pool.reshape(L * 2 * PT, NKV, HD).copy()
    exp_flat[idx] = rows8
    exp_s = scale.reshape(-1).copy()
    exp_s[idx] = svals  # scale layout == token layout at ps=128
    np.testing.assert_array_equal(
        np.asarray(got_pool).reshape(L * 2 * PT, NKV, HD), exp_flat
    )
    np.testing.assert_allclose(
        np.asarray(got_scale).reshape(-1), exp_s, rtol=0, atol=0
    )


@pytest.mark.parametrize("spans", [
    # (start, end) token spans; pages assigned disjointly per span
    [(0, 256)],                      # page-aligned full pages
    [(100, 612)],                    # partial head + full + partial tail
    [(0, 300), (384, 500), (77, 80)],  # multiple sequences, odd cuts
])
def test_store_prefill_matches_xla(spans):
    rng = np.random.default_rng(2)
    pool, scale = _pool()
    layer = 0
    N = sum(e - s for s, e in spans)
    rows8 = rng.integers(-127, 127, (2 * N, NKV, HD)).astype(np.int8)
    svals = rng.uniform(0.05, 0.1, 2 * N).astype(np.float32)

    plan = PrefillStorePlan(16, 64, 64, 16, page_size=PS)
    slots = []
    off = 0
    next_page = 0
    for s, e in spans:
        npages = (e - 1) // PS + 1
        pages = [(next_page + i) % P for i in range(npages)]
        next_page += npages
        plan.add_span(s, e, pages, off)
        for pos in range(s, e):
            slots.append(pages[pos // PS] * PS + pos % PS)
        off += e - s
    slots = np.asarray(slots, np.int64)

    lanes = np.arange(128)[None, :]
    idx = np.clip(plan.swin0[:, None] + lanes, 0, N - 1)
    snew = np.stack([svals[:N][idx], svals[N:][idx]])

    got_pool, got_scale = store_kv_prefill(
        jnp.asarray(pool), jnp.asarray(rows8), layer,
        dict(zip(
            ("full_dst", "full_src", "b16_dst", "b16_src",
             "row_dst", "row_src", "spage", "smask", "swin0"),
            [jnp.asarray(a) for a in plan.arrays()],
        )),
        scale=jnp.asarray(scale), snew=jnp.asarray(snew),
        interpret=True,
    )

    idx = np.concatenate([
        layer * 2 * PT + slots, layer * 2 * PT + PT + slots,
    ])
    exp_flat = pool.reshape(L * 2 * PT, NKV, HD).copy()
    exp_flat[idx] = rows8
    exp_s = scale.reshape(-1).copy()
    exp_s[idx] = svals  # scale layout == token layout at ps=128
    np.testing.assert_array_equal(
        np.asarray(got_pool).reshape(L * 2 * PT, NKV, HD), exp_flat
    )
    np.testing.assert_allclose(
        np.asarray(got_scale).reshape(-1), exp_s, rtol=0, atol=0
    )


def test_store_prefill_bf16_rows_only():
    rng = np.random.default_rng(3)
    pool = rng.normal(size=(L, 2, P, PS, NKV, HD)).astype(np.float32)
    rows = rng.normal(size=(2 * 140, NKV, HD)).astype(np.float32)
    plan = PrefillStorePlan(8, 16, 32, 8, page_size=PS)
    pages = [3, 5]
    plan.add_span(60, 200, pages, 0)
    slots = np.asarray(
        [pages[p // PS] * PS + p % PS for p in range(60, 200)], np.int64
    )
    got = store_kv_prefill(
        jnp.asarray(pool), jnp.asarray(rows), 1,
        dict(zip(
            ("full_dst", "full_src", "b16_dst", "b16_src",
             "row_dst", "row_src", "spage", "smask", "swin0"),
            [jnp.asarray(a) for a in plan.arrays()],
        )),
        interpret=True,
    )
    idx = np.concatenate([1 * 2 * PT + slots, 1 * 2 * PT + PT + slots])
    exp = pool.reshape(L * 2 * PT, NKV, HD).copy()
    exp[idx] = rows
    np.testing.assert_array_equal(
        np.asarray(got).reshape(L * 2 * PT, NKV, HD), exp
    )


def test_scatter_rows_no_scales_small_page():
    """Non-quantized scatter at ps=16 (pool layout with sub-128 pages)."""
    rng = np.random.default_rng(4)
    ps = 16
    pool = rng.normal(size=(L, 2, 32, ps, NKV, HD)).astype(np.float32)
    pt = 32 * ps
    N = 4
    slots = np.array([3, 17, 250, 1 << 30], np.int32)  # last OOB
    rows = rng.normal(size=(2 * N, NKV, HD)).astype(np.float32)
    got = scatter_kv_rows(
        jnp.asarray(pool), jnp.asarray(np.stack([rows[:N], rows[N:]], 1)),
        1, jnp.asarray(slots), interpret=True,
    )
    valid = slots[:3]
    idx = np.concatenate([1 * 2 * pt + valid, 1 * 2 * pt + pt + valid])
    exp = pool.reshape(L * 2 * pt, NKV, HD).copy()
    exp[idx] = np.concatenate([rows[:3], rows[N:N + 3]])
    np.testing.assert_array_equal(
        np.asarray(got).reshape(L * 2 * pt, NKV, HD), exp
    )
