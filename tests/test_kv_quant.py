"""int8 KV pool: write/gather roundtrip and scale bookkeeping.

The quantized pool is {"kv": int8 [L,2,P,ps,nkv,hd], "scale": f32 lane-tiled
[L,2,S128,128]} with per-token-per-plane symmetric scales (see
ops/attention.py module docstring).
"""

import numpy as np
import jax.numpy as jnp

from nanovllmx_tpu.ops.attention import (
    OOB_SLOT,
    gather_kv,
    make_kv_pool,
    pool_is_quantized,
    write_kv,
)


def test_make_pool_shapes():
    pool = make_kv_pool((3, 2, 8, 16, 2, 64), jnp.int8)
    assert pool_is_quantized(pool)
    assert pool["kv"].dtype == jnp.int8
    # 8*16=128 tokens -> 1 row, padded to 8 rows (Mosaic sublane alignment
    # for the decode kernel's VMEM preload; see make_kv_pool)
    assert pool["scale"].shape == (3, 2, 8, 128)
    raw = make_kv_pool((3, 2, 8, 16, 2, 64), jnp.bfloat16)
    assert not pool_is_quantized(raw)


def test_write_gather_roundtrip_within_quant_error():
    L, P, ps, nkv, hd = 3, 8, 16, 2, 64
    pool = make_kv_pool((L, 2, P, ps, nkv, hd), jnp.int8)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(5, nkv, hd)) * 3, jnp.float32)
    v = jnp.asarray(rng.normal(size=(5, nkv, hd)) * 0.5, jnp.float32)
    slots = jnp.asarray([0, 1, 17, 33, OOB_SLOT], jnp.int32)  # last dropped
    pool = write_kv(pool, k, v, slots, jnp.int32(1))
    pt = jnp.asarray([[0, 1, 2, 0]], jnp.int32)
    kg, vg = gather_kv(pool, pt, jnp.int32(1))
    kg, vg = np.asarray(kg), np.asarray(vg)
    for i, s in enumerate([0, 1, 17, 33]):
        for got, ref in ((kg, k), (vg, v)):
            err = np.abs(got[0, s] - np.asarray(ref[i])).max()
            bound = np.abs(np.asarray(ref[i])).max() / 127 * 0.51 + 1e-6
            assert err <= bound, (s, err, bound)
    # untouched slots and untouched layers stay exactly zero
    k0, _ = gather_kv(pool, pt, jnp.int32(0))
    assert np.all(np.asarray(k0) == 0)
    assert np.all(kg[0, 2] == 0)


def test_write_kv_unique_pages_row_rmw():
    """Decode's row-granular scale write (unique_pages=True) must match the
    element-scatter path exactly, including OOB drops."""
    import jax.numpy as jnp
    import numpy as np

    from nanovllmx_tpu.ops import attention as attn_ops

    rng = np.random.default_rng(0)
    L, P, ps, nkv, hd = 2, 8, 128, 2, 8
    pool = attn_ops.make_kv_pool((L, 2, P, ps, nkv, hd), jnp.int8)
    N = 5
    k = jnp.asarray(rng.normal(size=(N, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, nkv, hd)), jnp.float32)
    # distinct pages per row + one OOB padding row
    slots = jnp.asarray(
        np.array([0 * ps + 3, 2 * ps + 1, 5 * ps + 15, 7 * ps + 0,
                  attn_ops.OOB_SLOT], np.int32)
    )
    a = attn_ops.write_kv(pool, k, v, slots, jnp.int32(1))
    b = attn_ops.write_kv(pool, k, v, slots, jnp.int32(1), unique_pages=True)
    np.testing.assert_array_equal(np.asarray(a["kv"]), np.asarray(b["kv"]))
    np.testing.assert_allclose(
        np.asarray(a["scale"]), np.asarray(b["scale"]), rtol=0, atol=0
    )


def test_int4_write_gather_roundtrip_within_quant_error():
    """Head-pair-packed int4 pool: write/gather roundtrip (amax/7 scales,
    two heads per byte) bounds the reconstruction error."""
    from nanovllmx_tpu.ops.attention import pool_is_int4, pool_num_kv_heads

    L, P, ps, nkv, hd = 3, 8, 16, 2, 64
    pool = make_kv_pool((L, 2, P, ps, nkv, hd), jnp.int8, packed4=True)
    assert pool_is_int4(pool)
    assert pool["kv"].shape == (L, 2, P, ps, nkv // 2, hd)
    assert pool_num_kv_heads(pool) == nkv
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(5, nkv, hd)) * 3, jnp.float32)
    v = jnp.asarray(rng.normal(size=(5, nkv, hd)) * 0.5, jnp.float32)
    slots = jnp.asarray([0, 1, 17, 33, OOB_SLOT], jnp.int32)  # last dropped
    pool = write_kv(pool, k, v, slots, jnp.int32(1))
    pt = jnp.asarray([[0, 1, 2, 0]], jnp.int32)
    kg, vg = gather_kv(pool, pt, jnp.int32(1))
    kg = np.asarray(kg)[0]
    vg = np.asarray(vg)[0]
    for i, s in enumerate([0, 1, 17, 33]):
        # int4 step = amax/7: reconstruction within ~amax/14 + eps
        np.testing.assert_allclose(
            kg[s], np.asarray(k)[i], atol=float(np.abs(k[i]).max()) / 12
        )
        np.testing.assert_allclose(
            vg[s], np.asarray(v)[i], atol=float(np.abs(v[i]).max()) / 12
        )
    # other-layer planes untouched
    kg0, vg0 = gather_kv(pool, pt, jnp.int32(0))
    assert np.all(np.asarray(kg0) == 0) and np.all(np.asarray(vg0) == 0)
