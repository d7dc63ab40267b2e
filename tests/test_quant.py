"""Weight-only quantization unit tests."""

import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.ops.linear import (
    dense,
    quantize_int4,
    quantize_int8,
)


def _rel_err(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    ref = np.asarray(x @ w)
    q = quantize_int8(w)
    assert q["w"].dtype == jnp.int8
    assert q["scale"].shape == (64,)
    got = np.asarray(dense(x, q))
    assert _rel_err(got, ref) < 1.2e-2


def test_int4_roundtrip_error():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(256, 64)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
    ref = np.asarray(x @ w)
    q = quantize_int4(w, group_size=64)
    assert q["w"].dtype == jnp.uint8
    assert q["w"].shape == (128, 64)  # packed 2 values/byte
    assert q["scale"].shape == (4, 64)  # 256/64 groups
    got = np.asarray(dense(x, q))
    assert _rel_err(got, ref) < 0.15  # int4 noise floor ~step/sqrt(12) ~ 0.12


def test_int4_unpack_exact():
    """Packing must be lossless: unpack(pack(q)) == q for the nibble grid."""
    from nanovllmx_tpu.ops.linear import unpack_int4

    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(256, 32)), jnp.float32)
    q = quantize_int4(w, group_size=64)
    w8 = np.asarray(unpack_int4(q["w"]))
    assert w8.shape == (256, 32) and w8.min() >= -7 and w8.max() <= 7
    # reconstruct and compare against direct per-group quantization
    wf = np.asarray(w, np.float32).reshape(4, 64, 32)
    amax = np.abs(wf).max(axis=1, keepdims=True)
    scale = np.maximum(amax / 7.0, 1e-8)
    qref = np.clip(np.rint(wf / scale), -7, 7).reshape(256, 32)
    np.testing.assert_array_equal(w8, qref)


def test_int4_pallas_matches_xla():
    """The fused Pallas kernel (interpret mode) must match the XLA grouped
    formulation bit-for-bit modulo f32 accumulation order."""
    from nanovllmx_tpu.ops import linear as lin
    from nanovllmx_tpu.ops.pallas.int4_matmul import int4_matmul_pallas

    rng = np.random.default_rng(5)
    K, N, G = 512, 256, 128
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(12, K)), jnp.float32)
    q = quantize_int4(w, group_size=G)
    ref = np.asarray(dense(x, q))  # XLA path (backend defaults to xla)
    x8, xs = lin._quant_rows(x)
    got = np.asarray(int4_matmul_pallas(
        x8, xs, q["w"], q["scale"], G, interpret=True
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_int4_beats_nothing_int8_beats_int4():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    ref = np.asarray(x @ w)
    e8 = _rel_err(np.asarray(dense(x, quantize_int8(w))), ref)
    e4 = _rel_err(np.asarray(dense(x, quantize_int4(w, 64))), ref)
    assert e8 < e4 < 0.2


def test_stacked_layer_axis():
    # quant with a leading layer axis, as used by the scanned decoder
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(3, 64, 32)), jnp.float32)
    q = quantize_int8(w)
    assert q["w"].shape == (3, 64, 32)
    assert q["scale"].shape == (3, 32)
    x = jnp.asarray(rng.normal(size=(5, 64)), jnp.float32)
    for i in range(3):
        ref = np.asarray(x @ w[i])
        got = np.asarray(dense(x, {"w": q["w"][i], "scale": q["scale"][i]}))
        assert _rel_err(got, ref) < 1.2e-2


def test_bias_applied():
    w = jnp.eye(4, dtype=jnp.float32)
    b = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
    x = jnp.zeros((2, 4), jnp.float32)
    out = np.asarray(dense(x, {"w": w, "b": b}))
    np.testing.assert_allclose(out, np.tile(b, (2, 1)))
