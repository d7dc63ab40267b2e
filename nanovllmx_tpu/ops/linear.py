"""Dense projection with weight-only quantization dispatch.

The reference has no quantization (dtype straight from HF config,
`core/model_runner.py:38-39`); INT8/INT4 weight-only + scales is added scope
per BASELINE.json. INT8 runs W8A8: activations quantize dynamically per row
and the dot runs on the native int8 MXU (dequantizing weights to bf16 inside
each dot was measured as the dominant non-attention decode cost on v5e).
INT4 stores weights PACKED two-per-byte (half the HBM stream of int8 — the
point of int4 for HBM-bound decode) with per-group scales, and runs either
the fused Pallas dequant-matmul kernel (ops/pallas/int4_matmul.py, TPU) or
an equivalent XLA grouped formulation (CPU / sharded fallbacks).

Weight param formats (leading dims may include a stacked layer axis L):
  bf16:  {"w": [..., in, out]}                        (+ optional "b")
  int8:  {"w": int8 [..., in, out], "scale": f32 [..., out]}   per-channel
  int4:  {"w": uint8 [..., in/2, out] split-half packed (byte row r = row r
          low nibble | row r+in/2 high nibble, offset-8 nibbles),
          "scale": f32 [..., in // G, out]}           per-group
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# int4 matmul backend: "xla" (portable) or "pallas" (fused TPU kernel).
# Set by ModelRunner at init — a trace-time Python constant, like the
# attention backend selection.
_INT4_BACKEND = "xla"


def set_int4_backend(name: str) -> None:
    global _INT4_BACKEND
    assert name in ("xla", "pallas"), name
    _INT4_BACKEND = name


def dense(x: jax.Array, p: dict) -> jax.Array:
    """x: [..., in] @ p -> [..., out]."""
    w = p["w"]
    if w.dtype == jnp.uint8:  # packed int4, per-group scales
        out = _int4_dense(x, p)
    elif w.dtype == jnp.int8 and "scale" in p:
        # per-channel int8 -> W8A8 on the native int8 MXU.
        # Dynamic per-row activation quantization: avoids materialising
        # a dequantized bf16 weight copy (measured as the dominant
        # non-attention decode cost on v5e) and runs the dot at int8
        # MXU rate (2x bf16). Accuracy is gated by the perplexity
        # harness (tests/test_quant_accuracy.py).
        scale = p["scale"]
        x8, xs = _quant_rows(x)
        acc = jax.lax.dot_general(
            x8, w,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = (acc.astype(jnp.float32) * xs * scale.astype(jnp.float32))
        out = out.astype(x.dtype)
    else:
        out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
    if "b" in p and p["b"] is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def _quant_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 activation quantization: (x8, scales)."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-8
    )
    return jnp.round(xf / xs).astype(jnp.int8), xs


def unpack_int4(wp: jax.Array) -> jax.Array:
    """[..., K/2, N] packed uint8 -> [..., K, N] int8 in [-8, 7]."""
    w32 = wp.astype(jnp.int32)
    low = (w32 & 15) - 8
    high = (w32 >> 4) - 8
    return jnp.concatenate([low, high], axis=-2).astype(jnp.int8)


def _int4_dense(x: jax.Array, p: dict) -> jax.Array:
    wp, scale = p["w"], p["scale"]
    K = 2 * wp.shape[-2]
    N = wp.shape[-1]
    ng = scale.shape[-2]
    G = K // ng
    x8, xs = _quant_rows(x)
    if (
        _INT4_BACKEND == "pallas"
        and x.ndim == 2 and wp.ndim == 2
        and N % 128 == 0 and (K // 2) % G == 0
    ):
        from nanovllmx_tpu.ops.pallas.int4_matmul import int4_matmul_pallas

        out = int4_matmul_pallas(x8, xs, wp, scale, G)
        return out.astype(x.dtype)
    # XLA path: identical math (activation-quantized grouped int8 dots) so
    # the perplexity gate measured here governs the kernel path too.
    w8 = unpack_int4(wp)
    xg = x8.reshape(*x8.shape[:-1], ng, G)
    wg = w8.reshape(*w8.shape[:-2], ng, G, N)
    part = jnp.einsum(
        "...mgk,...gkn->...mgn", xg, wg, preferred_element_type=jnp.int32
    )
    out = (part.astype(jnp.float32) * scale[..., None, :, :]).sum(-2) * xs
    return out.astype(x.dtype)


# ---------------------------------------------------------------- quantizers


def quantize_embed_rows(w: jax.Array) -> dict:
    """Per-ROW symmetric int8 for an embedding table [V, H].

    One scale per vocab row serves BOTH uses of a tied table: the embedding
    gather dequantizes the taken rows (`x8[v] * s[v]`), and the tied logits
    matmul uses the same vector as per-output-channel scales
    (`logits[:, v] = (h8 @ w8[v]) * hs * s[v]`) — so the 311 MB bf16
    lm_head read per decode step (Qwen3-0.6B) becomes a 155 MB int8 read
    at int8 MXU rate."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.round(wf / scale[:, None]).astype(jnp.int8)
    return {"w": q, "scale": scale}


def quantize_int8(w: jax.Array) -> dict:
    """Per-output-channel symmetric int8: w [..., in, out]."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # over `in`
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w": q, "scale": scale.squeeze(-2).astype(jnp.float32)}


def quantize_int4(w: jax.Array, group_size: int = 128) -> dict:
    """Per-group symmetric int4, PACKED two values per byte (range [-7, 7],
    stored offset-8 so nibbles are 1..15); scale [..., in // G, out].

    Split-half packing: byte row r = row r (low nibble) | row r + in/2
    (high nibble) — unpacking is two contiguous row ranges, no interleave
    (see ops/pallas/int4_matmul.py). The group size is shrunk via gcd so
    every group lies entirely within one nibble half."""
    import math

    in_dim, out_dim = w.shape[-2], w.shape[-1]
    if in_dim % 2:
        raise ValueError(f"int4 packing needs an even in_dim, got {in_dim}")
    G = math.gcd(group_size, in_dim // 2)
    ng = in_dim // G
    wf = w.astype(jnp.float32).reshape(*w.shape[:-2], ng, G, out_dim)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(*w.shape[:-2], in_dim, out_dim) + 8
    half = in_dim // 2
    packed = (q[..., :half, :] | (q[..., half:, :] << 4)).astype(jnp.uint8)
    return {"w": packed, "scale": scale.squeeze(-2).astype(jnp.float32)}
