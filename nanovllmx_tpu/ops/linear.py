"""Dense projection with weight-only quantization dispatch.

The reference has no quantization (dtype straight from HF config,
`core/model_runner.py:38-39`); INT8/INT4 weight-only + scales is added scope
per BASELINE.json. INT8 runs W8A8: activations quantize dynamically per row
and the dot runs on the native int8 MXU (dequantizing weights to bf16 inside
each dot was measured as the dominant non-attention decode cost on v5e).
INT4 uses per-group scales with an XLA dequant matmul (a fused Pallas
dequant-matmul kernel is future work).

Weight param formats (leading dims may include a stacked layer axis L):
  bf16:  {"w": [..., in, out]}                        (+ optional "b")
  int8:  {"w": int8 [..., in, out], "scale": f32 [..., out]}   per-channel
  int4:  {"w": int8 [..., in, out] (values in [-8, 7]),
          "scale": f32 [..., in // group, out]}       per-group
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense(x: jax.Array, p: dict) -> jax.Array:
    """x: [..., in] @ p -> [..., out]."""
    w = p["w"]
    if w.dtype == jnp.int8 and "scale" in p:
        scale = p["scale"]
        if scale.ndim == w.ndim:  # per-group (int4 packing convention)
            out = _group_quant_matmul(x, w, scale)
        else:  # per-channel int8 -> W8A8 on the native int8 MXU
            # Dynamic per-row activation quantization: avoids materialising
            # a dequantized bf16 weight copy (measured as the dominant
            # non-attention decode cost on v5e) and runs the dot at int8
            # MXU rate (2x bf16). Accuracy is gated by the perplexity
            # harness (tests/test_quant_accuracy.py).
            xf = x.astype(jnp.float32)
            xs = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-8
            )
            x8 = jnp.round(xf / xs).astype(jnp.int8)
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


def _group_quant_matmul(x: jax.Array, w: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-group dequant matmul: scale is [in // G, out]; XLA fallback
    dequantizes per group then runs one matmul."""
    in_dim, out_dim = w.shape[-2], w.shape[-1]
    num_groups = scale.shape[-2]
    g = in_dim // num_groups
    wf = w.astype(x.dtype).reshape(*w.shape[:-2], num_groups, g, out_dim)
    wf = wf * scale[..., :, None, :].astype(x.dtype)
    wf = wf.reshape(*w.shape[:-2], in_dim, out_dim)
    return jnp.dot(x, wf, preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------- quantizers


def quantize_int8(w: jax.Array) -> dict:
    """Per-output-channel symmetric int8: w [..., in, out]."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # over `in`
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w": q, "scale": scale.squeeze(-2).astype(jnp.float32)}


def quantize_int4(w: jax.Array, group_size: int = 128) -> dict:
    """Per-group symmetric int4 (stored sign-extended in int8, range [-7, 7]);
    scale [..., in // G, out]."""
    in_dim, out_dim = w.shape[-2], w.shape[-1]
    if in_dim % group_size:
        group_size = in_dim  # degenerate: one group
    ng = in_dim // group_size
    wf = w.astype(jnp.float32).reshape(*w.shape[:-2], ng, group_size, out_dim)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(*w.shape[:-2], in_dim, out_dim)
    return {"w": q, "scale": scale.squeeze(-2).astype(jnp.float32)}
