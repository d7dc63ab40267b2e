"""Functional core ops: RMSNorm, rotary embedding, SwiGLU.

TPU-native counterparts of the reference's torch.compile'd modules
(`nanovllmx/layers/layernorm.py`, `rotary_embedding.py`, `activation.py`).
Everything here lives inside `jax.jit`-compiled step functions, so XLA fuses
these elementwise ops into the surrounding matmuls — no separate compile
mechanism needed (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in fp32 compute, cast back to input dtype
    (ref `layers/layernorm.py:16-36`)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def rms_norm_residual(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-6
) -> tuple[jax.Array, jax.Array]:
    """Fused add-residual RMSNorm: returns (normed(x + residual), x + residual)
    (ref `layers/layernorm.py` fused path)."""
    res = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(res, weight, eps), res


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float,
    scaling_type: str = "none", scaling_factor: float = 1.0,
    low_freq_factor: float = 1.0, high_freq_factor: float = 4.0,
    orig_max_pos: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given absolute positions.

    Computed on the fly from positions (cheap VPU work fused by XLA) instead
    of the reference's precomputed max-position cache
    (`layers/rotary_embedding.py:62-71`) — avoids a large HBM table and works
    for any position without a capacity knob.

    `scaling_type` applies HF `rope_scaling`:
      - "none": plain RoPE.
      - "linear": positions divided by `scaling_factor` (HF
        LinearScalingRotaryEmbedding).
      - "llama3": Llama-3.1 frequency-band scaling — wavelengths longer
        than `orig_max_pos / low_freq_factor` are slowed by
        `scaling_factor`, shorter than `orig_max_pos / high_freq_factor`
        kept, and the band between them smoothly interpolated (matches
        transformers `_compute_llama3_parameters`).
    Returns (cos, sin), each `positions.shape + (head_dim // 2,)`, fp32.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / float(half))
    )
    if scaling_type == "llama3":
        low_wavelen = orig_max_pos / low_freq_factor
        high_wavelen = orig_max_pos / high_freq_factor
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (orig_max_pos / wavelen - low_freq_factor) / (
            high_freq_factor - low_freq_factor
        )
        interp = ((1.0 - smooth) * inv_freq / scaling_factor
                  + smooth * inv_freq)
        inv_freq = jnp.where(
            wavelen > low_wavelen,
            inv_freq / scaling_factor,
            jnp.where(wavelen < high_wavelen, inv_freq, interp),
        )
    elif scaling_type == "linear":
        inv_freq = inv_freq / scaling_factor
    elif scaling_type != "none":
        raise NotImplementedError(
            f"rope_scaling type {scaling_type!r} is not supported "
            "(supported: none, linear, llama3)"
        )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Non-interleaved (HF half-split) rotary embedding
    (ref `layers/rotary_embedding.py:5-24`).

    x: [..., num_heads, head_dim]; cos/sin: [..., head_dim//2] broadcast over
    the head axis.
    """
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[..., None, :]
    s = sin[..., None, :]
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def silu_and_mul(x: jax.Array) -> jax.Array:
    """SwiGLU activation on a fused gate|up projection output
    (ref `layers/activation.py:15-25`): x = [..., 2*I] -> silu(gate) * up."""
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up


def gelu_and_mul(x: jax.Array) -> jax.Array:
    """GeGLU (tanh approximation), ref `layers/activation.py:28-37`."""
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(x.dtype) * up
