"""Batched sampler: temperature / top-k / top-p / min-p, fully inside jit.

jnp port of the reference sampler (`nanovllmx/layers/sampler.py`): fp32
temperature scaling, sort-based joint top-k/top-p masking (`:58-90`), min-p
(`:93-106`) — with the Gumbel-max trick replacing `torch.multinomial` (an
argmax instead of an inverse-CDF, which is the TPU-friendly form), and the
reference's temperature-0 division-by-zero bug fixed: temperature == 0 rows
take the greedy argmax explicitly (`sampler.py:41`, SURVEY.md §2 item 29).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def sample(
    logits: jax.Array,      # [B, V]
    temperatures: jax.Array,  # [B] fp32; 0 => greedy
    top_ps: jax.Array,        # [B] fp32 in (0, 1]
    top_ks: jax.Array,        # [B] int32; -1 or 0 => disabled
    min_ps: jax.Array,        # [B] fp32 in [0, 1]
    key: jax.Array,           # PRNG key
) -> jax.Array:
    """Returns sampled token ids [B] int32."""
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # temperature scaling (guard the greedy rows against div-by-zero)
    safe_t = jnp.maximum(temperatures, 1e-6)[:, None]
    scaled = logits / safe_t

    # descending sort once; all filters work in sorted space
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    sorted_idx = jnp.argsort(scaled, axis=-1)[:, ::-1].astype(jnp.int32)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)

    rank = jnp.arange(V)[None, :]
    k = jnp.where(top_ks <= 0, V, top_ks)[:, None]
    keep = rank < k
    # nucleus: keep the smallest prefix whose mass reaches top_p
    # (cumulative mass BEFORE this token < top_p keeps at least one token)
    keep &= (cum - probs) < top_ps[:, None]
    # min-p: drop tokens with prob < min_p * max_prob (ref sampler.py:93-106)
    keep &= probs >= (min_ps[:, None] * probs[:, :1])

    masked = jnp.where(keep, sorted_logits, NEG_INF)
    gumbel = jax.random.gumbel(key, shape=(B, V), dtype=jnp.float32)
    choice = jnp.argmax(masked + gumbel, axis=-1)
    sampled = jnp.take_along_axis(sorted_idx, choice[:, None], axis=-1)[:, 0]

    return jnp.where(temperatures <= 0.0, greedy, sampled).astype(jnp.int32)
