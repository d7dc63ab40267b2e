"""Batched sampler: temperature / top-k / top-p / min-p, fully inside jit.

Port of the reference sampler semantics (`nanovllmx/layers/sampler.py`) with
two TPU-first changes:

* **No full-vocab sort.** The reference sorts [B, V] every step
  (`sampler.py:58-90`); on a 152k vocab inside a decode loop that dominates
  the step. Here the common path (no top-k/top-p/min-p filters) is a pure
  Gumbel-max: `argmax(logits/T + gumbel)` — one reduction. When any filter is
  active, filtering runs on the top-`TOPK_CAP` logits only (`jax.lax.top_k`),
  which is exact for top-k <= cap and for any realistic top-p mass; both
  branches sit under `lax.cond` so only the needed one executes.
* temperature == 0 rows take the greedy argmax explicitly (the reference
  divides by zero, `sampler.py:41`).

Sampling from softmax(x) == argmax(x + Gumbel noise) (Gumbel-max trick) —
the TPU-friendly replacement for `torch.multinomial`'s inverse CDF.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30
TOPK_CAP = 128  # filters act on this many top logits (top_k is clamped to it)


def sample(
    logits: jax.Array,        # [B, V]
    temperatures: jax.Array,  # [B] fp32; 0 => greedy
    top_ps: jax.Array,        # [B] fp32 in (0, 1]
    top_ks: jax.Array,        # [B] int32; -1 or 0 => disabled
    min_ps: jax.Array,        # [B] fp32 in [0, 1]
    key: jax.Array,           # PRNG key
) -> jax.Array:
    """Returns sampled token ids [B] int32."""
    logits = logits.astype(jnp.float32)
    B, V = logits.shape

    safe_t = jnp.maximum(temperatures, 1e-6)[:, None]
    scaled = logits / safe_t
    gumbel_key, subset_key = jax.random.split(key)

    need_filter = jnp.any(
        (top_ks > 0) | (top_ps < 1.0) | (min_ps > 0.0)
    )

    def pure_gumbel(_):
        # greedy rows fold in here for free: zeroed noise makes the argmax
        # over scaled logits exactly argmax(logits) (positive scaling
        # preserves the argmax), so the common path is ONE [B, V] pass
        g = jax.random.gumbel(gumbel_key, (B, V), jnp.float32)
        g = jnp.where(temperatures[:, None] <= 0.0, 0.0, g)
        return jnp.argmax(scaled + g, axis=-1).astype(jnp.int32)

    def filtered(_):
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        cap = min(TOPK_CAP, V)
        top_vals, top_idx = jax.lax.top_k(scaled, cap)  # descending [B, cap]
        probs = jax.nn.softmax(top_vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        rank = jnp.arange(cap)[None, :]
        k = jnp.where(top_ks <= 0, cap, jnp.minimum(top_ks, cap))[:, None]
        keep = rank < k
        # nucleus: smallest prefix reaching top_p mass (>= 1 token kept).
        # NOTE: mass is measured within the top-`cap` subset — exact whenever
        # the nucleus lies inside it, which holds for any practical top_p.
        keep &= (cum - probs) < top_ps[:, None]
        keep &= probs >= (min_ps[:, None] * probs[:, :1])
        masked = jnp.where(keep, top_vals, NEG_INF)
        g = jax.random.gumbel(subset_key, (B, cap), jnp.float32)
        choice = jnp.argmax(masked + g, axis=-1)
        picked = jnp.take_along_axis(
            top_idx, choice[:, None], axis=-1
        )[:, 0].astype(jnp.int32)
        return jnp.where(temperatures <= 0.0, greedy, picked).astype(jnp.int32)

    return jax.lax.cond(need_filter, filtered, pure_gumbel, operand=None)
