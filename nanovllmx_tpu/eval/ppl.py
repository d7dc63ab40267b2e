"""Perplexity / teacher-forced log-likelihood evaluation.

The accuracy gate for quantization (BASELINE.json): INT8 within 0.1 and INT4
within 0.3 perplexity of bf16. This harness computes teacher-forced
perplexity of a token stream through the production forward pass (paged KV,
chunked exactly like prefill). Point it at WikiText-2 token ids when a
tokenized corpus is available; the test suite gates on synthetic corpora
(this image has no network egress or datasets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.models.decoder import ModelSpec, compute_logits, forward_hidden
from nanovllmx_tpu.ops.attention import make_kv_pool, paged_prefill_attention_xla


def sequence_nll(
    params: dict,
    spec: ModelSpec,
    token_ids: list[int],
    page_size: int = 16,
    chunk: int = 256,
    kv_dtype=None,
) -> tuple[float, int]:
    """Sum of -log p(t_i | t_<i) over i >= 1, and the count of scored tokens."""
    L = len(token_ids)
    if L < 2:
        return 0.0, 0
    ps = page_size
    num_pages = -(-L // ps)
    kv_dtype = kv_dtype or jnp.bfloat16
    packed4 = kv_dtype == "int4"
    kv_pool = make_kv_pool(
        (spec.num_layers, 2, num_pages, ps, spec.num_kv_heads, spec.head_dim),
        jnp.int8 if packed4 else kv_dtype,
        packed4=packed4,
    )
    page_table = jnp.asarray(np.arange(num_pages, dtype=np.int32)[None, :])
    ids = np.asarray(token_ids, np.int32)

    @jax.jit
    def step(kv_pool, tok, pos, kv_len, q_start, slots):
        Tc = tok.shape[0]

        def attend(q, kv_pool, layer):
            q = q.reshape(1, Tc, spec.num_heads, spec.head_dim)
            out = paged_prefill_attention_xla(
                q, kv_pool, page_table, kv_len, q_start, spec.scale,
                layer=layer,
            )
            return out.reshape(Tc, spec.num_heads, spec.head_dim)

        hidden, kv_pool = forward_hidden(
            params, spec, tok, pos, kv_pool, slots, attend
        )
        logits = compute_logits(params, spec, hidden)  # [Tc, V]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return kv_pool, logp

    total = 0.0
    count = 0
    for start in range(0, L, chunk):
        end = min(L, start + chunk)
        n = end - start
        pad = chunk - n
        tok = np.zeros(chunk, np.int32)
        tok[:n] = ids[start:end]
        pos = np.arange(start, start + chunk, dtype=np.int32)
        from nanovllmx_tpu.ops.attention import OOB_SLOT
        slots = np.full(chunk, OOB_SLOT, np.int32)
        slots[:n] = pos[:n]
        kv_pool, logp = step(
            kv_pool, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray([end], np.int32), jnp.asarray([start], np.int32),
            jnp.asarray(slots),
        )
        logp = np.asarray(logp)
        # position p predicts token_ids[p+1]
        for p in range(n):
            gpos = start + p
            if gpos + 1 < L:
                total -= float(logp[p, ids[gpos + 1]])
                count += 1
        del pad
    return total, count


def perplexity(params, spec, token_ids, **kw) -> float:
    nll, count = sequence_nll(params, spec, token_ids, **kw)
    if count == 0:
        return float("inf")
    return float(np.exp(nll / count))


def perplexity_of_corpus(params, spec, corpus: list[list[int]], **kw) -> float:
    nll, count = 0.0, 0
    for seq in corpus:
        n, c = sequence_nll(params, spec, seq, **kw)
        nll += n
        count += c
    return float(np.exp(nll / max(count, 1)))
