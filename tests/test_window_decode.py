"""Deferred-window decode superstep vs the per-step-store XLA path (CPU).

Forces the Pallas backend with interpret-mode kernels and compares a full
engine-path decode superstep (greedy) against an XLA-backend runner on the
same fabricated state: tokens must match exactly for bf16 pools, and the
pool contents written by the bulk store must match the per-step store.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nanovllmx_tpu.ops.pallas.decode_attention as da
import nanovllmx_tpu.ops.pallas.kv_write as kw
from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.sequence import (
    ForwardBatch, ForwardMode, ScheduledSeq, Sequence,
)
from nanovllmx_tpu.models.decoder import ModelSpec
from nanovllmx_tpu.runner.model_runner import ModelRunner
from nanovllmx_tpu.sampling_params import SamplingParams
from nanovllmx_tpu.weights.loader import init_random_params


SPEC = ModelSpec(
    vocab_size=256, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=128, use_qk_norm=True,
    tie_embeddings=True, dtype="float32",
)


@pytest.fixture(autouse=True)
def _interpret_kernels(monkeypatch):
    monkeypatch.setattr(
        da, "paged_decode_attention_pallas",
        functools.partial(da.paged_decode_attention_pallas, interpret=True),
    )
    monkeypatch.setattr(
        kw, "store_kv_prefill",
        functools.partial(kw.store_kv_prefill, interpret=True),
    )
    monkeypatch.setattr(
        kw, "scatter_kv_rows",
        functools.partial(kw.scatter_kv_rows, interpret=True),
    )


def _make_runner(backend: str, params):
    cfg = EngineConfig(
        model="<test>", max_bs=8, context_len=256, page_size=16,
        prefill_chunk=64, max_num_batched_tokens=64, num_kv_pages=128,
        dtype="fp32", decode_lookahead=4, attention_backend=backend,
    )
    return ModelRunner(cfg, params=params, spec=SPEC)


def _decode_batch(runner, rng, lens):
    ps = runner.config.page_size
    seqs = []
    next_page = 0
    for i, ln in enumerate(lens):
        s = Sequence(
            seq_id=f"s{i}", token_ids=list(rng.integers(1, 200, ln + 4)),
            prompt_len=ln, params=SamplingParams(temperature=0.0,
                                                 ignore_eos=True),
        )
        npg = -(-(ln + runner.config.decode_lookahead) // ps)
        s.page_ids = list(range(next_page, next_page + npg))
        next_page += npg
        s.cached_len = ln
        seqs.append(s)
    K = runner.config.decode_lookahead
    return ForwardBatch(ForwardMode.DECODE, [
        ScheduledSeq(seq=s, start=ln, end=ln + K)
        for s, ln in zip(seqs, lens)
    ]), seqs


def _materialize_prefix(runner, rng, lens):
    """Write random (but shared-seed) K/V prefixes directly into the pool
    so both runners start from identical KV state."""
    from nanovllmx_tpu.ops import attention as attn_ops

    s = SPEC
    ps = runner.config.page_size
    pool = runner.kv_pool
    next_page = 0
    for i, ln in enumerate(lens):
        npg = -(-(ln + runner.config.decode_lookahead) // ps)
        pages = list(range(next_page, next_page + npg))
        next_page += npg
        pos = np.arange(ln)
        slots = jnp.asarray(
            np.asarray(pages, np.int64)[pos // ps] * ps + pos % ps
        )
        for layer in range(s.num_layers):
            k = jnp.asarray(
                rng.normal(size=(ln, s.num_kv_heads, s.head_dim)),
                jnp.float32,
            )
            v = jnp.asarray(
                rng.normal(size=(ln, s.num_kv_heads, s.head_dim)),
                jnp.float32,
            )
            pool = attn_ops.write_kv(pool, k, v, slots, layer)
    runner.kv_pool = pool


def test_window_superstep_matches_xla_store():
    rng = np.random.default_rng(0)
    params = init_random_params(SPEC, dtype=jnp.float32)
    lens = [20, 7, 33]

    r_ref = _make_runner("xla", params)
    r_win = _make_runner("pallas", params)
    assert r_win.attention_backend == "pallas"

    rng1 = np.random.default_rng(1)
    _materialize_prefix(r_ref, rng1, lens)
    rng1 = np.random.default_rng(1)
    _materialize_prefix(r_win, rng1, lens)

    batch_ref, _ = _decode_batch(r_ref, np.random.default_rng(2), lens)
    batch_win, _ = _decode_batch(r_win, np.random.default_rng(2), lens)

    out_ref = r_ref.execute_batch(batch_ref)
    out_win = r_win.execute_batch(batch_win)

    assert out_ref.keys() == out_win.keys()
    for k in out_ref:
        assert out_ref[k] == out_win[k], (k, out_ref[k], out_win[k])

    # pool contents written by the bulk store match the per-step store
    np.testing.assert_allclose(
        np.asarray(r_win.kv_pool, np.float32),
        np.asarray(r_ref.kv_pool, np.float32),
        rtol=2e-2, atol=2e-2,
    )
