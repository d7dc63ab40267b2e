"""Pipeline parallelism: token identity vs pp=1 and schedule structure.

The reference overlaps micro-batches across stages via its engine pp_queue +
NCCL send/recv (`core/engine.py:102-117`, `communication_op.py:253-346`);
here the schedule lives inside the jitted step (parallel/pipeline.py) and
these tests prove (a) stage concurrency and bubble-freeness of the schedule,
(b) bit-identical greedy tokens against the single-device path through the
FULL engine (chunked prefill + decode supersteps + finish logic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.engine import Engine
from nanovllmx_tpu.models.decoder import ModelSpec
from nanovllmx_tpu.parallel.pipeline import decode_schedule
from nanovllmx_tpu.runner.model_runner import ModelRunner
from nanovllmx_tpu.sampling_params import SamplingParams
from nanovllmx_tpu.weights.loader import init_random_params


# --------------------------------------------------------------- schedule

@pytest.mark.parametrize("pp,K", [(2, 4), (4, 4), (2, 16), (8, 2)])
def test_schedule_concurrency_and_feedback(pp, K):
    """Structural proof of the rotation schedule: in steady state EVERY
    stage is busy EVERY round on a DIFFERENT flight (stage 0 runs flight
    t while stage 1 runs t-1, ...), and a flight's sampled token (produced
    when it leaves the last stage) is always available one round before the
    same microbatch's next step needs it at stage 0 — i.e. the decode
    feedback chain adds no bubble."""
    nmb = pp
    table = decode_schedule(pp, K)
    R = len(table)
    assert R == K * nmb + pp - 1
    for t, row in enumerate(table):
        busy = [e for e in row if e is not None]
        # fill/drain rounds are the only non-full rounds
        if pp - 1 <= t < K * nmb:
            assert len(busy) == pp, (t, row)
        # concurrency: all busy stages work on DISTINCT flights
        assert len({e[0] for e in busy}) == len(busy)
    # bubble accounting: idle slots == fill + drain triangles only
    idle = sum(1 for row in table for e in row if e is None)
    assert idle == pp * (pp - 1)
    # feedback invariant: flight f finishes the last stage at round
    # f + pp - 1; microbatch m's next step is flight f + nmb, which enters
    # stage 0 at round f + nmb — strictly later
    for f in range(K * nmb - nmb):
        produced = f + pp - 1
        needed = f + nmb
        assert produced < needed


# ---------------------------------------------------------- token identity

def _tiny_spec(tp: int) -> ModelSpec:
    return ModelSpec(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=4, num_heads=2 * max(tp, 1), num_kv_heads=max(tp, 1),
        head_dim=64, use_qk_norm=True, tie_embeddings=False, dtype="float32",
    )


def _run_engine(tp: int, pp: int, prompts, max_new=6) -> dict[str, list[int]]:
    spec = _tiny_spec(tp)
    cfg = EngineConfig(
        model="<pp-test>", max_bs=4, context_len=128, page_size=8,
        prefill_chunk=32, max_num_batched_tokens=32, num_kv_pages=48,
        dtype="fp32", tp_size=tp, pp_size=pp, decode_lookahead=4,
    )
    params = init_random_params(spec, dtype=jnp.float32, seed=7)
    runner = ModelRunner(cfg, params=params, spec=spec)
    engine = Engine(cfg, runner, num_pages=runner.num_pages)
    for i, prompt in enumerate(prompts):
        engine.add_sequence(
            f"s{i}", prompt,
            SamplingParams(temperature=0.0, max_new_tokens=max_new,
                           ignore_eos=True),
        )
    got: dict[str, list[int]] = {}
    steps = 0
    while engine.has_unfinished_sequences():
        for out in engine.step():
            got.setdefault(out.seq_id, []).extend(out.new_token_ids)
        steps += 1
        assert steps < 100
    return got


PROMPTS = [list(range(1, 13)), list(range(40, 75)), [7, 8, 9]]


@pytest.mark.parametrize("tp,pp", [(1, 2), (2, 2), (1, 4)])
def test_pp_tokens_identical_to_single_device(tp, pp):
    """Greedy tokens through the FULL engine must be identical between the
    pipelined pp path and the single-device path (same weights, same
    chunked-prefill schedule)."""
    if tp * pp > len(jax.devices()):
        pytest.skip("needs more virtual devices")
    base = _run_engine(tp=tp, pp=1, prompts=PROMPTS)
    pped = _run_engine(tp=tp, pp=pp, prompts=PROMPTS)
    assert base == pped


def test_pp_prefill_span_split_mid_sequence():
    """A prompt long enough that the flat prefill buffer splits it across
    microbatch spans: causal correctness must hold (span m's KV is written
    before span m+1 reaches any stage)."""
    long_prompt = [p % 500 for p in range(3, 60)]  # spans several chunks
    base = _run_engine(tp=1, pp=1, prompts=[long_prompt], max_new=4)
    pped = _run_engine(tp=1, pp=2, prompts=[long_prompt], max_new=4)
    assert base == pped


@pytest.fixture
def _interpret_pallas(monkeypatch):
    """Force every Pallas kernel into interpret mode so the pallas-backend
    engine paths (deferred-window decode, plan stores) run on CPU."""
    import functools

    import nanovllmx_tpu.ops.pallas.decode_attention as da
    import nanovllmx_tpu.ops.pallas.kv_write as kw
    import nanovllmx_tpu.ops.pallas.prefill_attention as pa

    monkeypatch.setattr(
        da, "paged_decode_attention_pallas",
        functools.partial(da.paged_decode_attention_pallas, interpret=True),
    )
    monkeypatch.setattr(
        pa, "ragged_prefill_attention_pallas",
        functools.partial(pa.ragged_prefill_attention_pallas, interpret=True),
    )
    monkeypatch.setattr(
        kw, "store_kv_prefill",
        functools.partial(kw.store_kv_prefill, interpret=True),
    )
    monkeypatch.setattr(
        kw, "scatter_kv_rows",
        functools.partial(kw.scatter_kv_rows, interpret=True),
    )


def _run_engine_pallas(pp: int, prompts, max_new=5) -> dict[str, list[int]]:
    spec = _tiny_spec(1)
    cfg = EngineConfig(
        model="<pp-window-test>", max_bs=4, context_len=128, page_size=8,
        prefill_chunk=32, max_num_batched_tokens=32, num_kv_pages=48,
        dtype="fp32", pp_size=pp, decode_lookahead=4,
        attention_backend="pallas", deferred_window=True,
    )
    params = init_random_params(spec, dtype=jnp.float32, seed=7)
    runner = ModelRunner(cfg, params=params, spec=spec)
    assert runner._use_window
    engine = Engine(cfg, runner, num_pages=runner.num_pages)
    for i, prompt in enumerate(prompts):
        engine.add_sequence(
            f"s{i}", prompt,
            SamplingParams(temperature=0.0, max_new_tokens=max_new,
                           ignore_eos=True),
        )
    got: dict[str, list[int]] = {}
    steps = 0
    while engine.has_unfinished_sequences():
        for out in engine.step():
            got.setdefault(out.seq_id, []).extend(out.new_token_ids)
        steps += 1
        assert steps < 100
    return got


def test_pp_window_tokens_identical(_interpret_pallas):
    """Deferred-window decode under PP (bulk store per stage, window rows
    read via window_row0, invalid rounds parked past max_bs) must produce
    the same greedy tokens as the single-chip window path (r3 VERDICT #6)."""
    if 2 > len(jax.devices()):
        pytest.skip("needs >= 2 virtual devices")
    base = _run_engine_pallas(pp=1, prompts=PROMPTS)
    pped = _run_engine_pallas(pp=2, prompts=PROMPTS)
    assert base == pped
