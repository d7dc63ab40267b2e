"""Golden-token tests: engine + JAX model vs HF transformers (torch CPU).

The correctness gate from SURVEY.md §7.2 step 1: greedy continuations must be
token-exact against the HF implementation of the same architecture, in fp32,
on tiny random-weight checkpoints (no network egress, so real checkpoints are
unavailable — architecture equivalence is what's being proven).
"""

import numpy as np
import pytest

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.engine import Engine
from nanovllmx_tpu.runner.model_runner import ModelRunner
from nanovllmx_tpu.sampling_params import SamplingParams

from tests.utils_tiny_model import (
    assert_greedy_close,
    hf_greedy_tokens,
    hf_logits,
    make_tiny_llama,
    make_tiny_qwen2,
    make_tiny_qwen3,
    make_tiny_qwen3_tied,
)


def make_engine(model_dir, **cfg_kw):
    defaults = dict(
        model=model_dir,
        max_bs=8,
        context_len=256,
        page_size=8,
        prefill_chunk=64,
        max_num_batched_tokens=128,
        num_kv_pages=128,
        dtype="fp32",
    )
    defaults.update(cfg_kw)
    config = EngineConfig(**defaults)
    runner = ModelRunner(config)
    return Engine(config, runner, num_pages=runner.num_pages, eos_token_id=None)


def greedy(engine, seq_id, prompt, n):
    engine.add_sequence(
        seq_id, prompt, SamplingParams(temperature=0.0, max_new_tokens=n, ignore_eos=True)
    )
    toks = {}
    steps = 0
    while engine.has_unfinished_sequences():
        for o in engine.step():
            toks.setdefault(o.seq_id, []).extend(o.new_token_ids)
        steps += 1
        assert steps < 500
    return toks[seq_id]


PROMPT = [3, 14, 15, 92, 65, 35, 89, 79, 32, 38, 46, 26]


@pytest.fixture(scope="module")
def qwen3_dir(tmp_path_factory):
    return make_tiny_qwen3(str(tmp_path_factory.mktemp("m")))


def test_logits_match_hf(qwen3_dir):
    """Single prefill pass: last-token logits match HF within fp32 tolerance."""
    cfg = EngineConfig(model=qwen3_dir, max_bs=4, context_len=128, page_size=8,
                      num_kv_pages=64, dtype="fp32")
    runner = ModelRunner(cfg)
    from nanovllmx_tpu.engine.sequence import (
        ForwardBatch, ForwardMode, ScheduledSeq, Sequence,
    )
    seq = Sequence("s", list(PROMPT), SamplingParams(temperature=0.0))
    seq.page_ids = list(range(2))  # 12 tokens -> 2 pages of 8
    batch = ForwardBatch(ForwardMode.PREFILL, [ScheduledSeq(seq, 0, len(PROMPT))])

    # run the jitted prefill and grab the logits via the sampled greedy token
    out = runner.execute_batch(batch)
    ref = hf_logits(qwen3_dir, PROMPT)[-1]
    assert out["s"] == int(np.argmax(ref)), (
        f"greedy token {out['s']} != HF argmax {int(np.argmax(ref))}"
    )


def test_greedy_matches_hf_qwen3(qwen3_dir):
    want = hf_greedy_tokens(qwen3_dir, PROMPT, 16)
    eng = make_engine(qwen3_dir)
    got = greedy(eng, "a", PROMPT, 16)
    assert got == want


def test_greedy_matches_hf_qwen3_chunked_prefill(qwen3_dir):
    """Chunked prefill (chunk smaller than the prompt) is numerically
    identical to whole-prompt prefill."""
    prompt = (PROMPT * 6)[:60]
    want = hf_greedy_tokens(qwen3_dir, prompt, 8)
    eng = make_engine(qwen3_dir, prefill_chunk=16, max_num_batched_tokens=16)
    got = greedy(eng, "a", prompt, 8)
    assert got == want


def test_greedy_matches_hf_tied_embeddings(tmp_path):
    d = make_tiny_qwen3_tied(str(tmp_path))
    want = hf_greedy_tokens(d, PROMPT, 12)
    eng = make_engine(d)
    got = greedy(eng, "a", PROMPT, 12)
    assert got == want


def test_greedy_matches_hf_llama(tmp_path):
    d = make_tiny_llama(str(tmp_path))
    got = greedy(make_engine(d), "a", PROMPT, 12)
    # near-tie tolerant: fp32 backend noise can flip tied argmaxes on
    # random-init models; real architecture bugs produce O(1) logit gaps
    assert_greedy_close(d, PROMPT, got)


def test_greedy_matches_hf_qwen2_bias(tmp_path):
    d = make_tiny_qwen2(str(tmp_path))
    got = greedy(make_engine(d), "a", PROMPT, 12)
    assert_greedy_close(d, PROMPT, got)


def test_greedy_matches_hf_llama31_rope_scaling(tmp_path):
    """Llama-3.1-style llama3 rope scaling (VERDICT r4 item 5): the tiny
    config sets original_max_position_embeddings=64 and the prompt runs
    past it, so the scaled low/interpolated frequency bands are exercised;
    an unscaled rope here produces O(1) logit errors."""
    from tests.utils_tiny_model import make_tiny_llama31

    d = make_tiny_llama31(str(tmp_path))
    prompt = (PROMPT * 8)[:80]
    got = greedy(make_engine(d), "a", prompt, 12)
    assert_greedy_close(d, prompt, got)


def test_registry_rejects_sliding_window(tmp_path):
    """Mistral-v0.1-style configs (sliding_window set) must be rejected
    loudly: neither attention path masks a window (VERDICT r4 item 5)."""
    import json

    import pytest as _pytest

    from nanovllmx_tpu.models.registry import load_model_spec

    base = {
        "architectures": ["MistralForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2,
    }
    d = tmp_path / "m1"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        **base, "sliding_window": 4096,
    }))
    with _pytest.raises(NotImplementedError, match="sliding-window"):
        load_model_spec(str(d))

    # null window (Mistral v0.2+ style) loads fine
    d2 = tmp_path / "m2"
    d2.mkdir()
    (d2 / "config.json").write_text(json.dumps({
        **base, "sliding_window": None,
    }))
    assert load_model_spec(str(d2)).num_layers == 2

    # Qwen2 style: sliding_window set but gated off by use_sliding_window
    d3 = tmp_path / "m3"
    d3.mkdir()
    (d3 / "config.json").write_text(json.dumps({
        **base, "architectures": ["Qwen2ForCausalLM"],
        "sliding_window": 131072, "use_sliding_window": False,
    }))
    assert load_model_spec(str(d3)).num_layers == 2


def test_registry_rope_scaling_parsing(tmp_path):
    import json

    import pytest as _pytest

    from nanovllmx_tpu.models.registry import load_model_spec

    base = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2,
    }
    d = tmp_path / "r1"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        **base,
        "rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                         "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                         "original_max_position_embeddings": 8192},
    }))
    spec = load_model_spec(str(d))
    assert spec.rope_scaling_type == "llama3"
    assert spec.rope_scaling_factor == 8.0
    assert spec.rope_orig_max_pos == 8192

    # old-style linear
    d2 = tmp_path / "r2"
    d2.mkdir()
    (d2 / "config.json").write_text(json.dumps({
        **base, "rope_scaling": {"type": "linear", "factor": 2.0},
    }))
    spec2 = load_model_spec(str(d2))
    assert spec2.rope_scaling_type == "linear"
    assert spec2.rope_scaling_factor == 2.0

    # unsupported type rejected loudly (e.g. yarn)
    d3 = tmp_path / "r3"
    d3.mkdir()
    (d3 / "config.json").write_text(json.dumps({
        **base, "rope_scaling": {"rope_type": "yarn", "factor": 4.0},
    }))
    with _pytest.raises(NotImplementedError, match="yarn"):
        load_model_spec(str(d3))


def test_batched_greedy_matches_sequential(qwen3_dir):
    """Several concurrent sequences produce the same tokens as running each
    alone (continuous batching does not perturb results)."""
    prompts = {
        "a": PROMPT,
        "b": list(reversed(PROMPT)),
        "c": [7, 8, 9, 10, 11, 12, 13, 14],
    }
    solo = {}
    for k, p in prompts.items():
        solo[k] = greedy(make_engine(qwen3_dir), k, p, 8)

    eng = make_engine(qwen3_dir)
    for k, p in prompts.items():
        eng.add_sequence(k, p, SamplingParams(temperature=0.0, max_new_tokens=8,
                                              ignore_eos=True))
    toks = {}
    steps = 0
    while eng.has_unfinished_sequences():
        for o in eng.step():
            toks.setdefault(o.seq_id, []).extend(o.new_token_ids)
        steps += 1
        assert steps < 300
    assert toks == solo


def test_prefix_cache_reuse_is_exact(qwen3_dir):
    """A second request sharing a long prefix must produce identical tokens
    while actually reusing cached pages (admission-time radix hit)."""
    base = (PROMPT * 4)[:40]
    eng = make_engine(qwen3_dir, prefill_chunk=64)
    first = greedy(eng, "a", base + [5, 6], 6)
    hits_before = eng.scheduler.kv.num_cached_pages
    assert hits_before > 0
    second = greedy(eng, "b", base + [5, 6], 6)
    assert second == first
    # fresh engine, no cache: same result
    clean = greedy(make_engine(qwen3_dir, prefill_chunk=64), "c", base + [5, 6], 6)
    assert first == clean
