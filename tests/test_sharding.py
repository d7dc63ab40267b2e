"""Multi-chip sharding tests on the simulated 8-device CPU mesh.

SURVEY.md §4: multi-chip behavior is validated via
--xla_force_host_platform_device_count (tests/conftest.py) — TP and PP
shardings must compile, execute, and be numerically equivalent to
single-device execution.
"""

import numpy as np
import pytest

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.engine import Engine
from nanovllmx_tpu.runner.model_runner import ModelRunner
from nanovllmx_tpu.sampling_params import SamplingParams

from tests.utils_tiny_model import make_tiny_qwen3

PROMPT = [3, 14, 15, 92, 65, 35, 89, 79, 32, 38, 46, 26]


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    return make_tiny_qwen3(str(tmp_path_factory.mktemp("m")))


def greedy(model_dir, n=10, **cfg_kw):
    cfg = EngineConfig(
        model=model_dir, max_bs=4, context_len=128, page_size=8,
        prefill_chunk=64, max_num_batched_tokens=64, num_kv_pages=64,
        dtype="fp32", **cfg_kw,
    )
    runner = ModelRunner(cfg)
    eng = Engine(cfg, runner, num_pages=runner.num_pages)
    eng.add_sequence("a", PROMPT, SamplingParams(
        temperature=0.0, max_new_tokens=n, ignore_eos=True))
    toks = []
    steps = 0
    while eng.has_unfinished_sequences():
        for o in eng.step():
            toks.extend(o.new_token_ids)
        steps += 1
        assert steps < 100
    return toks


def test_tp2_matches_single_device(model_dir):
    base = greedy(model_dir)
    tp2 = greedy(model_dir, tp_size=2)
    assert tp2 == base


def test_tp2_quantized(model_dir):
    base = greedy(model_dir, quantization="int8")
    tp2 = greedy(model_dir, quantization="int8", tp_size=2)
    assert tp2 == base


def test_pp2_matches_single_device(model_dir):
    base = greedy(model_dir)
    pp2 = greedy(model_dir, pp_size=2)  # 2 layers -> 1 per stage
    assert pp2 == base


def test_tp2_pp2(model_dir):
    base = greedy(model_dir)
    both = greedy(model_dir, tp_size=2, pp_size=2)
    assert both == base


def test_dp_rejected_loudly(model_dir):
    # data-parallel decode is not implemented; silent replication would
    # waste chips (VERDICT r01 weak #5)
    with pytest.raises(ValueError, match="dp_size"):
        greedy(model_dir, tp_size=2, dp_size=2)


def test_tp4_kv_head_replication(model_dir):
    # tiny model has 2 kv heads; tp=4 exercises load-time KV-head
    # replication (ref `layers/linear.py:333-338`)
    base = greedy(model_dir)
    tp4 = greedy(model_dir, tp_size=4)
    assert tp4 == base


def test_tp4_kv_head_replication_quantized(model_dir):
    base = greedy(model_dir, quantization="int8")
    tp4 = greedy(model_dir, quantization="int8", tp_size=4)
    assert tp4 == base


def test_tp_indivisible_rejected(model_dir):
    with pytest.raises(ValueError, match="not divisible by tp_size"):
        greedy(model_dir, tp_size=3)  # nq=4 % 3 != 0


def test_pp_indivisible_rejected(model_dir):
    with pytest.raises(ValueError, match="not divisible by pp"):
        greedy(model_dir, pp_size=3)  # 2 layers


def test_tp_int4_matches_single_device(model_dir):
    """BASELINE config 4 (INT4 under TP) compile + execution proof on the
    virtual mesh: packed-int4 weights shard over 'tp' (the XLA grouped
    formulation — GSPMD cannot partition through a pallas_call) and greedy
    tokens must match the single-device int4 path exactly."""
    base = greedy(model_dir, quantization="int4")
    tp2 = greedy(model_dir, quantization="int4", tp_size=2)
    assert tp2 == base


def test_tp2_int4_longer_decode(model_dir):
    """int4 TP with enough decode steps to cross a page boundary (the
    tiny model's group count caps the testable tp degree at 2: ng=2
    per-group scale rows cannot shard 4 ways; production shapes have
    >= 32 groups per projection)."""
    base = greedy(model_dir, quantization="int4", n=20)
    tp2 = greedy(model_dir, quantization="int4", tp_size=2, n=20)
    assert tp2 == base
