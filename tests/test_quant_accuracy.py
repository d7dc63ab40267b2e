"""Quantization accuracy gates via the perplexity harness.

BASELINE.json requires INT8 within 0.1 and INT4 within 0.3 perplexity of the
bf16 reference on WikiText-2; with no datasets in this image the same gate
runs on a synthetic corpus through a tiny model — it exercises the full
harness + quantized forward path and bounds the quantization damage.
"""

import numpy as np
import pytest

from nanovllmx_tpu.eval.ppl import perplexity_of_corpus
from nanovllmx_tpu.models.registry import load_model_spec
from nanovllmx_tpu.weights.loader import load_params

from tests.utils_tiny_model import make_tiny_qwen3

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = make_tiny_qwen3(str(tmp_path_factory.mktemp("m")))
    spec = load_model_spec(d)
    rng = np.random.default_rng(0)
    corpus = [list(rng.integers(0, 128, 96)) for _ in range(3)]
    return d, spec, corpus


def _ppl(d, spec, corpus, quant):
    params = load_params(d, spec, dtype=jnp.float32, quantization=quant,
                         quant_group_size=32)
    return perplexity_of_corpus(params, spec, corpus, page_size=8, chunk=32,
                                kv_dtype=jnp.float32)


def test_int8_ppl_delta(setup):
    d, spec, corpus = setup
    base = _ppl(d, spec, corpus, None)
    q8 = _ppl(d, spec, corpus, "int8")
    assert abs(np.log(q8) - np.log(base)) < 0.02, (base, q8)


def test_int4_ppl_delta(setup):
    d, spec, corpus = setup
    base = _ppl(d, spec, corpus, None)
    q4 = _ppl(d, spec, corpus, "int4")
    assert abs(np.log(q4) - np.log(base)) < 0.15, (base, q4)


def test_fp8_kv_ppl_delta(setup):
    d, spec, corpus = setup
    params_dir, spec, corpus = setup
    params = load_params(params_dir, spec, dtype=jnp.float32)
    base = perplexity_of_corpus(params, spec, corpus, page_size=8, chunk=32,
                                kv_dtype=jnp.float32)
    f8 = perplexity_of_corpus(params, spec, corpus, page_size=8, chunk=32,
                              kv_dtype=jnp.float8_e4m3fn)
    assert abs(np.log(f8) - np.log(base)) < 0.05, (base, f8)


def test_int8_kv_ppl_delta(setup):
    """int8 KV cache (per-token scales) perplexity gate — the recommended
    compressed-KV mode on v5e (fp8 conversion is emulated and slow there)."""
    d, spec, corpus = setup
    params = load_params(d, spec, dtype=jnp.float32)
    base = perplexity_of_corpus(params, spec, corpus, page_size=8, chunk=32,
                                kv_dtype=jnp.float32)
    q8 = perplexity_of_corpus(params, spec, corpus, page_size=8, chunk=32,
                              kv_dtype=jnp.int8)
    assert abs(np.log(q8) - np.log(base)) < 0.05, (base, q8)


def test_int4_kv_ppl_delta(setup):
    """Head-pair-packed int4 KV cache (per-token amax/7 scales): halves
    attention HBM bytes and doubles pool capacity; the perplexity gate
    bounds the damage (BASELINE int4 budget: <= 0.3 log-ppl)."""
    d, spec, corpus = setup
    params = load_params(d, spec, dtype=jnp.float32)
    base = perplexity_of_corpus(params, spec, corpus, page_size=8, chunk=32,
                                kv_dtype=jnp.float32)
    q4 = perplexity_of_corpus(params, spec, corpus, page_size=8, chunk=32,
                              kv_dtype="int4")
    assert abs(np.log(q4) - np.log(base)) < 0.15, (base, q4)
