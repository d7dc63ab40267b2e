"""Async LLM front-end tests with the real tiny model + char tokenizer."""

import asyncio

import pytest

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.engine import Engine
from nanovllmx_tpu.llm import LLM
from nanovllmx_tpu.runner.model_runner import ModelRunner
from nanovllmx_tpu.sampling_params import SamplingParams

from tests.utils_tiny_model import add_tiny_tokenizer, make_tiny_qwen3


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = make_tiny_qwen3(str(tmp_path_factory.mktemp("m")))
    add_tiny_tokenizer(d)
    cfg = EngineConfig(
        model=d, max_bs=8, context_len=256, page_size=8, prefill_chunk=64,
        max_num_batched_tokens=128, num_kv_pages=128, dtype="fp32",
    )
    runner = ModelRunner(cfg)
    tokenizer = __import__("transformers").AutoTokenizer.from_pretrained(d)
    engine = Engine(cfg, runner, num_pages=runner.num_pages,
                    eos_token_id=tokenizer.eos_token_id)
    llm = LLM(config=cfg, engine=engine, tokenizer=tokenizer)
    yield llm
    llm.shutdown()


def test_generate_stream(llm):
    async def go():
        outs = []
        async for o in llm.generate(
            "hello world", SamplingParams(temperature=0.0, max_new_tokens=8,
                                          ignore_eos=True)
        ):
            outs.append(o)
        return outs

    outs = asyncio.run(go())
    assert outs[-1].finished
    assert sum(len(o.token_ids) for o in outs) == 8
    text = "".join(o.text for o in outs)
    assert isinstance(text, str) and len(text) > 0


def test_generate_full_and_token_prompt(llm):
    async def go():
        return await llm.generate_full(
            [40, 41, 42, 43], SamplingParams(temperature=0.0, max_new_tokens=5,
                                             ignore_eos=True)
        )

    out = asyncio.run(go())
    assert out.finished and out.num_generated_tokens == 5
    assert out.num_prompt_tokens == 4


def test_concurrent_generations(llm):
    async def go():
        params = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
        results = await asyncio.gather(
            llm.generate_full("abcd", params),
            llm.generate_full("wxyz", params),
            llm.generate_full("m", params),
        )
        return results

    results = asyncio.run(go())
    assert all(r.finished and r.num_generated_tokens == 6 for r in results)


def test_cancellation_aborts_engine(llm):
    async def go():
        agen = llm.generate(
            "abcdefgh", SamplingParams(temperature=0.0, max_new_tokens=200,
                                       ignore_eos=True)
        )
        got = 0
        async for _ in agen:
            got += 1
            if got >= 2:
                await agen.aclose()  # client disconnect
                break
        return got

    got = asyncio.run(go())
    assert got == 2
    # engine must drain to idle shortly after the abort
    for _ in range(100):
        if not llm.engine.has_unfinished_sequences():
            break
        import time
        time.sleep(0.05)
    assert not llm.engine.has_unfinished_sequences()


def test_stop_string(llm):
    # find what greedy produces, then stop on a substring of it
    async def first():
        out = await llm.generate_full(
            "hello", SamplingParams(temperature=0.0, max_new_tokens=10,
                                    ignore_eos=True)
        )
        return out.text

    text = asyncio.run(first())
    assert len(text) >= 3
    stop_s = text[2]

    async def stopped():
        return await llm.generate_full(
            "hello", SamplingParams(temperature=0.0, max_new_tokens=10,
                                    ignore_eos=True, stop=[stop_s])
        )

    out = asyncio.run(stopped())
    assert out.finish_reason == "stop"
    assert stop_s not in out.text
    assert out.text == text[:2]
