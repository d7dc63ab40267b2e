"""Offline streaming demo (counterpart of the reference
`offline_example.py`): build an LLM, stream two generations concurrently.

With no checkpoint available in this image, pass --model pointing at any HF
model directory (config.json + *.safetensors + tokenizer files); without
--model a tiny random-weight Qwen3 + char tokenizer is built on the fly.
"""

import argparse
import asyncio
import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def build_tiny():
    sys.path.insert(0, os.path.join(_ROOT, "tests"))
    from utils_tiny_model import add_tiny_tokenizer, make_tiny_qwen3

    d = make_tiny_qwen3(tempfile.mkdtemp())
    add_tiny_tokenizer(d)
    return d


async def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--tp-size", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (in-process jax config; the "
                    "JAX_PLATFORMS env var alone deadlocks in this image)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    model_dir = args.model or build_tiny()

    from nanovllmx_tpu import LLM, SamplingParams

    llm = LLM(
        model=model_dir, max_bs=8, context_len=1024, page_size=16,
        num_kv_pages=512, tp_size=args.tp_size,
    )
    await llm.ready()

    params = SamplingParams(
        temperature=0.7, top_p=0.95, max_new_tokens=args.max_new_tokens,
        ignore_eos=args.model is None,
    )

    async def stream(tag, prompt):
        print(f"[{tag}] prompt: {prompt!r}")
        async for out in llm.generate(prompt, params):
            print(f"[{tag}] {out.text}", end="", flush=True)
        print(f"\n[{tag}] done")

    await asyncio.gather(
        stream("A", "The quick brown fox"),
        stream("B", "Once upon a time"),
    )
    llm.shutdown()


if __name__ == "__main__":
    asyncio.run(main())
