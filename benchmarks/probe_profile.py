"""Capture a jax.profiler device trace of decode supersteps / prefill steps.

Reuses the engine-path ModelRunner (cache-hit compiles) and wraps a few
steps in jax.profiler.trace; the xplane output can be parsed with
benchmarks/parse_xplane.py for a per-op device-time breakdown.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.sequence import (
    ForwardBatch, ForwardMode, ScheduledSeq, Sequence,
)
from nanovllmx_tpu.runner.model_runner import ModelRunner
from nanovllmx_tpu.sampling_params import SamplingParams
from nanovllmx_tpu.weights.loader import init_random_params
from bench import qwen3_06b_spec

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=256)
ap.add_argument("--seq-len", type=int, default=800)
ap.add_argument("--out", default="/tmp/jaxtrace")
ap.add_argument("--mode", default="decode", choices=["decode", "prefill"])
ap.add_argument("--kv", default="int8", choices=["int8", "int4"])
args = ap.parse_args()

spec = qwen3_06b_spec()
cfg = EngineConfig(
    model="<probe>", max_bs=256, context_len=4096, page_size=128,
    prefill_chunk=2048, max_num_batched_tokens=2048,
    kv_cache_dtype=args.kv, quantization="int8",
)
params = init_random_params(
    spec, dtype=jnp.bfloat16, quantization="int8", quant_group_size=128
)
runner = ModelRunner(cfg, params=params, spec=spec)
print("num_pages:", runner.num_pages, flush=True)

B = args.batch
SEQ_LEN = args.seq_len
ps = cfg.page_size
pages_per = -(-SEQ_LEN // ps) + 2
seqs = []
for i in range(B):
    s = Sequence(
        seq_id=f"s{i}", token_ids=list(np.random.randint(1, 1000, SEQ_LEN)),
        prompt_len=SEQ_LEN - 1, params=SamplingParams(ignore_eos=True),
    )
    s.page_ids = [
        p % runner.num_pages for p in range(i * pages_per, (i + 1) * pages_per)
    ]
    s.cached_len = SEQ_LEN - 1
    seqs.append(s)

K = cfg.decode_lookahead
if args.mode == "decode":
    batch = ForwardBatch(ForwardMode.DECODE, [
        ScheduledSeq(seq=s, start=SEQ_LEN - 1, end=SEQ_LEN - 1 + K)
        for s in seqs
    ])
else:
    pseqs = []
    for i in range(4):
        s = Sequence(
            seq_id=f"p{i}", token_ids=list(np.random.randint(1, 1000, 512)),
            prompt_len=512, params=SamplingParams(ignore_eos=True),
        )
        s.page_ids = [
            p % runner.num_pages
            for p in range(B * pages_per + i * 32, B * pages_per + (i + 1) * 32)
        ]
        pseqs.append(s)
    batch = ForwardBatch(ForwardMode.PREFILL, [
        ScheduledSeq(seq=s, start=0, end=512) for s in pseqs
    ])

runner.execute_batch(batch)  # compile/warm
runner.execute_batch(batch)

with jax.profiler.trace(args.out):
    for _ in range(2):
        runner.execute_batch(batch)
print("trace written to", args.out, flush=True)
