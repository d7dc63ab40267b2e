"""Probe: time one decode superstep and one prefill step on the real chip."""
import argparse
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.sequence import (
    ForwardBatch, ForwardMode, ScheduledSeq, Sequence,
)
from nanovllmx_tpu.runner.model_runner import ModelRunner
from nanovllmx_tpu.sampling_params import SamplingParams
from nanovllmx_tpu.weights.loader import init_random_params
from bench import qwen3_06b_spec

ap = argparse.ArgumentParser()
ap.add_argument("--page-size", type=int, default=16)
ap.add_argument("--kv-cache-dtype", default="auto")
ap.add_argument("--quantization", default=None, choices=["int8", "int4"])
ap.add_argument("--batch", type=int, default=256)
ap.add_argument("--seq-len", type=int, default=800)
ap.add_argument("--prefill-chunk", type=int, default=1024)
args = ap.parse_args()

spec = qwen3_06b_spec()
cfg = EngineConfig(
    model="<probe>", max_bs=256, context_len=4096, page_size=args.page_size,
    prefill_chunk=args.prefill_chunk,
    max_num_batched_tokens=args.prefill_chunk,
    kv_cache_dtype=args.kv_cache_dtype, quantization=args.quantization,
)
params = init_random_params(
    spec, dtype=jnp.bfloat16, quantization=cfg.quantization,
    quant_group_size=cfg.quant_group_size,
)
runner = ModelRunner(cfg, params=params, spec=spec)
print("num_pages:", runner.num_pages, "backend:", runner.attention_backend,
      flush=True)

B = args.batch
SEQ_LEN = args.seq_len  # tokens already in KV per seq

# fabricate B sequences at len 800
ps = cfg.page_size
pages_per = -(-SEQ_LEN // ps) + 2
seqs = []
for i in range(B):
    s = Sequence(
        seq_id=f"s{i}", token_ids=list(np.random.randint(1, 1000, SEQ_LEN)),
        prompt_len=SEQ_LEN - 1, params=SamplingParams(ignore_eos=True),
    )
    s.page_ids = [
        p % runner.num_pages
        for p in range(i * pages_per, (i + 1) * pages_per)
    ]
    s.cached_len = SEQ_LEN - 1
    seqs.append(s)

K = cfg.decode_lookahead
batch = ForwardBatch(ForwardMode.DECODE, [
    ScheduledSeq(seq=s, start=SEQ_LEN - 1, end=SEQ_LEN - 1 + K) for s in seqs
])

t0 = time.perf_counter()
out = runner.execute_batch(batch)
t1 = time.perf_counter()
print(f"decode superstep #1 (compile+run): {t1-t0:.2f}s", flush=True)

for it in range(3):
    t0 = time.perf_counter()
    out = runner.execute_batch(batch)
    t1 = time.perf_counter()
    toks = B * K
    print(f"decode superstep: {t1-t0:.3f}s -> {toks/(t1-t0):.0f} tok/s "
          f"({(t1-t0)/K*1e3:.1f} ms/token-step)", flush=True)

# prefill probe: 2 seqs x 512-token chunks (flat-packed path)
pseqs = []
for i in range(2):
    s = Sequence(
        seq_id=f"p{i}", token_ids=list(np.random.randint(1, 1000, 512)),
        prompt_len=512, params=SamplingParams(ignore_eos=True),
    )
    s.page_ids = [
        p % runner.num_pages
        for p in range(B * pages_per + i * 32, B * pages_per + (i + 1) * 32)
    ]
    pseqs.append(s)
pbatch = ForwardBatch(ForwardMode.PREFILL, [
    ScheduledSeq(seq=s, start=0, end=512) for s in pseqs
])
t0 = time.perf_counter()
runner.execute_batch(pbatch)
t1 = time.perf_counter()
print(f"prefill step #1 (compile+run): {t1-t0:.2f}s", flush=True)
for it in range(3):
    t0 = time.perf_counter()
    runner.execute_batch(pbatch)
    t1 = time.perf_counter()
    print(f"prefill step (1024 tok): {t1-t0:.3f}s -> "
          f"{1024/(t1-t0):.0f} tok/s", flush=True)
