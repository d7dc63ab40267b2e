"""Probe: time one decode superstep and one prefill step on the real chip."""
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

spec = qwen3_06b_spec()
cfg = EngineConfig(
    model="<probe>", max_bs=256, context_len=4096, page_size=16,
    prefill_chunk=1024, max_num_batched_tokens=1024,
)
params = init_random_params(spec, dtype=jnp.bfloat16)
runner = ModelRunner(cfg, params=params, spec=spec)
print("num_pages:", runner.num_pages, flush=True)

B = 256
SEQ_LEN = 800  # tokens already in KV per seq

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
out = runner._execute_decode(batch)
t1 = time.perf_counter()
print(f"decode superstep #1 (compile+run): {t1-t0:.2f}s", flush=True)

for it in range(3):
    t0 = time.perf_counter()
    out = runner._execute_decode(batch)
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
runner._execute_prefill(pbatch)
t1 = time.perf_counter()
print(f"prefill step #1 (compile+run): {t1-t0:.2f}s", flush=True)
for it in range(3):
    t0 = time.perf_counter()
    runner._execute_prefill(pbatch)
    t1 = time.perf_counter()
    print(f"prefill step (1024 tok): {t1-t0:.3f}s -> "
          f"{1024/(t1-t0):.0f} tok/s", flush=True)
