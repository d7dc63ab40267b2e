"""Dump the optimized HLO of the prefill step and locate scale-plane copies."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/nocache_hlo"

import numpy as np
import jax
import jax.numpy as jnp

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.sequence import ForwardMode
from nanovllmx_tpu.runner.model_runner import ModelRunner
from nanovllmx_tpu.weights.loader import init_random_params
from bench import qwen3_06b_spec

spec = qwen3_06b_spec()
cfg = EngineConfig(
    model="<probe>", max_bs=256, context_len=4096, page_size=128,
    prefill_chunk=2048, max_num_batched_tokens=2048,
    kv_cache_dtype="int8", quantization="int8",
)
params = init_random_params(spec, dtype=jnp.bfloat16, quantization="int8",
                            quant_group_size=128)
runner = ModelRunner(cfg, params=params, spec=spec)

from nanovllmx_tpu.ops.pallas.prefill_attention import BLOCK_Q
from nanovllmx_tpu.ops import attention as attn_ops

NT = cfg.token_buckets[0] + BLOCK_Q
S = cfg.max_prefill_seqs
W = cfg.pages_per_seq
F, G16, R, Sp = runner._plan_buckets()
fn = runner._get_step_fn(ForwardMode.PREFILL, NT, W)
args = (
    np.zeros(NT, np.int32), np.zeros(NT, np.int32),
    np.zeros((S, W), np.int32), np.zeros(S + 1, np.int32),
    np.zeros(S, np.int32), np.zeros(S, np.int32),
    np.zeros(NT, np.int32), np.full(NT, attn_ops.OOB_SLOT, np.int32),
    np.zeros(S, np.int32), np.zeros(S, np.float32),
    np.ones(S, np.float32), np.full(S, -1, np.int32),
    np.zeros(S, np.float32),
)
plan = (
    np.full(F, -1, np.int32), np.zeros(F, np.int32),
    np.full(G16, -1, np.int32), np.zeros(G16, np.int32),
    np.full(R, -1, np.int32), np.zeros(R, np.int32),
    np.full(Sp, -1, np.int32), np.zeros((Sp, 128), np.float32),
    np.zeros((Sp, 128), np.int32),
)
lowered = fn.lower(runner.params, runner.kv_pool, *args, plan,
                   jax.random.PRNGKey(0))
txt = lowered.compile().as_text()
print("HLO length:", len(txt), flush=True)
with open("/tmp/prefill_hlo.txt", "w") as f:
    f.write(txt)
# find slice ops touching [28,2,2048,128]
for i, line in enumerate(txt.splitlines()):
    if "2048,128]" in line and ("slice" in line or "copy" in line):
        print(line.strip()[:220])

# ---- decode superstep for comparison ----
B = 256
Wd = cfg.pages_per_seq
fn_d = runner._get_step_fn(ForwardMode.DECODE, B, Wd)
slots_arr = np.full(B, cfg.max_bs, np.int32)
ints = np.zeros((B, 4), np.int32)
floats = np.zeros((B, 3), np.float32)
low_d = fn_d.lower(
    runner.params, runner.kv_pool, runner.page_table_dev,
    runner.token_state, slots_arr, ints, floats, jax.random.PRNGKey(0)
)
txt_d = low_d.compile().as_text()
with open("/tmp/decode_hlo.txt", "w") as f:
    f.write(txt_d)
print("decode HLO length:", len(txt_d))
import re
n_slice = len(re.findall(r"slice-start", txt_d))
n_copy = len(re.findall(r"copy-start[^.]", txt_d))
print("decode slice-starts:", n_slice, "copy-starts:", n_copy)
for line in txt_d.splitlines():
    if "2048,128]" in line and ("slice-start" in line or "copy-start" in line):
        print(line.strip()[:200])
