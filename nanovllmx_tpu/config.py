"""Engine configuration.

One frozen dataclass threaded through the whole stack, replacing the reference's
nine copies of the same parameter list (see /root/reference README and
`nanovllmx/llm.py:16` -> `core/engine_client.py` -> ... -> `core/model_runner.py`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """Static configuration for the whole engine.

    Mirrors the reference CLI surface (`api_server.py:103-134`):
    model / gpu_memory_utilization / max_bs / tp_size / pp_size / context_len /
    enforce_eager — plus TPU-native additions (page size, dtypes, quantization,
    shape buckets).
    """

    # Model
    model: str = ""  # path to a HF model directory (config.json + *.safetensors)

    # Batching / context
    max_bs: int = 256
    context_len: int = 4096
    prefill_chunk: int = 512  # chunked-prefill token budget per step
    max_num_batched_tokens: int = 2048  # cap on tokens per prefill batch
    max_prefill_seqs: int = 16  # cap on sequences per prefill batch (row bucket)

    # KV cache
    page_size: int = 16  # tokens per KV page (TPU-friendly tiling; ref uses 1)
    # Fraction of HBM (after weights + explicit reserves) given to the KV
    # pool. Decode throughput on the bench trace is occupancy-bound: every
    # extra page keeps more sequences unpaused, and the superstep's actual
    # XLA temps are small (~0.2 GB measured), so run close to full.
    hbm_utilization: float = 0.94
    num_kv_pages: int = 0  # 0 = auto-profile from HBM; >0 = explicit override
    # KV cache dtype. int8 = per-token symmetric quantization (the
    # recommended compressed-KV mode on v5e: doubles pool capacity and
    # halves attention DMA bytes with native int8 MXU compute). fp8_e4m3 is
    # supported but NOT recommended on v5e — fp8->bf16 conversion is
    # emulated and measured 4x slower than bf16 (benchmarks/probe_dma.py).
    # int4 = head-pair-packed 4-bit KV with the same per-token f32 scales
    # (amax/7): halves attention HBM bytes AND doubles pool capacity vs
    # int8. Accuracy is gated by the perplexity harness; single-mesh only.
    kv_cache_dtype: str = "auto"  # auto | bf16 | int8 | int4 | fp8_e4m3

    # Parallelism (mesh axes)
    dp_size: int = 1
    tp_size: int = 1
    pp_size: int = 1

    # Multi-host (jax.distributed): num_hosts processes, rendezvous at
    # coordinator_address (host0:port). host_id -1 = let jax infer from the
    # environment. The OpenAI server runs on host 0; followers mirror the
    # engine in lockstep (parallel/multihost.py).
    num_hosts: int = 1
    coordinator_address: str = ""
    host_id: int = -1

    # Numerics
    dtype: str = "auto"  # auto (from HF config) | bf16 | fp32
    quantization: str | None = None  # None | int8 | int4 (weight-only)
    quant_group_size: int = 128  # group size for int4 per-group scales

    # Execution
    enforce_eager: bool = False  # disable pallas kernels; pure-XLA fallback
    attention_backend: str = "auto"  # auto | pallas | xla
    # Shape bucketing: "single" compiles ONE variant per step kind (decode
    # padded to max_bs / full page width, prefill padded to its max) —
    # padding is nearly free when decode is HBM-bound and compiles through
    # the axon tunnel cost minutes each. "ladder" uses power-of-two ladders
    # (the reference CUDA-graph bs ladder, `core/model_runner.py:335`).
    shape_bucketing: str = "single"
    decode_bs_buckets: tuple[int, ...] = ()  # () = auto per shape_bucketing
    prefill_token_buckets: tuple[int, ...] = ()  # () = auto

    # Scheduler
    enable_prefix_caching: bool = True
    # Admission policy:
    #   "prompt" (default) — admit a sequence when its PROMPT KV fits the
    #     currently-available pool. Decode growth then allocates on demand;
    #     a sequence whose window cannot get pages simply SKIPS that
    #     super-step (pause — it keeps its pages, no recompute), resuming
    #     when finishing sequences free pages. Preemption-recompute is only
    #     a guaranteed-progress escape hatch when nothing at all can run.
    #     Maximizes occupancy: on the 256-request bench trace, final-footprint
    #     booking capped decode at ~210 live seqs with a 20 s drain tail.
    #   "final" — admit only when the pool can hold the PROJECTED FINAL
    #     footprint of everything running plus it (zero pauses/preemptions
    #     by construction, but admission-starved occupancy).
    admission_policy: str = "prompt"
    # Admission/prefill ORDER among already-waiting sequences:
    #   "fcfs" (default) — arrival order (the reference's only policy,
    #     `nanovllmx/core/scheduler.py:67-80`); protects TTFT fairness for
    #     online serving.
    #   "longest_gen" — longest EXPECTED REMAINING GENERATION first
    #     (known exactly under ignore_eos + max_new_tokens, estimated
    #     otherwise). For burst/offline traces where many requests arrive
    #     together this minimizes the low-occupancy drain tail: the
    #     longest jobs get the earliest decode start, so finish times
    #     bunch instead of trailing by generation length.
    prefill_priority: str = "fcfs"
    # ("final" policy) generation-length bound scaling when EOS can fire
    # early; exact bookings (ignore_eos + max_new_tokens) ignore it.
    admission_reserve: float = 0.5
    # Engine pipeline depth: number of dispatched-but-unretired batches the
    # engine keeps in flight. 2 overlaps host work (scheduling, detokenize,
    # output plumbing) AND the ~25 ms host<->device sync latency of the axon
    # tunnel with device compute: while batch N runs, batch N+1 is scheduled
    # and dispatched (decode windows chain their input token on device;
    # prefill chunks are result-independent). 1 = classic serial step loop.
    pipeline_depth: int = 2
    # Decode lookahead: tokens generated per device super-step (lax.scan of
    # K decode steps inside ONE jit call, token feedback staying on device).
    # Amortises the host<->device roundtrip (~30 ms through the axon tunnel)
    # over K tokens; finish detection lags by < K tokens (overshoot is
    # trimmed host-side). 1 = classic per-step loop.
    decode_lookahead: int = 16
    # Deferred-store decode (Pallas backend only): the superstep's K/V rows
    # live in bf16 side buffers the attention kernel reads directly and are
    # bulk-stored into the pool once per superstep. Measured END-TO-END
    # LOSS on v5e (r4 A/B, same trace): 3,534 tok/s windowed vs 4,908
    # per-step-store — the window mini-chunk (+1 padded CTW=128 chunk per
    # group per step), window DMA staging, and the superstep-end bulk
    # store cost far more than the ~1.6 ms/step row scatter they replace,
    # and the buffers eat ~0.5 GB of HBM the KV pool wants. Kept as an
    # option; default OFF.
    deferred_window: bool = False

    # Stall watchdog: if the engine is busy (or a warmup/compile is running)
    # and makes no observable progress for this many seconds, log a loud
    # diagnostic with a full-thread stack dump. Purely diagnostic — nothing
    # is killed. Motivated by an intermittent multi-minute device-sync stall
    # on the axon tunnel that was invisible until stack-dumped (r2 VERDICT
    # Weak #1). 0 disables.
    stall_watchdog_secs: float = 60.0

    # Server
    host: str = "0.0.0.0"
    port: int = 8000

    # Misc
    seed: int = 0

    def __post_init__(self):
        if self.context_len % self.page_size != 0:
            raise ValueError(
                f"context_len ({self.context_len}) must be a multiple of "
                f"page_size ({self.page_size})"
            )
        if self.prefill_chunk % self.page_size != 0:
            raise ValueError("prefill_chunk must be a multiple of page_size")
        if self.quantization not in (None, "int8", "int4"):
            raise ValueError(f"unknown quantization {self.quantization!r}")
        if self.dp_size > 1:
            # Silent weight/KV replication over an unused axis would waste
            # half the chips; reject until data-parallel decode (per-group
            # page pools + shard_mapped kernels) lands.
            raise ValueError(
                "dp_size > 1 is not implemented yet: the decode batch is "
                "not sharded over 'dp'. Use tp_size/pp_size."
            )
        if self.kv_cache_dtype not in (
            "auto", "bf16", "int8", "int4", "fp8_e4m3"
        ):
            raise ValueError(f"unknown kv_cache_dtype {self.kv_cache_dtype!r}")
        if self.admission_policy not in ("prompt", "final"):
            raise ValueError(
                f"unknown admission_policy {self.admission_policy!r}"
            )
        if self.prefill_priority not in ("fcfs", "longest_gen"):
            raise ValueError(
                f"unknown prefill_priority {self.prefill_priority!r}"
            )
        if self.num_hosts > 1 and not self.coordinator_address:
            raise ValueError(
                "num_hosts > 1 requires coordinator_address (host0:port)"
            )

    @property
    def pages_per_seq(self) -> int:
        return self.context_len // self.page_size

    @property
    def bs_buckets(self) -> tuple[int, ...]:
        """Decode batch-size buckets: smallest bucket >= actual bs."""
        if self.decode_bs_buckets:
            return self.decode_bs_buckets
        if self.shape_bucketing == "single":
            # eighth-step ladder: the non-attention work (projections,
            # logits, sampler) scales with the PADDED batch — on the bench
            # trace the mid-drain runs for seconds at B between buckets, and
            # eighth steps cut the padding waste ~0.8 s vs the old
            # quarter/half ladder (r3 step-log analysis).
            # ModelRunner.warmup() precompiles every bucket so none is hit
            # cold mid-trace; the persistent compile cache makes this a
            # one-time cost per machine.
            if self.max_bs >= 64:
                step = self.max_bs // 8
                return tuple(step * i for i in range(1, 9))
            if self.max_bs >= 32:
                return (self.max_bs // 4, self.max_bs // 2, self.max_bs)
            return (self.max_bs,)
        ladder = []
        b = 8
        while b < self.max_bs:
            ladder.append(b)
            b *= 2
        ladder.append(self.max_bs)
        return tuple(ladder)

    @property
    def token_buckets(self) -> tuple[int, ...]:
        """Prefill total-token ladder; the flat-packed prefill buffer is
        padded up to these. The cap is the BATCH total budget
        (max_num_batched_tokens) — prefill_chunk only bounds one sequence's
        chunk, and a batch may hold several chunks."""
        if self.prefill_token_buckets:
            return self.prefill_token_buckets
        cap = self.max_num_batched_tokens
        if self.shape_bucketing == "single":
            return (cap,)
        ladder = []
        t = 64
        while t < cap:
            ladder.append(t)
            t *= 2
        ladder.append(cap)
        return tuple(ladder)

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=2)

    @property
    def model_config_path(self) -> str:
        return os.path.join(self.model, "config.json")
