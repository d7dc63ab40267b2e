"""Sequence / batch dataclasses for the engine.

TPU-first counterpart of the reference's `core/common.py` dataclasses
(`Sequence`, `ForwardBatch`, `ForwardMode`, `EngineOutput`, `GenerateOutput`,
`FinishReason`, `SequenceStatus`). Key differences from the reference:

* KV bookkeeping is **page-granular** (`page_ids`) instead of per-token slot
  indices (`Sequence.kv_indices` in `common.py:31`): token-granularity gather
  is hostile to TPU vector memory, so the allocator, radix tree and attention
  kernels all work on pages of `page_size` tokens.
* `cached_len` tracks tokens whose KV is already materialised (prefix-cache
  hits at admission + chunk-prefilled tokens), always page-aligned for cache
  hits; equivalent to `cached_kv_len` (`common.py:33`).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from nanovllmx_tpu.sampling_params import SamplingParams


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    FINISHED = enum.auto()


class FinishReason(enum.Enum):
    STOP = "stop"       # eos token or stop string/token hit
    LENGTH = "length"   # max_tokens / max_new_tokens / context_len hit
    ABORT = "abort"


class ForwardMode(enum.Enum):
    PREFILL = enum.auto()
    DECODE = enum.auto()


@dataclass
class Sequence:
    seq_id: str
    token_ids: list[int]
    params: SamplingParams
    status: SequenceStatus = SequenceStatus.WAITING
    # scheduling boundary: tokens < prompt_len are prefilled, >= are decoded.
    # Grows on preemption-recompute (generated-so-far tokens get re-prefilled).
    prompt_len: int = 0
    # immutable true prompt length, for output accounting
    orig_prompt_len: int = 0

    # --- KV state (page granular) ---
    page_ids: list[int] = field(default_factory=list)  # pages backing [0, kv_len)
    cached_len: int = 0       # tokens with KV already materialised
    dispatched_len: int = 0   # tokens whose computation is dispatched (may
                              # exceed cached_len while batches are in flight)
    shared_len: int = 0       # prefix of cached_len owned by the radix tree
                              # (ref-counted; must not be freed by this seq)

    # --- output state ---
    finish_reason: FinishReason | None = None
    num_preemptions: int = 0

    # FCFS arrival order (set once by the scheduler; preserved across
    # preemption so a recomputed sequence keeps its priority)
    arrival: int = -1

    def __post_init__(self):
        if self.prompt_len == 0:
            self.prompt_len = len(self.token_ids)
        if self.orig_prompt_len == 0:
            self.orig_prompt_len = self.prompt_len

    @property
    def total_len(self) -> int:
        return len(self.token_ids)

    @property
    def num_generated(self) -> int:
        return len(self.token_ids) - self.orig_prompt_len

    @property
    def last_token(self) -> int:
        return self.token_ids[-1]

    def num_pages_needed(self, num_tokens: int, page_size: int) -> int:
        """Pages required to hold `num_tokens` total, given current pages."""
        need = -(-num_tokens // page_size)
        return max(0, need - len(self.page_ids))

    def projected_final_len(self, context_len: int, reserve: float) -> int:
        """Upper bound on the final total length, for admission booking.

        Exact when the generation length is deterministic (ignore_eos with a
        max_new_tokens/max_tokens cap and no stop tokens); otherwise the
        generation bound is scaled by `reserve` (EOS usually fires early)."""
        p = self.params
        bound = None
        if p.max_new_tokens is not None:
            bound = self.orig_prompt_len + p.max_new_tokens
        if p.max_tokens is not None:
            bound = p.max_tokens if bound is None else min(bound, p.max_tokens)
        if bound is None:
            bound = context_len
        deterministic = (
            p.ignore_eos and not p.stop and not p.stop_token_ids
            and (p.max_new_tokens is not None or p.max_tokens is not None)
        )
        if not deterministic and reserve < 1.0:
            gen = max(0, bound - self.orig_prompt_len)
            bound = self.orig_prompt_len + int(gen * reserve)
        # never below what already exists (+1 headroom to decode)
        return max(min(bound, context_len), min(self.total_len + 1, context_len))

    def reset_for_recompute(self) -> None:
        """Preemption (recompute-style, like the reference
        `scheduler.py:140-153`): drop all KV state; prompt now includes any
        generated tokens so far."""
        self.page_ids = []
        self.cached_len = 0
        self.dispatched_len = 0
        self.shared_len = 0
        self.status = SequenceStatus.WAITING
        self.num_preemptions += 1


@dataclass
class ScheduledSeq:
    """One sequence's slice of work inside a ForwardBatch."""
    seq: Sequence
    # tokens [start, end) of seq.token_ids are computed this step
    start: int
    end: int

    @property
    def num_tokens(self) -> int:
        return self.end - self.start


@dataclass
class ForwardBatch:
    forward_mode: ForwardMode
    seqs: list[ScheduledSeq]

    @property
    def num_seqs(self) -> int:
        return len(self.seqs)

    @property
    def num_tokens(self) -> int:
        return sum(s.num_tokens for s in self.seqs)


@dataclass
class EngineOutput:
    """Engine -> front-end, one per step per live sequence
    (ref `core/common.py:47-56`)."""
    seq_id: str
    new_token_ids: list[int]
    finished: bool
    finish_reason: FinishReason | None
    num_prompt_tokens: int
    num_generated_tokens: int


@dataclass
class GenerateOutput:
    """Front-end -> caller, one per yielded chunk (ref `core/common.py:59-65`)."""
    seq_id: str
    token_ids: list[int]
    text: str
    finished: bool
    finish_reason: str | None
    num_prompt_tokens: int
    num_generated_tokens: int
