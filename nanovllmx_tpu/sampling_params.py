"""Per-request sampling parameters.

Parity with the reference `SamplingParams` (`nanovllmx/core/common.py:5-18`):
n, temperature, top_p, top_k, min_p, max_tokens, max_new_tokens, stop,
ignore_eos, eos_token_id — with two conscious fixes over the reference:

* temperature == 0.0 is greedy decoding (the reference divides by zero,
  `layers/sampler.py:41`).
* `stop` strings are actually enforced by the detokenizer/engine (the reference
  accepts but ignores them, `core/common.py:14`).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SamplingParams:
    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1  # -1 = disabled
    min_p: float = 0.0
    max_tokens: int | None = None  # total length cap (prompt + generated)
    max_new_tokens: int | None = None  # generated-token cap
    stop: list[str] | str | None = None
    stop_token_ids: list[int] | None = None
    ignore_eos: bool = False
    eos_token_id: int | None = None  # filled from tokenizer if None

    def __post_init__(self):
        if self.temperature < 0.0:
            raise ValueError("temperature must be >= 0")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError("top_k must be -1 (off) or a positive int")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError("min_p must be in [0, 1]")
        if isinstance(self.stop, str):
            self.stop = [self.stop]

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0
