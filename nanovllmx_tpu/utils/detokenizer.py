"""Incremental detokenizer with stop-string enforcement.

The reference detokenizes statelessly per token (`nanovllmx/llm.py:57,80-81`),
which renders multi-token UTF-8 graphemes as replacement chars and never
enforces `SamplingParams.stop` (`core/common.py:14`) — both called out in
SURVEY.md §5 as gaps to fix. This detokenizer:

* decodes the full generated-token suffix each time and only emits text once
  it no longer ends in an incomplete UTF-8 sequence (U+FFFD);
* scans for stop strings across emission boundaries and truncates the output
  at the earliest match, signalling the caller to abort the sequence.
"""

from __future__ import annotations


class IncrementalDetokenizer:
    def __init__(self, tokenizer, stop: list[str] | None = None):
        self.tokenizer = tokenizer
        self.stop = [s for s in (stop or []) if s]
        # emitted text can never be retracted, so with stop strings active the
        # last (longest stop - 1) chars are always held back until the stream
        # either matches a stop or finishes
        self._holdback = max((len(s) for s in self.stop), default=0) - 1
        self.token_ids: list[int] = []
        self._emitted = 0  # chars of decoded text already emitted
        self.stopped = False

    def _decode(self) -> str:
        return self.tokenizer.decode(self.token_ids, skip_special_tokens=False)

    def add_tokens(self, token_ids: list[int]) -> tuple[str, bool]:
        """Feed newly generated tokens; returns (new_text, hit_stop).

        new_text is the safe-to-emit delta (possibly empty while a multi-token
        grapheme is incomplete or a potential stop-string prefix is pending).
        hit_stop=True means a stop string matched: new_text ends right before
        the match and the sequence should be aborted.
        """
        if self.stopped:
            return "", True
        self.token_ids.extend(token_ids)
        text = self._decode()
        # hold back while the tail is an incomplete UTF-8 sequence
        if text.endswith("�"):
            return "", False
        if self.stop:
            best = None
            for s in self.stop:
                i = text.find(s, max(0, self._emitted - len(s) + 1))
                if i >= 0 and (best is None or i < best):
                    best = i
            if best is not None:
                new = text[self._emitted : best] if best > self._emitted else ""
                self._emitted = max(self._emitted, best)
                self.stopped = True
                return new, True
            safe_end = max(self._emitted, len(text) - max(self._holdback, 0))
        else:
            safe_end = len(text)
        new = text[self._emitted : safe_end]
        self._emitted = safe_end
        return new, False

    def flush(self) -> str:
        """Emit any held-back tail (call when the stream finishes without a
        stop match)."""
        if self.stopped:
            return ""
        text = self._decode()
        new = text[self._emitted :]
        self._emitted = len(text)
        return new
