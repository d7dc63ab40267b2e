"""Engine: the schedule -> execute -> update step loop.

Counterpart of the reference `Engine` (`nanovllmx/core/engine.py`), minus the
process boundaries: the reference pickles a `ForwardBatch` of Sequence objects
across two process hops per step (SURVEY.md §2.3); here the scheduler and the
device runner live in one process and the runner receives flat arrays.

Finish detection mirrors `engine.py:143-154` — eos (unless ignore_eos),
`max_tokens` counted against prompt+generated, `max_new_tokens` against
generated only — plus fixes the reference consciously skipped: stop_token_ids
are honoured and the context-length cap produces a LENGTH finish instead of
overrunning the KV allocation.
"""

from __future__ import annotations

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.scheduler import Scheduler
from nanovllmx_tpu.engine.sequence import (
    EngineOutput,
    FinishReason,
    ForwardBatch,
    ForwardMode,
    Sequence,
    SequenceStatus,
)
from nanovllmx_tpu.sampling_params import SamplingParams
from nanovllmx_tpu.utils.metrics import Metrics


class Engine:
    """Single-controller engine. `runner` is anything exposing
    `execute_batch(batch) -> dict[seq_id, next_token_id]` (ModelRunner on
    TPU; tests may pass a fake)."""

    def __init__(self, config: EngineConfig, runner, num_pages: int,
                 eos_token_id: int | None = None):
        from collections import deque

        self.config = config
        self.runner = runner
        self.scheduler = Scheduler(config, num_pages)
        # dispatched-but-unretired batches (engine pipelining): while batch N
        # executes on device, batch N+1 is scheduled and dispatched, hiding
        # host work and the host<->device sync latency. Decode windows chain
        # their input token on device; prefill chunks are result-independent.
        self._inflight: deque = deque()
        self._depth = max(1, config.pipeline_depth)
        # outputs produced outside step() (e.g. drained during an abort)
        self._pending_outputs: list[EngineOutput] = []
        # let the runner free device row slots when sequences retire
        release = getattr(runner, "release_seq", None)
        if release is not None:
            self.scheduler.on_release = release
        self.eos_token_id = eos_token_id
        self.num_steps = 0
        self.metrics = Metrics()
        self.scheduler.metrics = self.metrics
        # let the runner report warmup/compile progress to the watchdog
        if getattr(runner, "metrics", None) is None:
            try:
                runner.metrics = self.metrics
            except AttributeError:
                pass

    # ------------------------------------------------------------------ admin

    def add_sequence(self, seq_id: str, token_ids: list[int],
                     params: SamplingParams) -> None:
        # keep the LAST context_len-1 tokens (ref truncates to context_len,
        # `engine.py:59-60`; -1 leaves room to generate at least one token)
        limit = self.config.context_len - 1
        if len(token_ids) > limit:
            token_ids = token_ids[-limit:]
        if params.eos_token_id is None:
            params.eos_token_id = self.eos_token_id
        seq = Sequence(seq_id=seq_id, token_ids=list(token_ids), params=params)
        self.metrics.inc("requests_started")
        self.metrics.inc("prompt_tokens", len(seq.token_ids))
        self.scheduler.add_sequence(seq)

    def abort_sequence(self, seq_id: str) -> EngineOutput | None:
        # Non-draining abort: mark the sequence finished and let in-flight
        # windows retire naturally — the scheduler's _pending_finish ledger
        # keeps its KV pages alive until the last dispatched window lands,
        # and update_from_output drops tokens of FINISHED sequences. A
        # disconnect storm therefore never serializes the pipeline (the
        # earlier design drained the whole in-flight queue per abort).
        seq = self.scheduler.abort_sequence(seq_id)
        if seq is None:
            return None
        seq.finish_reason = FinishReason.ABORT
        self.metrics.inc("requests_aborted")
        return EngineOutput(
            seq_id=seq.seq_id, new_token_ids=[], finished=True,
            finish_reason=FinishReason.ABORT,
            num_prompt_tokens=seq.orig_prompt_len,
            num_generated_tokens=seq.num_generated,
        )

    def has_unfinished_sequences(self) -> bool:
        # _pending_outputs counts as unfinished work: outputs produced during
        # an abort must still be posted by the next step() even when the
        # scheduler itself went idle (otherwise their clients wait forever)
        return (self.scheduler.has_unfinished() or bool(self._inflight)
                or bool(self._pending_outputs))

    # ------------------------------------------------------------------- step

    def step(self) -> list[EngineOutput]:
        """One engine iteration: dispatch at most one new batch, retire the
        oldest in-flight batch when the pipeline is full (or nothing new can
        be scheduled). With pipeline_depth=1 this degenerates to the classic
        schedule -> execute -> update loop (ref `engine.py:81-100`; the
        in-flight queue mirrors the reference's PP queue,
        `engine.py:102-117`)."""
        import time as _time

        outputs: list[EngineOutput] = []
        if self._pending_outputs:
            outputs.extend(self._pending_outputs)
            self._pending_outputs.clear()
        t_s = _time.perf_counter()
        batch = self.scheduler.schedule()
        self.metrics.add_time("schedule", _time.perf_counter() - t_s)
        if batch is not None:
            t0 = _time.perf_counter()
            handle = self._dispatch(batch)
            t1 = _time.perf_counter()
            self.metrics.observe_step(t1 - t0)
            self.metrics.step_log.append((
                "dispatch", t0, t1, batch.forward_mode.name,
                batch.num_seqs, sum(i.num_tokens for i in batch.seqs),
            ))
            self.metrics.inc("engine_steps")
            if batch.forward_mode == ForwardMode.PREFILL:
                self.metrics.inc("prefill_steps")
                self.metrics.inc(
                    "prefill_sched_tokens",
                    sum(i.num_tokens for i in batch.seqs),
                )
            else:
                self.metrics.inc("decode_steps")
                self.metrics.inc("decode_sched_seqs", batch.num_seqs)
            self.num_steps += 1
            self._inflight.append((batch, handle))
        while self._inflight and (
            len(self._inflight) >= self._depth
            or (batch is None and self._inflight)
        ):
            b, h = self._inflight.popleft()
            t_c = _time.perf_counter()
            sampled = self._collect(h)
            t_e = _time.perf_counter()
            self.metrics.add_time(
                "retire_decode" if b.forward_mode == ForwardMode.DECODE
                else "retire_prefill",
                t_e - t_c,
            )
            self.metrics.step_log.append((
                "retire", t_c, t_e, b.forward_mode.name,
                b.num_seqs, sum(i.num_tokens for i in b.seqs),
            ))
            self.metrics.mark_progress()
            t_u = _time.perf_counter()
            outputs.extend(self.update_from_output(b, sampled))
            self.metrics.add_time("update", _time.perf_counter() - t_u)
            if batch is not None:
                break  # retire one per dispatch; drain fully only when idle
        return outputs

    def _dispatch(self, batch: ForwardBatch):
        dispatch = getattr(self.runner, "dispatch_batch", None)
        if dispatch is not None:
            return dispatch(batch)
        return self.runner.execute_batch(batch)  # sync runner (tests)

    def _collect(self, handle):
        collect = getattr(self.runner, "collect_batch", None)
        if collect is not None:
            return collect(handle)
        return handle

    def update_from_output(
        self, batch: ForwardBatch, sampled: dict[str, int | list[int]]
    ) -> list[EngineOutput]:
        """Fold sampled tokens back into sequences.

        A decode item may carry up to `decode_lookahead` tokens (device
        super-step); tokens after a finish condition are overshoot from the
        lagging finish detection and are trimmed here, with `cached_len`
        advanced only over the accepted window."""
        self.scheduler.update_after_step(batch)
        decode = batch.forward_mode == ForwardMode.DECODE
        outputs: list[EngineOutput] = []
        for item in batch.seqs:
            seq = item.seq
            if seq.status == SequenceStatus.FINISHED:
                continue  # aborted while in flight
            tokens = sampled.get(seq.seq_id)
            if tokens is None:
                continue  # mid-prompt prefill chunk: no token produced
            if isinstance(tokens, int):
                tokens = [tokens]
            accepted: list[int] = []
            reason = None
            for t in tokens:
                seq.token_ids.append(int(t))
                accepted.append(int(t))
                reason = self._finish_reason(seq)
                if reason is not None:
                    break
            if decode:
                # KV is materialised for positions [start, start+accepted)
                seq.cached_len = item.start + len(accepted)
            if reason is not None:
                seq.finish_reason = reason
                self.scheduler.finish_sequence(seq)
                self.metrics.inc("requests_finished")
            elif not decode and item.end >= seq.prompt_len and accepted:
                # prompt fully prefilled and still live: seed the device
                # token_state so the first decode window (which may dispatch
                # before any host roundtrip) reads the right input token
                seed = getattr(self.runner, "seed_token", None)
                if seed is not None:
                    seed(seq.seq_id, accepted[-1])
            self.metrics.inc("generated_tokens", len(accepted))
            outputs.append(EngineOutput(
                seq_id=seq.seq_id,
                new_token_ids=accepted,
                finished=reason is not None,
                finish_reason=reason,
                num_prompt_tokens=seq.orig_prompt_len,
                num_generated_tokens=seq.num_generated,
            ))
        return outputs

    # ----------------------------------------------------------------- finish

    def _finish_reason(self, seq: Sequence) -> FinishReason | None:
        p = seq.params
        last = seq.last_token
        if not p.ignore_eos:
            if p.eos_token_id is not None and last == p.eos_token_id:
                return FinishReason.STOP
            if p.stop_token_ids and last in p.stop_token_ids:
                return FinishReason.STOP
        # max_tokens counts prompt + generated (ref `engine.py:149-150`)
        if p.max_tokens is not None and seq.total_len >= p.max_tokens:
            return FinishReason.LENGTH
        if p.max_new_tokens is not None and seq.num_generated >= p.max_new_tokens:
            return FinishReason.LENGTH
        if seq.total_len >= self.config.context_len:
            return FinishReason.LENGTH
        return None
