"""FCFS continuous-batching scheduler.

Behavioral parity with the reference scheduler (`nanovllmx/core/scheduler.py`):
prefill-first batching (`scheduler.py:67-80`), decode batches from the running
queue with per-step page allocation, preempt-from-tail recompute-style
preemption pushing victims to the *front* of the waiting queue
(`scheduler.py:84-109,140-153`), and a `scheduled` set that keeps one sequence
out of two in-flight pipeline batches (`scheduler.py:46-48,87-89`).

TPU-first additions (SURVEY.md §7.1):
* **Chunked prefill** with a token budget — long prompts are split across
  steps so prefill shapes stay inside fixed XLA buckets (the reference
  prefills whole prompts eagerly, which needs dynamic shapes).
* **Admission-time prefix reuse** via the radix tree: matched pages are
  adopted and their tokens skipped (the reference only dedups on finish).
* **Pause-don't-preempt decode** ("prompt" admission policy, the default):
  sequences admit as soon as their PROMPT fits, maximizing decode occupancy
  and TTFT; under page pressure a decode window simply skips the super-step
  (keeping its KV) instead of recompute-preempting, since finishing
  sequences free pages continuously. Recompute-preemption (the reference's
  only pressure valve) remains as the guaranteed-progress escape hatch and
  as the "final" booking policy.
"""

from __future__ import annotations

from collections import deque

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.kv_manager import KVCacheManager
from nanovllmx_tpu.engine.sequence import (
    ForwardBatch,
    ForwardMode,
    ScheduledSeq,
    Sequence,
    SequenceStatus,
)


class Scheduler:
    def __init__(self, config: EngineConfig, num_pages: int):
        self.config = config
        self.page_size = config.page_size
        self.max_bs = config.max_bs
        if num_pages < config.pages_per_seq:
            # a single max-length sequence must always fit, or the oldest
            # sequence could hit unpreemptable OOM (guaranteed-progress rule)
            raise ValueError(
                f"KV pool of {num_pages} pages cannot hold one max-length "
                f"sequence ({config.pages_per_seq} pages of {config.page_size} "
                f"tokens); shrink context_len or grow the pool"
            )
        self.kv = KVCacheManager(
            num_pages, config.page_size, config.enable_prefix_caching
        )
        self.num_pages = num_pages
        # ("final" policy) admission booking ledger: seq_id -> projected
        # final page footprint; admission only while the sum fits the pool.
        self._booked: dict[str, int] = {}
        self.booked_pages = 0
        # ("prompt" policy) set when a schedule pass skipped work because
        # pages ran out — arms the guaranteed-progress preemption hatch
        self._paused = False
        self._decode_reserve = 0
        self.waiting: deque[Sequence] = deque()
        # sequences admitted but whose prompt is not fully prefilled yet
        self.prefilling: deque[Sequence] = deque()
        # sequences in steady-state decode
        self.running: list[Sequence] = []
        # in-flight window count per sequence (engine pipelining): a seq may
        # have several dispatched-but-unretired prefill chunks or decode
        # windows when pipeline_depth > 1. Seqs with inflight windows are
        # never preemption victims and never finish/release until retired.
        self.inflight: dict[str, int] = {}
        self._pending_finish: dict[str, bool] = {}  # seq_id -> keep_cache
        self._pipelined = config.pipeline_depth > 1
        self.seqs: dict[str, Sequence] = {}
        self._arrival_clock = 0
        # optional callback fired whenever a sequence leaves device-resident
        # decode state (finish/abort/preempt); the runner frees its row slot
        self.on_release = None
        self.metrics = None  # set by Engine

    def _release_device_state(self, seq: Sequence) -> None:
        if self.on_release is not None:
            self.on_release(seq.seq_id)

    def _gen_estimate(self, seq: Sequence) -> int:
        """Expected REMAINING generation length (exact under ignore_eos +
        max_new_tokens; bounded estimate otherwise)."""
        p = seq.params
        if p.max_new_tokens is not None:
            g = p.max_new_tokens
        elif p.max_tokens is not None:
            # orig_prompt_len, NOT prompt_len: recompute-preemption rebases
            # prompt_len to total_len, which would double-count generated
            # tokens here and skew the longest_gen ordering (ADVICE r4)
            g = max(p.max_tokens - seq.orig_prompt_len, 1)
        else:
            g = 256
        return max(g - seq.num_generated, 0)

    def _prefill_order(self, seqs):
        """Iteration order for prefill continuation/admission: FCFS, or
        longest-expected-generation-first (stable; arrival breaks ties)."""
        if self.config.prefill_priority == "longest_gen":
            return sorted(
                seqs, key=lambda s: (-self._gen_estimate(s), s.arrival)
            )
        return sorted(seqs, key=lambda s: s.arrival)

    # ------------------------------------------------------------------ admin

    def add_sequence(self, seq: Sequence) -> None:
        seq.status = SequenceStatus.WAITING
        if seq.arrival < 0:
            seq.arrival = self._arrival_clock
            self._arrival_clock += 1
        self.seqs[seq.seq_id] = seq
        self.waiting.append(seq)

    def abort_sequence(self, seq_id: str) -> Sequence | None:
        seq = self.seqs.pop(seq_id, None)
        if seq is None:
            return None
        if seq in self.waiting:
            self.waiting.remove(seq)
        if seq in self.prefilling:
            self.prefilling.remove(seq)
        if seq in self.running:
            self.running.remove(seq)
        self._unbook(seq)
        seq.status = SequenceStatus.FINISHED
        if self.inflight.get(seq_id):
            # KV pages are still written by in-flight batches; defer release
            # until the last window retires (update_after_step)
            self._pending_finish[seq_id] = False
            return seq
        self.kv.release(seq)
        self._release_device_state(seq)
        return seq

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.prefilling or self.running
                    or self.inflight)

    # --------------------------------------------------------------- schedule

    def schedule(self) -> ForwardBatch | None:
        self._paused = False
        batch = self._schedule_prefill()
        if batch is not None:
            return batch
        batch = self._schedule_decode()
        if batch is not None:
            return batch
        # Guaranteed-progress hatch ("prompt" policy): every runnable
        # sequence was paused by page exhaustion and nothing is in flight
        # that could free pages on retire — recompute-preempt the youngest
        # live sequence and retry, until something schedules or no victim
        # remains. This is the ONLY place the prompt policy preempts.
        while (self._paused and not self.inflight
               and (self.running or self.prefilling)):
            live = list(self.running) + list(self.prefilling)
            oldest = min(live, key=lambda s: s.arrival)
            victim = self._pick_victim(oldest)
            if victim is None:
                return None
            self._preempt(victim)
            self._paused = False
            batch = self._schedule_prefill()
            if batch is None:
                batch = self._schedule_decode()
            if batch is not None:
                return batch
        return None

    def _schedule_prefill(self) -> ForwardBatch | None:
        """Build a PREFILL batch: continue partially-prefilled seqs first,
        then admit new waiting seqs, within the token budget and max_bs."""
        budget = self.config.max_num_batched_tokens
        max_seqs = min(self.max_bs, self.config.max_prefill_seqs)
        sched: list[ScheduledSeq] = []

        # 1) continue in-flight chunked prefills (FCFS, or longest-gen
        # first under the "longest_gen" priority). Chunks are
        # result-independent (pure KV materialisation), so with pipelining
        # the next chunk dispatches before the previous retires.
        for seq in self._prefill_order(self.prefilling):
            if budget <= 0 or len(sched) >= max_seqs:
                break
            if not self._pipelined and self.inflight.get(seq.seq_id):
                continue  # previous chunk still in flight (serial mode)
            if seq.dispatched_len >= seq.prompt_len:
                continue  # fully dispatched; awaiting retirement
            if seq not in self.prefilling:
                continue  # preempted by an earlier alloc in this loop
            item = self._chunk_for(seq, budget)
            if item is None:
                break  # OOM even after preemption: stop growing the batch
            # mark in-flight immediately so later allocations in this same
            # batch cannot preempt it
            self._mark_inflight(item)
            sched.append(item)
            budget -= item.num_tokens

        # 2) admit new sequences (total live seqs capped at max_bs so the
        # runner's device row slots can never overflow). Admission order is
        # the configured priority over the whole waiting set.
        for seq in self._prefill_order(self.waiting):
            if budget <= 0 or len(sched) >= max_seqs:
                break
            if len(self.prefilling) + len(self.running) >= self.max_bs:
                break
            if self.inflight.get(seq.seq_id):
                break  # recompute victim with stale in-flight windows
            if not self._admit(seq):
                break  # pool cannot take it: wait for pages to free
            if seq.cached_len == 0 and not seq.page_ids:
                hit = self.kv.match_and_lock(seq)
                if hit and self.metrics is not None:
                    self.metrics.inc("prefix_cache_hit_tokens", hit)
            item = self._chunk_for(seq, budget)
            if item is None:
                self._unbook(seq)
                break
            self.waiting.remove(seq)
            seq.status = SequenceStatus.RUNNING
            self.prefilling.append(seq)
            self._mark_inflight(item)
            sched.append(item)
            budget -= item.num_tokens

        if not sched:
            return None
        return ForwardBatch(ForwardMode.PREFILL, sched)

    def _chunk_for(self, seq: Sequence, budget: int) -> ScheduledSeq | None:
        """Next prefill chunk for `seq`, allocating pages; None on OOM."""
        start = max(seq.cached_len, seq.dispatched_len)
        end = min(seq.prompt_len, start + min(budget, self.config.prefill_chunk))
        if end <= start:
            return None
        need = seq.num_pages_needed(end, self.page_size)
        if self.config.admission_policy == "prompt":
            # pause semantics: no pages now -> skip this chunk, keep what we
            # hold, retry next step (finishing seqs free pages continuously)
            if not self._alloc_plain(seq, need):
                return None
        elif not self._alloc_with_preemption(seq, need):
            return None
        return ScheduledSeq(seq=seq, start=start, end=end)

    def _schedule_decode(self) -> ForwardBatch | None:
        # one decode item covers K lookahead tokens: KV positions
        # [total_len-1, total_len-1+K) will be written by the super-step,
        # so pages are allocated for the whole window up front
        K = self.config.decode_lookahead
        self._decode_reserve = self._prefill_shortfall()
        sched: list[ScheduledSeq] = []
        if self.config.prefill_priority == "longest_gen":
            # under page pressure the tail of this order pauses first;
            # keeping the longest-remaining jobs running shrinks the
            # low-occupancy drain
            order = sorted(
                self.running,
                key=lambda s: (-self._gen_estimate(s), s.arrival),
            )
        else:
            order = sorted(self.running, key=lambda s: s.arrival)
        for seq in order:
            if len(sched) >= self.max_bs:
                break
            if not self._pipelined and self.inflight.get(seq.seq_id):
                continue
            if seq not in self.running:
                continue  # preempted by an earlier alloc in this loop
            # Speculative continuation: with windows in flight, the next
            # window starts where the last DISPATCHED one ends — its input
            # token is chained on device (runner token_state), so the host
            # does not need the previous window's results.
            start = max(seq.total_len - 1, seq.dispatched_len)
            # clamp the window at context_len: positions beyond it can never
            # be accepted (LENGTH finish) and would overflow the page-table
            # row width (pages_per_seq)
            end = min(start + K, self.config.context_len)
            if end <= start:
                continue  # at the context cap; retires via LENGTH finish
            need = seq.num_pages_needed(end, self.page_size)
            if self.config.admission_policy == "prompt":
                # pause-don't-preempt: a window that cannot get pages skips
                # this super-step (the seq keeps its KV; no recompute) and
                # retries next step. Prompt pages promised to admitted
                # prefilling seqs are fenced off via the shortfall reserve.
                if not self._alloc_decode_window(seq, need):
                    if self.metrics is not None:
                        self.metrics.inc("decode_paused_windows")
                    continue
            elif not self._alloc_with_preemption(seq, need):
                # cannot fit even after preempting all younger seqs:
                # preempt itself (ref tail self-preemption, scheduler.py:84-109)
                if not self.inflight.get(seq.seq_id):
                    self._preempt(seq)
                continue
            item = ScheduledSeq(seq=seq, start=start, end=end)
            self._mark_inflight(item)
            sched.append(item)
        if not sched:
            return None
        return ForwardBatch(ForwardMode.DECODE, sched)

    def _mark_inflight(self, item: ScheduledSeq) -> None:
        seq = item.seq
        self.inflight[seq.seq_id] = self.inflight.get(seq.seq_id, 0) + 1
        seq.dispatched_len = max(seq.dispatched_len, item.end)

    # ------------------------------------------------------------- admission

    def _available_pages(self) -> int:
        """Pages obtainable right now: free + cached-and-evictable (the
        radix-cached count may include a few locked, unevictable pages; the
        later alloc failure then just pauses, so overcounting is safe)."""
        return self.kv.num_free_pages + self.kv.num_cached_pages

    def _prefill_shortfall(self) -> int:
        """Pages still owed to admitted-but-not-fully-prefilled prompts.
        Decode growth may not eat into these (admission promised them), or
        late admits would starve under decode pressure and TTFT blows up."""
        ps = self.page_size
        return sum(
            max(0, -(-seq.prompt_len // ps) - len(seq.page_ids))
            for seq in self.prefilling
        )

    def _admit(self, seq: Sequence) -> bool:
        """Policy gate for admitting a WAITING sequence."""
        if self.config.admission_policy == "prompt":
            if not (self.running or self.prefilling):
                return True  # guaranteed progress: pool is known to fit one
            ps = self.page_size
            need = max(0, -(-seq.prompt_len // ps) - len(seq.page_ids))
            if self._available_pages() - self._prefill_shortfall() < need:
                self._paused = True
                return False
            return True
        return self._book(seq)

    def _book(self, seq: Sequence) -> bool:
        """("final" policy) Reserve `seq`'s projected final page footprint;
        False when the pool is fully booked (admission must wait). The first
        admission is always allowed (guaranteed progress; a single max-length
        sequence is known to fit from the constructor check)."""
        reserve = self.config.admission_reserve
        if reserve <= 0.0:
            return True  # booking disabled: legacy free-page admission
        ps = self.page_size
        K = self.config.decode_lookahead
        proj_tokens = min(
            seq.projected_final_len(self.config.context_len, reserve) + K - 1,
            self.config.context_len,
        )
        proj = -(-proj_tokens // ps)
        if self.booked_pages and self.booked_pages + proj > self.num_pages:
            return False
        self._booked[seq.seq_id] = proj
        self.booked_pages += proj
        return True

    def _unbook(self, seq: Sequence) -> None:
        self.booked_pages -= self._booked.pop(seq.seq_id, 0)

    # ------------------------------------------------------------- allocation

    def _alloc_plain(self, seq: Sequence, need: int) -> bool:
        """Allocate without preempting anyone (pause semantics on failure)."""
        if need == 0:
            return True
        pages = self.kv.alloc_pages(need)
        if pages is None:
            self._paused = True
            return False
        seq.page_ids.extend(pages)
        return True

    def _alloc_decode_window(self, seq: Sequence, need: int) -> bool:
        """("prompt" policy) allocate a decode window, fencing off the pages
        still owed to admitted prefilling prompts (self._decode_reserve)."""
        if need == 0:
            return True
        if self._available_pages() - need < self._decode_reserve:
            self._paused = True
            return False
        return self._alloc_plain(seq, need)

    def _alloc_with_preemption(self, seq: Sequence, need: int) -> bool:
        """Allocate `need` pages for seq, preempting strictly YOUNGER
        sequences (highest arrival first) until it fits.

        The reference preempts from the tail of the running queue
        (`scheduler.py:84-109`); with chunked prefill in the mix, the
        forward-progress guarantee must be explicit: a sequence may only evict
        sequences that arrived after it, so the oldest unfinished sequence can
        always run to completion and the engine cannot livelock under memory
        pressure. In-flight batch members (`scheduled`) are never victims."""
        while True:
            pages = self.kv.alloc_pages(need)
            if pages is not None:
                seq.page_ids.extend(pages)
                return True
            victim = self._pick_victim(seq)
            if victim is None:
                return False
            self._preempt(victim)

    def _pick_victim(self, seq: Sequence) -> Sequence | None:
        """Youngest preemptable sequence strictly younger than `seq`."""
        best: Sequence | None = None
        for cand in list(self.running) + list(self.prefilling):
            if cand is seq or self.inflight.get(cand.seq_id):
                continue
            if cand.arrival <= seq.arrival:
                continue
            if best is None or cand.arrival > best.arrival:
                best = cand
        return best

    def _preempt(self, victim: Sequence) -> None:
        """Recompute-style preemption: free KV, push to the FRONT of waiting
        (ref `scheduler.py:140-153`)."""
        if victim in self.running:
            self.running.remove(victim)
        if victim in self.prefilling:
            self.prefilling.remove(victim)
        self._unbook(victim)
        self.kv.release(victim)
        self._release_device_state(victim)
        if self.metrics is not None:
            self.metrics.inc("preemptions")
        # generated tokens become part of the prompt for recompute
        victim.prompt_len = victim.total_len
        victim.reset_for_recompute()
        self.waiting.appendleft(victim)

    # ----------------------------------------------------------------- update

    def update_after_step(self, batch: ForwardBatch) -> None:
        """Advance KV bookkeeping after the runner executed `batch`.

        Prefill: computed tokens' KV is now materialised up to item.end.
        Decode: cached_len is set by the engine from the number of ACCEPTED
        lookahead tokens (finish may cut the window short)."""
        for item in batch.seqs:
            seq = item.seq
            cnt = self.inflight.get(seq.seq_id, 0) - 1
            if cnt > 0:
                self.inflight[seq.seq_id] = cnt
            else:
                self.inflight.pop(seq.seq_id, None)
            if seq.status == SequenceStatus.FINISHED:
                # finished/aborted with windows still in flight: release the
                # KV/device state only once the LAST window retires
                if cnt <= 0 and seq.seq_id in self._pending_finish:
                    keep = self._pending_finish.pop(seq.seq_id)
                    if keep:
                        self.kv.cache_finished(seq)
                    else:
                        self.kv.release(seq)
                    self._release_device_state(seq)
                    self.seqs.pop(seq.seq_id, None)
                continue
            if batch.forward_mode == ForwardMode.PREFILL:
                seq.cached_len = max(seq.cached_len, item.end)
                if item.end >= seq.prompt_len:
                    # prompt fully prefilled: graduates to decode
                    if seq in self.prefilling:
                        self.prefilling.remove(seq)
                    self.running.append(seq)

    def finish_sequence(self, seq: Sequence, keep_cache: bool = True) -> None:
        """Retire a finished sequence, inserting its KV into the prefix cache
        (ref `scheduler.py:173-190`)."""
        if seq in self.running:
            self.running.remove(seq)
        if seq in self.prefilling:
            self.prefilling.remove(seq)
        self._unbook(seq)
        seq.status = SequenceStatus.FINISHED
        if self.inflight.get(seq.seq_id):
            # later speculative windows are still in flight and write into
            # this seq's pages: defer release until they retire
            self._pending_finish[seq.seq_id] = keep_cache
            return
        if keep_cache:
            self.kv.cache_finished(seq)
        else:
            self.kv.release(seq)
        self._release_device_state(seq)
        self.seqs.pop(seq.seq_id, None)
