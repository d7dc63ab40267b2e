"""Scheduler + KV manager behavior tests (pure CPU, no jax).

Models the reference scheduler semantics (`/root/reference/nanovllmx/core/
scheduler.py`): prefill-first, FCFS admission, preempt-from-tail recompute,
plus the TPU-first chunked prefill and admission-time prefix reuse.
"""

import pytest

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.scheduler import Scheduler
from nanovllmx_tpu.engine.sequence import ForwardMode, Sequence, SequenceStatus
from nanovllmx_tpu.sampling_params import SamplingParams


def make_config(**kw):
    defaults = dict(
        max_bs=4,
        context_len=64,
        page_size=4,
        prefill_chunk=8,
        max_num_batched_tokens=16,
        decode_lookahead=1,  # classic per-token decode for these tests
    )
    defaults.update(kw)
    return EngineConfig(**defaults)


def make_seq(seq_id, tokens):
    return Sequence(seq_id=seq_id, token_ids=list(tokens), params=SamplingParams())


def run_batch(sched, batch):
    """Pretend the runner executed the batch."""
    sched.update_after_step(batch)


def test_prefill_first_then_decode():
    sched = Scheduler(make_config(), num_pages=32)
    sched.add_sequence(make_seq("a", range(6)))
    batch = sched.schedule()
    assert batch.forward_mode == ForwardMode.PREFILL
    assert batch.num_seqs == 1
    item = batch.seqs[0]
    assert (item.start, item.end) == (0, 6)
    run_batch(sched, batch)
    # prompt done -> decode next
    item.seq.token_ids.append(100)  # engine appends sampled token
    batch2 = sched.schedule()
    assert batch2.forward_mode == ForwardMode.DECODE
    assert batch2.seqs[0].start == 6 and batch2.seqs[0].end == 7


def test_chunked_prefill_splits_long_prompt():
    sched = Scheduler(make_config(prefill_chunk=8), num_pages=32)
    sched.add_sequence(make_seq("a", range(20)))
    b1 = sched.schedule()
    assert (b1.seqs[0].start, b1.seqs[0].end) == (0, 8)
    run_batch(sched, b1)
    b2 = sched.schedule()
    assert b2.forward_mode == ForwardMode.PREFILL
    assert (b2.seqs[0].start, b2.seqs[0].end) == (8, 16)
    run_batch(sched, b2)
    b3 = sched.schedule()
    assert (b3.seqs[0].start, b3.seqs[0].end) == (16, 20)
    run_batch(sched, b3)
    assert b3.seqs[0].seq in sched.running


def test_token_budget_batches_multiple_prompts():
    sched = Scheduler(make_config(max_num_batched_tokens=16), num_pages=64)
    sched.add_sequence(make_seq("a", range(6)))
    sched.add_sequence(make_seq("b", range(6)))
    sched.add_sequence(make_seq("c", range(6)))
    batch = sched.schedule()
    # 6 + 6 fit in 16; third would overflow (budget left = 4 -> chunk of 4)
    ids = [s.seq.seq_id for s in batch.seqs]
    assert ids == ["a", "b", "c"]
    assert batch.seqs[2].num_tokens == 4  # partial chunk under budget


def test_decode_allocates_new_page_on_boundary():
    cfg = make_config(page_size=4)
    sched = Scheduler(cfg, num_pages=32)
    seq = make_seq("a", range(4))  # exactly one page
    sched.add_sequence(seq)
    run_batch(sched, sched.schedule())
    seq.token_ids.append(1)
    before = sched.kv.num_free_pages
    batch = sched.schedule()
    assert batch.forward_mode == ForwardMode.DECODE
    assert sched.kv.num_free_pages == before - 1  # new page for token 5


def test_preempt_tail_on_oom():
    # 4 pages total; two seqs of 2 pages each fill the pool.
    # admission_reserve=0 disables booking so the OOM-preemption valve
    # (the behavior under test) is actually reachable.
    cfg = make_config(page_size=4, max_num_batched_tokens=8, prefill_chunk=8,
                      context_len=16, admission_reserve=0.0)
    sched = Scheduler(cfg, num_pages=4)
    a = make_seq("a", range(8))
    b = make_seq("b", range(8))
    sched.add_sequence(a)
    sched.add_sequence(b)
    b1 = sched.schedule()
    assert [s.seq.seq_id for s in b1.seqs] == ["a"]  # budget 8 fits only a
    run_batch(sched, b1)
    a.token_ids.append(1)
    b2 = sched.schedule()  # prefill b, taking the other 2 pages
    assert [s.seq.seq_id for s in b2.seqs] == ["b"]
    run_batch(sched, b2)
    b.token_ids.append(1)
    # decode: a needs a 3rd page -> preempts b (tail of running)
    b3 = sched.schedule()
    assert b3.forward_mode == ForwardMode.DECODE
    assert [s.seq.seq_id for s in b3.seqs] == ["a"]
    assert b.status == SequenceStatus.WAITING
    assert b.num_preemptions == 1
    assert b.page_ids == []
    # preempted seq is at the FRONT of waiting and its generated token became
    # part of the prompt for recompute
    assert sched.waiting[0] is b
    assert b.prompt_len == 9


def test_prefix_cache_reuse_at_admission():
    cfg = make_config(page_size=4, max_num_batched_tokens=32, prefill_chunk=32)
    sched = Scheduler(cfg, num_pages=32)
    a = make_seq("a", range(12))
    sched.add_sequence(a)
    run_batch(sched, sched.schedule())
    a.token_ids.append(1)
    sched.finish_sequence(a)  # inserts 3 full pages into the tree
    assert sched.kv.num_cached_pages == 3

    # same first 8 tokens -> 2 pages reused, prefill starts at 8
    b = make_seq("b", list(range(8)) + [70, 71, 72, 73])
    sched.add_sequence(b)
    batch = sched.schedule()
    item = batch.seqs[0]
    assert item.start == 8 and item.end == 12
    assert b.cached_len == 8 and b.shared_len == 8
    assert len(b.page_ids) == 3  # 2 adopted + 1 fresh


def test_fully_cached_prompt_still_computes_last_token():
    cfg = make_config(page_size=4, max_num_batched_tokens=32, prefill_chunk=32)
    sched = Scheduler(cfg, num_pages=32)
    a = make_seq("a", range(12))
    sched.add_sequence(a)
    run_batch(sched, sched.schedule())
    sched.finish_sequence(a)

    b = make_seq("b", range(12))  # identical prompt
    sched.add_sequence(b)
    batch = sched.schedule()
    item = batch.seqs[0]
    # 12 tokens, all 3 pages cached, but match is capped at total_len-1=11
    # -> 2 pages (8 tokens) adopted, tokens 8..12 computed
    assert item.start == 8 and item.end == 12


def test_shared_pages_not_freed_on_release():
    cfg = make_config(page_size=4, max_num_batched_tokens=32, prefill_chunk=32)
    sched = Scheduler(cfg, num_pages=32)
    a = make_seq("a", range(12))
    sched.add_sequence(a)
    run_batch(sched, sched.schedule())
    sched.finish_sequence(a)
    free_before = sched.kv.num_free_pages

    b = make_seq("b", list(range(8)) + [70, 71, 72, 73])
    sched.add_sequence(b)
    run_batch(sched, sched.schedule())
    sched.abort_sequence("b")
    # only b's private page is freed; the 2 adopted pages stay in the tree
    assert sched.kv.num_free_pages == free_before
    assert sched.kv.num_cached_pages == 3


def test_finish_dedups_against_existing_cache():
    cfg = make_config(page_size=4, max_num_batched_tokens=32, prefill_chunk=32)
    sched = Scheduler(cfg, num_pages=32)
    # two identical prompts admitted before either finishes -> both get
    # private pages; on finish the second's duplicates are freed
    a = make_seq("a", range(12))
    b = make_seq("b", range(12))
    sched.add_sequence(a)
    sched.add_sequence(b)
    batch = sched.schedule()
    assert batch.num_seqs == 2
    run_batch(sched, batch)
    used_before = sched.kv.allocator.num_used  # 6 pages (3 each)
    assert used_before == 6
    sched.finish_sequence(a)  # 3 pages -> tree
    sched.finish_sequence(b)  # 3 duplicate pages freed
    assert sched.kv.allocator.num_used == 3
    assert sched.kv.num_cached_pages == 3


def test_eviction_frees_cold_cache_for_new_seqs():
    cfg = make_config(page_size=4, max_num_batched_tokens=32, prefill_chunk=16,
                      context_len=16)
    sched = Scheduler(cfg, num_pages=4)
    a = make_seq("a", range(16))  # takes all 4 pages
    sched.add_sequence(a)
    run_batch(sched, sched.schedule())
    sched.finish_sequence(a)
    assert sched.kv.num_cached_pages == 4
    assert sched.kv.num_free_pages == 0
    # unrelated prompt forces eviction of the cold cache
    b = make_seq("b", [90, 91, 92, 93, 94, 95, 96, 97])
    sched.add_sequence(b)
    batch = sched.schedule()
    assert batch is not None
    assert len(b.page_ids) == 2
    assert sched.kv.num_cached_pages <= 2


def test_decode_lookahead_allocates_window():
    # K=8, page 4: a 4-token seq decoding with lookahead needs pages for
    # 4-1+8 = 11 tokens -> 3 pages (had 1)
    cfg = make_config(decode_lookahead=8)
    sched = Scheduler(cfg, num_pages=32)
    seq = make_seq("a", range(4))
    sched.add_sequence(seq)
    run_batch(sched, sched.schedule())
    seq.token_ids.append(1)
    free_before = sched.kv.num_free_pages
    batch = sched.schedule()
    assert batch.forward_mode == ForwardMode.DECODE
    item = batch.seqs[0]
    assert (item.start, item.end) == (4, 12)
    assert len(seq.page_ids) == 3
    assert sched.kv.num_free_pages == free_before - 2


def test_scheduled_set_blocks_double_scheduling():
    sched = Scheduler(make_config(), num_pages=32)
    a = make_seq("a", range(6))
    sched.add_sequence(a)
    b1 = sched.schedule()
    assert b1 is not None
    # batch still in flight: a must not be scheduled again
    assert sched.schedule() is None
    run_batch(sched, b1)
    a.token_ids.append(1)
    assert sched.schedule() is not None


def test_admission_booking_blocks_overcommit():
    """With exact booking (ignore_eos + max_new_tokens), admission stops
    when projected final footprints would exceed the pool, so steady-state
    decode never preempts."""
    cfg = make_config(context_len=64, page_size=4, max_num_batched_tokens=64,
                      prefill_chunk=16, max_bs=8, admission_policy="final")
    sched = Scheduler(cfg, num_pages=16)  # 64 tokens of KV
    # each seq: prompt 8 + exactly 24 generated = 32 tokens = 8 pages
    for sid in ("a", "b", "c"):
        sched.add_sequence(Sequence(
            seq_id=sid, token_ids=list(range(8)),
            params=SamplingParams(ignore_eos=True, max_new_tokens=24),
        ))
    batch = sched.schedule()
    # pool books 2 x 8 pages; third seq must wait
    assert [s.seq.seq_id for s in batch.seqs] == ["a", "b"]
    assert sched.booked_pages == 16
    run_batch(sched, batch)
    # decode a+b to completion: zero preemptions by construction
    for _ in range(24):
        for s in batch.seqs:
            s.seq.token_ids.append(1)
        d = sched.schedule()
        assert d.forward_mode == ForwardMode.DECODE
        assert all(item.seq.num_preemptions == 0 for item in d.seqs)
        run_batch(sched, d)
    for s in batch.seqs:
        sched.finish_sequence(s.seq)
    assert sched.booked_pages == 0
    # c admits now
    nxt = sched.schedule()
    assert nxt.forward_mode == ForwardMode.PREFILL
    assert [s.seq.seq_id for s in nxt.seqs] == ["c"]


def test_admission_booking_released_on_abort_and_preempt():
    cfg = make_config(context_len=64, page_size=4, max_num_batched_tokens=64,
                      prefill_chunk=16, max_bs=8, admission_policy="final")
    sched = Scheduler(cfg, num_pages=16)
    sched.add_sequence(Sequence(
        seq_id="a", token_ids=list(range(8)),
        params=SamplingParams(ignore_eos=True, max_new_tokens=24),
    ))
    run_batch(sched, sched.schedule())
    assert sched.booked_pages == 8
    sched.abort_sequence("a")
    assert sched.booked_pages == 0


def test_decode_window_clamped_at_context_len():
    """The lookahead window never schedules positions past context_len (they
    could overflow the page-table row width)."""
    cfg = make_config(context_len=16, page_size=4, decode_lookahead=8,
                      max_num_batched_tokens=16, prefill_chunk=16)
    sched = Scheduler(cfg, num_pages=8)
    seq = make_seq("a", range(12))
    sched.add_sequence(seq)
    run_batch(sched, sched.schedule())
    seq.token_ids.append(1)  # total 13; window would be [12, 20) unclamped
    batch = sched.schedule()
    item = batch.seqs[0]
    assert (item.start, item.end) == (12, 16)
    assert len(seq.page_ids) <= cfg.pages_per_seq


def test_pause_not_preempt_under_decode_pressure():
    """"prompt" policy: when decode windows cannot get pages, younger seqs
    SKIP the step (keeping their KV) while older ones still run — no
    recompute-preemption as long as someone makes progress."""
    cfg = make_config(page_size=4, max_num_batched_tokens=8, prefill_chunk=8,
                      context_len=20, max_bs=4)
    sched = Scheduler(cfg, num_pages=5)
    a = make_seq("a", range(8))   # 2 pages
    b = make_seq("b", range(8))   # 2 pages
    sched.add_sequence(a)
    sched.add_sequence(b)
    run_batch(sched, sched.schedule())  # prefill a
    a.token_ids.append(1)
    run_batch(sched, sched.schedule())  # prefill b (admits: prompt fits)
    b.token_ids.append(1)
    # 4 of 5 pages used. a's decode grabs the last page; b pauses (its
    # window can't fit) but is NOT preempted.
    d1 = sched.schedule()
    assert d1.forward_mode == ForwardMode.DECODE
    assert [s.seq.seq_id for s in d1.seqs] == ["a"]
    assert b in sched.running and b.num_preemptions == 0
    assert b.page_ids != []
    run_batch(sched, d1)
    a.token_ids.append(1)
    # a finishes -> frees its pages -> b's window resumes
    sched.finish_sequence(a, keep_cache=False)
    d2 = sched.schedule()
    assert d2.forward_mode == ForwardMode.DECODE
    assert [s.seq.seq_id for s in d2.seqs] == ["b"]
    assert b.num_preemptions == 0


def test_prompt_policy_admits_on_prompt_footprint():
    """Admission under "prompt" policy ignores projected generation length:
    both seqs admit immediately (under "final" booking the second would
    wait for the first to finish)."""
    cfg = make_config(context_len=64, page_size=4, max_num_batched_tokens=64,
                      prefill_chunk=16, max_bs=8)
    sched = Scheduler(cfg, num_pages=16)
    for sid in ("a", "b", "c"):
        sched.add_sequence(Sequence(
            seq_id=sid, token_ids=list(range(8)),
            params=SamplingParams(ignore_eos=True, max_new_tokens=24),
        ))
    batch = sched.schedule()
    assert [s.seq.seq_id for s in batch.seqs] == ["a", "b", "c"]


def test_decode_growth_fences_prefill_shortfall():
    """Pages owed to an admitted, partially-prefilled prompt are fenced off
    from decode growth, so late admits cannot be starved (TTFT guard)."""
    cfg = make_config(page_size=4, max_num_batched_tokens=4, prefill_chunk=4,
                      context_len=24, max_bs=4, decode_lookahead=1)
    sched = Scheduler(cfg, num_pages=6)
    a = make_seq("a", range(4))    # 1 page prompt
    sched.add_sequence(a)
    run_batch(sched, sched.schedule())  # prefill a fully
    a.token_ids.append(1)
    b = make_seq("b", range(12))   # 3 page prompt
    sched.add_sequence(b)
    p1 = sched.schedule()          # b admits, first chunk (1 page)
    assert p1.forward_mode == ForwardMode.PREFILL
    run_batch(sched, p1)
    # free pages: 6 - 1(a) - 1(b chunk) = 4; b is still owed 2 pages.
    # a's decode may use at most 4 - 2 = 2 more pages: grow a by 2 windows
    for _ in range(2):
        a.token_ids.append(1)
        d = sched.schedule()
        # prefill-first: b's next chunks run before a's decode
        while d.forward_mode == ForwardMode.PREFILL:
            run_batch(sched, d)
            d = sched.schedule()
        run_batch(sched, d)
    assert b.num_preemptions == 0 and a.num_preemptions == 0


def test_longest_gen_priority_orders_admission():
    """prefill_priority='longest_gen': among simultaneously-waiting
    sequences, the one with the largest expected remaining generation is
    admitted/prefilled first (drain-tail shaping; FCFS remains default)."""
    from nanovllmx_tpu.config import EngineConfig
    from nanovllmx_tpu.engine.scheduler import Scheduler
    from nanovllmx_tpu.engine.sequence import Sequence
    from nanovllmx_tpu.sampling_params import SamplingParams

    cfg = EngineConfig(
        model="<t>", max_bs=4, context_len=128, page_size=8,
        prefill_chunk=16, max_num_batched_tokens=16, max_prefill_seqs=1,
        prefill_priority="longest_gen",
    )
    sch = Scheduler(cfg, num_pages=64)
    for sid, gen in (("short", 4), ("long", 90), ("mid", 30)):
        sch.add_sequence(Sequence(
            seq_id=sid, token_ids=list(range(1, 13)), prompt_len=12,
            params=SamplingParams(max_new_tokens=gen, ignore_eos=True),
        ))
    batch = sch.schedule()
    assert batch is not None
    assert batch.seqs[0].seq.seq_id == "long"
