"""Engine step-loop tests with a fake runner (no jax).

Exercises the schedule -> execute -> update loop and finish detection
(ref `/root/reference/nanovllmx/core/engine.py:81-163`).
"""

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.engine import Engine
from nanovllmx_tpu.engine.sequence import FinishReason, ForwardMode
from nanovllmx_tpu.sampling_params import SamplingParams


class FakeRunner:
    """Device model: echoes a deterministic next token ((last + 1) % 1000)
    with DEVICE-side chaining state, like the real runner's token_state —
    a speculative decode window dispatched before its predecessor retires
    never reads host token_ids."""

    def __init__(self, fixed=None):
        self.fixed = fixed
        self.batches = []
        self.state = {}  # seq_id -> last device-sampled token

    def _next(self, last):
        return self.fixed if self.fixed is not None else (last + 1) % 1000

    def execute_batch(self, batch):
        self.batches.append(batch)
        out = {}
        for item in batch.seqs:
            sid = item.seq.seq_id
            if batch.forward_mode == ForwardMode.PREFILL:
                if item.end < item.seq.prompt_len:
                    continue
                tok = self._next(item.seq.token_ids[item.end - 1])
                self.state[sid] = tok
                out[sid] = tok
            else:
                last = self.state.get(sid, item.seq.token_ids[-1])
                toks = []
                for _ in range(item.end - item.start):
                    last = self._next(last)
                    toks.append(last)
                self.state[sid] = last
                out[sid] = toks
        return out


def make_engine(runner=None, **kw):
    # serial parity mode: 1 token per window, 1 batch in flight (the classic
    # reference step loop); pipelined mode is covered separately below
    defaults = dict(
        max_bs=8, context_len=64, page_size=4,
        prefill_chunk=16, max_num_batched_tokens=32,
        decode_lookahead=1, pipeline_depth=1,
    )
    defaults.update(kw)
    cfg = EngineConfig(**defaults)
    return Engine(cfg, runner or FakeRunner(), num_pages=64, eos_token_id=999)


def drain(engine, max_steps=200):
    outs = []
    steps = 0
    while engine.has_unfinished_sequences():
        outs.extend(engine.step())
        steps += 1
        assert steps < max_steps, "engine did not converge"
    return outs


def test_generate_until_max_new_tokens():
    eng = make_engine()
    eng.add_sequence("a", [1, 2, 3], SamplingParams(max_new_tokens=5, ignore_eos=True))
    outs = drain(eng)
    assert len(outs) == 5
    assert outs[-1].finished and outs[-1].finish_reason == FinishReason.LENGTH
    assert [o.new_token_ids[0] for o in outs] == [4, 5, 6, 7, 8]


def test_eos_stops_generation():
    runner = FakeRunner(fixed=999)
    eng = make_engine(runner)
    eng.add_sequence("a", [1, 2, 3], SamplingParams(max_new_tokens=50))
    outs = drain(eng)
    assert len(outs) == 1
    assert outs[0].finish_reason == FinishReason.STOP


def test_ignore_eos():
    runner = FakeRunner(fixed=999)
    eng = make_engine(runner)
    eng.add_sequence("a", [1, 2, 3], SamplingParams(max_new_tokens=3, ignore_eos=True))
    outs = drain(eng)
    assert len(outs) == 3
    assert outs[-1].finish_reason == FinishReason.LENGTH


def test_stop_token_ids():
    runner = FakeRunner(fixed=7)
    eng = make_engine(runner)
    eng.add_sequence("a", [1, 2, 3], SamplingParams(stop_token_ids=[7], max_new_tokens=50))
    outs = drain(eng)
    assert len(outs) == 1 and outs[0].finish_reason == FinishReason.STOP


def test_max_tokens_counts_prompt():
    # max_tokens is TOTAL length (ref engine.py:149-150): prompt 3 + 2 = 5
    eng = make_engine()
    eng.add_sequence("a", [1, 2, 3], SamplingParams(max_tokens=5, ignore_eos=True))
    outs = drain(eng)
    assert len(outs) == 2
    assert outs[-1].finish_reason == FinishReason.LENGTH


def test_long_prompt_truncated_to_context():
    eng = make_engine()
    prompt = list(range(100))  # context_len=64 -> keep last 63
    eng.add_sequence("a", prompt, SamplingParams(max_new_tokens=1, ignore_eos=True))
    outs = drain(eng)
    assert outs[0].num_prompt_tokens == 63


def test_concurrent_sequences_interleave():
    eng = make_engine()
    for i in range(4):
        eng.add_sequence(f"s{i}", [10 * i + 1, 10 * i + 2],
                         SamplingParams(max_new_tokens=4, ignore_eos=True))
    outs = drain(eng)
    by_seq = {}
    for o in outs:
        by_seq.setdefault(o.seq_id, []).extend(o.new_token_ids)
    assert set(by_seq) == {"s0", "s1", "s2", "s3"}
    for i in range(4):
        first = 10 * i + 3
        assert by_seq[f"s{i}"] == [first, first + 1, first + 2, first + 3]


def test_abort_mid_generation():
    eng = make_engine()
    eng.add_sequence("a", [1, 2], SamplingParams(max_new_tokens=50, ignore_eos=True))
    eng.step()  # prefill
    out = eng.abort_sequence("a")
    assert out.finished and out.finish_reason == FinishReason.ABORT
    assert not eng.has_unfinished_sequences()


def test_chunked_prefill_produces_single_first_token():
    eng = make_engine()
    # prompt 40 > prefill_chunk 16 -> 3 prefill steps, only last yields a token
    eng.add_sequence("a", list(range(1, 41)), SamplingParams(max_new_tokens=2, ignore_eos=True))
    o1 = eng.step()
    assert o1 == []
    o2 = eng.step()
    assert o2 == []
    o3 = eng.step()
    assert len(o3) == 1 and o3[0].new_token_ids == [41]


def test_pipelined_matches_serial():
    """pipeline_depth=2 with lookahead windows produces the same per-seq
    token streams as the serial loop (speculative windows chain on the
    fake's device-side state; overshoot past a finish is trimmed)."""
    def run(depth, lookahead):
        eng = make_engine(FakeRunner(), pipeline_depth=depth,
                          decode_lookahead=lookahead)
        for i in range(4):
            eng.add_sequence(
                f"s{i}", [10 * i + 1, 10 * i + 2],
                SamplingParams(max_new_tokens=7, ignore_eos=True),
            )
        by_seq = {}
        for o in drain(eng):
            by_seq.setdefault(o.seq_id, []).extend(o.new_token_ids)
        return by_seq

    serial = run(1, 1)
    for depth, k in [(2, 1), (2, 4), (3, 4)]:
        assert run(depth, k) == serial, (depth, k)


def test_pipelined_finish_defers_release():
    """A sequence finishing while a later window is in flight must not
    release its pages until that window retires (no page corruption)."""
    eng = make_engine(FakeRunner(), pipeline_depth=2, decode_lookahead=4)
    eng.add_sequence("a", [1, 2, 3],
                     SamplingParams(max_new_tokens=2, ignore_eos=True))
    outs = drain(eng)
    toks = [t for o in outs for t in o.new_token_ids]
    assert toks == [4, 5]
    sch = eng.scheduler
    assert not sch.inflight and not sch._pending_finish
    # all pages returned (prefix cache may retain some, ref-counted)
    assert sch.kv.allocator.num_used == sch.kv.tree.num_cached_pages
