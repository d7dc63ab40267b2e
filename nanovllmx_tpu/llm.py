"""LLM front-end: tokenizer + asyncio plumbing over the engine.

Counterpart of the reference `LLM` (`nanovllmx/llm.py`): owns the HF
tokenizer, exposes `async generate(prompt, SamplingParams, seq_id)` yielding
per-token `GenerateOutput`, plus `abort/ready/shutdown`. Differences
(SURVEY.md §7.1): the engine runs in a background *thread* of the same
process instead of a spawned mp process — the queue-based decoupling remains
(commands in, outputs posted to per-request asyncio queues via
call_soon_threadsafe), but batches are never pickled. Adds incremental
detokenization and stop-string enforcement, both absent in the reference
(`llm.py:57,80-81`, `core/common.py:14`).
"""

from __future__ import annotations

import asyncio
import queue
import threading
import uuid
from dataclasses import dataclass, field

from nanovllmx_tpu.config import EngineConfig
from nanovllmx_tpu.engine.engine import Engine
from nanovllmx_tpu.engine.sequence import EngineOutput, FinishReason, GenerateOutput
from nanovllmx_tpu.sampling_params import SamplingParams


def init_tokenizer(model_dir: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_dir)


@dataclass
class _RequestState:
    seq_id: str
    out_queue: asyncio.Queue
    detok: object  # IncrementalDetokenizer
    aborted: bool = False


class LLM:
    """Single-process async front-end.

    `LLM(model=...)` builds the whole stack (runner + engine + tokenizer).
    Pass `engine=` / `tokenizer=` explicitly to inject fakes in tests.
    """

    def __init__(self, model: str = "", config: EngineConfig | None = None,
                 engine: Engine | None = None, tokenizer=None, **config_kw):
        if config is None:
            config = EngineConfig(model=model, **config_kw)
        self.config = config
        self.tokenizer = tokenizer if tokenizer is not None else init_tokenizer(config.model)
        if engine is None:
            from nanovllmx_tpu.runner.model_runner import ModelRunner

            runner = ModelRunner(config)
            engine = Engine(
                config, runner, num_pages=runner.num_pages,
                eos_token_id=self.tokenizer.eos_token_id,
            )
        self.engine = engine

        self._requests: dict[str, _RequestState] = {}
        self._engine_error: BaseException | None = None
        self._cmds: queue.Queue = queue.Queue()
        self._loop: asyncio.AbstractEventLoop | None = None
        self._shutdown = threading.Event()
        self._ready = threading.Event()
        self._thread = threading.Thread(
            target=self._engine_loop, name="nvx-engine", daemon=True
        )
        self._thread.start()
        if config.stall_watchdog_secs > 0:
            self._watchdog = threading.Thread(
                target=self._watchdog_loop, name="nvx-watchdog", daemon=True
            )
            self._watchdog.start()

    # ------------------------------------------------------------ engine thread

    def _drain_cmds(self, block: bool) -> list:
        cmds = []
        try:
            timeout = None if block else 0.0
            while True:
                cmds.append(
                    self._cmds.get(block=timeout is None, timeout=timeout)
                )
                timeout = 0.0
        except queue.Empty:
            pass
        return cmds

    def _engine_loop(self):
        """Blocking-when-idle / drain-then-step loop (ref
        `core/engine_client.py:62-95`). All engine state is touched only from
        this thread; the asyncio side communicates via the command queue.

        Multi-host: the primary broadcasts its drained commands once per
        iteration and every follower applies the same list, keeping all
        hosts' deterministic engines in lockstep (parallel/multihost.py) —
        followers idle inside the (collective) broadcast while the primary
        blocks on an empty queue.

        A crash here must not strand awaiting generators (the reference
        SIGTERMs the whole process tree on engine death, `utils.py:58-84`;
        in-process we fail every pending request with the exception instead)."""
        mh = self.config.num_hosts > 1
        primary = True
        if mh:
            from nanovllmx_tpu.parallel import multihost

            primary = multihost.is_primary()
        self._primary = primary
        self._ready.set()
        try:
            while not self._shutdown.is_set():
                if primary:
                    busy = self.engine.has_unfinished_sequences()
                    cmds = self._drain_cmds(block=not busy)
                else:
                    cmds = None
                if mh:
                    from nanovllmx_tpu.parallel import multihost

                    cmds = multihost.broadcast_commands(cmds)
                for cmd in cmds:
                    self._apply_cmd(cmd)
                if self._shutdown.is_set():
                    break
                if self.engine.has_unfinished_sequences():
                    outputs = self.engine.step()
                    if outputs and primary:
                        self._post_outputs(outputs)
        except BaseException as e:  # noqa: BLE001 — fail pending requests
            import logging, traceback

            logging.getLogger(__name__).error(
                "engine thread crashed:\n%s", traceback.format_exc()
            )
            self._engine_error = e
            loop = self._loop
            if loop is not None and not loop.is_closed():
                loop.call_soon_threadsafe(self._fail_all_requests, e)

    def _watchdog_loop(self):
        """Stall watchdog: a silent multi-minute hang (device-sync stall on
        the axon tunnel, r2 VERDICT Weak #1) must never again be
        indistinguishable from a slow engine. If the engine is busy — or a
        warmup/compile activity is marked — and no batch retires / no
        activity tick lands for `stall_watchdog_secs`, log an ERROR with a
        full stack dump of every thread. Diagnostic only; nothing is
        killed, and the timer re-arms so a persisting stall logs once per
        interval."""
        import faulthandler
        import logging
        import sys
        import time as _time

        log = logging.getLogger(__name__)
        thresh = self.config.stall_watchdog_secs
        metrics = self.engine.metrics
        while not self._shutdown.is_set():
            _time.sleep(min(5.0, thresh / 4))
            busy = metrics.activity is not None
            if not busy:
                try:
                    busy = self.engine.has_unfinished_sequences()
                except Exception:
                    continue  # racing a shutdown; skip this tick
            if not busy:
                metrics.mark_progress()  # idle: keep the timer fresh
                continue
            stalled = _time.monotonic() - metrics.last_progress
            if stalled > thresh:
                metrics.inc("stall_warnings")
                log.error(
                    "STALL: no engine progress for %.0f s "
                    "(activity=%r, in-flight=%d); dumping all stacks",
                    stalled, metrics.activity,
                    len(getattr(self.engine, "_inflight", ())),
                )
                try:
                    faulthandler.dump_traceback(file=sys.stderr)
                except Exception:
                    pass
                metrics.mark_progress()  # re-arm: one dump per interval

    def _fail_all_requests(self, exc: BaseException):
        for state in list(self._requests.values()):
            state.out_queue.put_nowait(exc)

    def _apply_cmd(self, cmd):
        op = cmd[0]
        if op == "add":
            _, seq_id, token_ids, params = cmd
            self.engine.add_sequence(seq_id, token_ids, params)
        elif op == "abort":
            out = self.engine.abort_sequence(cmd[1])
            if out is not None:
                self._post_outputs([out])
        elif op == "stop":
            self._shutdown.set()

    def _post_outputs(self, outputs: list[EngineOutput]):
        loop = self._loop
        if loop is None or loop.is_closed():
            return
        loop.call_soon_threadsafe(self._dispatch_outputs, outputs)

    def _dispatch_outputs(self, outputs: list[EngineOutput]):
        for out in outputs:
            state = self._requests.get(out.seq_id)
            if state is not None and not state.aborted:
                state.out_queue.put_nowait(out)

    # ----------------------------------------------------------------- public

    async def ready(self):
        self._ready.wait()

    async def generate(
        self,
        prompt: str | list[int],
        params: SamplingParams | None = None,
        seq_id: str | None = None,
    ):
        """Async generator of GenerateOutput (one per emitted chunk)."""
        from nanovllmx_tpu.utils.detokenizer import IncrementalDetokenizer

        if self._engine_error is not None:
            raise RuntimeError("engine thread crashed") from self._engine_error
        params = params or SamplingParams()
        seq_id = seq_id or uuid.uuid4().hex
        if isinstance(prompt, str):
            token_ids = self.tokenizer.encode(prompt)
        else:
            token_ids = list(prompt)

        self._loop = asyncio.get_running_loop()
        state = _RequestState(
            seq_id=seq_id,
            out_queue=asyncio.Queue(),
            detok=IncrementalDetokenizer(self.tokenizer, params.stop),
        )
        self._requests[seq_id] = state
        self._cmds.put(("add", seq_id, token_ids, params))
        import time as _time

        t_submit = _time.perf_counter()
        first = True
        try:
            while True:
                out: EngineOutput = await state.out_queue.get()
                if isinstance(out, BaseException):
                    raise RuntimeError("engine thread crashed") from out
                if first:
                    first = False
                    self.engine.metrics.observe_ttft(
                        _time.perf_counter() - t_submit
                    )
                text, hit_stop = state.detok.add_tokens(out.new_token_ids)
                if out.finished and not hit_stop:
                    text += state.detok.flush()  # release held-back tail
                if hit_stop:
                    # stop string matched (possibly in the same chunk that
                    # also hit a length cap): stop wins, stream ends here
                    if not out.finished:
                        self._cmds.put(("abort", seq_id))
                        state.aborted = True
                    yield GenerateOutput(
                        seq_id=seq_id, token_ids=out.new_token_ids, text=text,
                        finished=True, finish_reason="stop",
                        num_prompt_tokens=out.num_prompt_tokens,
                        num_generated_tokens=out.num_generated_tokens,
                    )
                    return
                yield GenerateOutput(
                    seq_id=seq_id, token_ids=out.new_token_ids, text=text,
                    finished=out.finished,
                    finish_reason=(
                        out.finish_reason.value if out.finish_reason else None
                    ),
                    num_prompt_tokens=out.num_prompt_tokens,
                    num_generated_tokens=out.num_generated_tokens,
                )
                if out.finished:
                    return
        except asyncio.CancelledError:
            # client disconnected (ref `llm.py:120-122`)
            self._cmds.put(("abort", seq_id))
            state.aborted = True
            raise
        finally:
            self._requests.pop(seq_id, None)

    async def generate_full(self, prompt, params=None, seq_id=None) -> GenerateOutput:
        """Collect a whole generation (ref `_generate_full`,
        `serving_engine.py:22-35`)."""
        token_ids: list[int] = []
        text_parts: list[str] = []
        last = None
        async for out in self.generate(prompt, params, seq_id):
            token_ids.extend(out.token_ids)
            text_parts.append(out.text)
            last = out
        assert last is not None
        return GenerateOutput(
            seq_id=last.seq_id, token_ids=token_ids, text="".join(text_parts),
            finished=True, finish_reason=last.finish_reason,
            num_prompt_tokens=last.num_prompt_tokens,
            num_generated_tokens=last.num_generated_tokens,
        )

    def abort(self, seq_id: str):
        state = self._requests.get(seq_id)
        if state is not None:
            state.aborted = True
        self._cmds.put(("abort", seq_id))

    def shutdown(self):
        self._cmds.put(("stop",))
        self._thread.join(timeout=10)
