"""Engine metrics / observability.

The reference has no metrics at all — `print()` statements and a README TODO
("Benchmark Metrics", SURVEY.md §5). This module gives the engine a
lightweight, thread-safe counter/timing registry surfaced through the
server's /metrics endpoint (JSON and Prometheus text formats).
"""

from __future__ import annotations

import threading
import time
from collections import deque


class Metrics:
    def __init__(self, window: int = 512):
        self._lock = threading.Lock()
        self.counters: dict[str, int] = {
            "requests_started": 0,
            "requests_finished": 0,
            "requests_aborted": 0,
            "prompt_tokens": 0,
            "generated_tokens": 0,
            "prefix_cache_hit_tokens": 0,
            "preemptions": 0,
            "engine_steps": 0,
            "decode_steps": 0,
            "prefill_steps": 0,
        }
        self._ttft = deque(maxlen=window)      # seconds
        self._step_time = deque(maxlen=window)  # seconds per engine step
        self.totals: dict[str, float] = {}      # summed wall time by phase
        self._start = time.time()
        # per-batch timeline for offline analysis (bench --step-log):
        # (event, t0, t1, mode, nseqs, ntokens) tuples, host perf_counter
        self.step_log: deque = deque(maxlen=65536)
        # stall-watchdog state: last time the engine made observable forward
        # progress (batch retired / compile finished), and the name of any
        # long-running host-side activity (e.g. "warmup") that arms the
        # watchdog even while the engine queue is idle
        self.last_progress: float = time.monotonic()
        self.activity: str | None = None

    def mark_progress(self) -> None:
        self.last_progress = time.monotonic()

    def set_activity(self, name: str | None) -> None:
        self.activity = name
        self.last_progress = time.monotonic()

    def inc(self, name: str, n: int = 1) -> None:
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + n

    def observe_ttft(self, seconds: float) -> None:
        with self._lock:
            self._ttft.append(seconds)

    def observe_step(self, seconds: float) -> None:
        with self._lock:
            self._step_time.append(seconds)

    def add_time(self, name: str, seconds: float) -> None:
        with self._lock:
            self.totals[name] = self.totals.get(name, 0.0) + seconds

    @staticmethod
    def _pct(values: list[float], q: float) -> float:
        if not values:
            return 0.0
        vs = sorted(values)
        return vs[min(len(vs) - 1, int(len(vs) * q))]

    def snapshot(self) -> dict:
        with self._lock:
            ttft = list(self._ttft)
            steps = list(self._step_time)
            counters = dict(self.counters)
        uptime = time.time() - self._start
        with self._lock:
            totals = {f"time_{k}_s": round(v, 2) for k, v in self.totals.items()}
        return {
            **counters,
            **totals,
            "uptime_s": round(uptime, 1),
            "tokens_per_s": round(counters["generated_tokens"] / uptime, 2)
            if uptime > 0 else 0.0,
            "ttft_p50_ms": round(1e3 * self._pct(ttft, 0.50), 1),
            "ttft_p99_ms": round(1e3 * self._pct(ttft, 0.99), 1),
            "step_time_p50_ms": round(1e3 * self._pct(steps, 0.50), 2),
            "step_time_p99_ms": round(1e3 * self._pct(steps, 0.99), 2),
        }

    def prometheus(self) -> str:
        snap = self.snapshot()
        lines = []
        for k, v in snap.items():
            lines.append(f"nvx_{k} {v}")
        return "\n".join(lines) + "\n"
