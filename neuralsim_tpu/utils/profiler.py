"""Profiling: named scopes + frame profiler + rays/s counters.

TPU-native equivalent of ``nr3d_lib.profile`` (reference: @profile decorator
+ Profiler(warmup_frames, record_frames, then=cb) collecting per-range
device_duration — SURVEY.md §5 tracing row; usage train.py:1433-1438).
On TPU, fine-grained in-graph ranges come from ``jax.named_scope`` (visible
in XLA profiles); wall-clock section timing uses ``block_until_ready``
boundaries; full traces via ``jax.profiler.trace``.
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Optional

import jax


class Profiler:
    """Section timer with warmup + record windows, then a report callback."""

    def __init__(self, warmup_frames: int = 10, record_frames: int = 100,
                 then: Optional[Callable[[Dict], Any]] = None):
        self.warmup = warmup_frames
        self.record = record_frames
        self.then = then
        self.frame = 0
        self.times: Dict[str, list] = defaultdict(list)
        self.enabled = True

    @contextlib.contextmanager
    def range(self, name: str, sync: Any = None):
        """Time a section; pass a jax array as ``sync`` to block on it so the
        measurement includes device time (the device_duration analog)."""
        active = self.enabled and self.frame >= self.warmup
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        if sync is not None:
            jax.block_until_ready(sync)
        if active:
            self.times[name].append(time.perf_counter() - t0)

    def step(self):
        self.frame += 1
        if self.frame == self.warmup + self.record:
            report = self.report()
            if self.then:
                self.then(report)
            return report
        return None

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in sorted(self.times.items(),
                               key=lambda kv: -sum(kv[1])):
            n = len(ts)
            out[name] = {"mean_ms": sum(ts) / max(n, 1) * 1e3,
                         "total_s": sum(ts), "count": n}
        return out


def profile(fn=None, *, name: Optional[str] = None, profiler: Optional[Profiler] = None):
    """Decorator adding a named_scope (and optional Profiler range) around a
    function — the ``@profile`` analog."""
    def deco(f):
        scope = name or f.__qualname__

        @functools.wraps(f)
        def wrapped(*a, **kw):
            if profiler is not None:
                with profiler.range(scope):
                    return f(*a, **kw)
            with jax.named_scope(scope):
                return f(*a, **kw)
        return wrapped
    return deco(fn) if fn is not None else deco


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a full XLA profile (open with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class RaysPerSecond:
    """Rolling rays/s counter (the bench north-star metric inline)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.samples: list = []

    def update(self, n_rays: int, seconds: float):
        self.samples.append((n_rays, seconds))
        if len(self.samples) > self.window:
            self.samples.pop(0)

    @property
    def value(self) -> float:
        if not self.samples:
            return 0.0
        r = sum(n for n, _ in self.samples)
        t = sum(s for _, s in self.samples)
        return r / max(t, 1e-9)
