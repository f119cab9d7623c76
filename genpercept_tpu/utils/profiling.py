"""Profiling & tracing — greenfield vs the reference (SURVEY §5: the
reference has no profiler hooks at all). Thin wrappers over jax.profiler:

  with trace("unet_fwd"): ...          # named trace annotation
  start_server(9999)                   # live tensorboard profiling endpoint
  with capture("/tmp/trace"): ...      # write a perfetto/tensorboard trace
  t = Timer(); ... ; t.lap("encode")   # host-side phase timers (JSONL-able)
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator form of trace()."""

    def deco(fn):
        def wrapped(*a, **kw):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **kw)

        return wrapped

    return deco


class Timer:
    """Host-side phase timer. NOTE: on the axon-tunneled TPU, device work is
    async — call jax.block_until_ready (or fetch a scalar) before lap() if
    you want device time included."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self.laps: Dict[str, float] = {}

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self.laps[name] = self.laps.get(name, 0.0) + dt
        self._t0 = now
        return dt

    def reset(self):
        self._t0 = time.perf_counter()
