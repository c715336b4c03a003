"""Profiling / observability.

The reference's entire observability stack is a wall-clock ``Walnut::Timer``
/ ``ScopedTimer`` (``Walnut/Timer.h:9-49``), FPS/ms ImGui text (every
``mainloop.cpp``), and a chrono print in the offline driver
(``main.cpp:222-228``).  Ours: the same ergonomic timers (device-sync aware),
rays/s accounting, structured JSON-lines run logs, and a thin wrapper over
``jax.profiler`` for real traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Optional

import jax


class Timer:
    """ns-resolution wall timer (``Walnut/Timer.h:9-33``); ``elapsed_ms``
    blocks on ``sync`` pytrees first so device work is included."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter_ns()

    def elapsed_ms(self, sync: Any = None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        return (time.perf_counter_ns() - self._t0) / 1e6


@contextlib.contextmanager
def scoped_timer(name: str, log=None):
    """RAII-style print timer (``Walnut/Timer.h:36-49`` prints
    "[TIMER] name - ms")."""
    t = Timer()
    try:
        yield t
    finally:
        ms = t.elapsed_ms()
        msg = f"[TIMER] {name} - {ms:.3f}ms"
        (log or print)(msg)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace for a region (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def rays_per_second(n_rays: int, seconds: float) -> float:
    return n_rays / max(seconds, 1e-12)


class RunLog:
    """Structured JSON-lines run log (config, per-pass ms, rays/s, checks) —
    the framework's replacement for the reference's stdout prints."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f = open(path, "a") if path else None

    def emit(self, event: str, **fields) -> None:
        rec = {"event": event, "t": time.time(), **fields}
        line = json.dumps(rec, default=_jsonable)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        else:
            print(line)

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None


def _jsonable(x):
    try:
        import numpy as np
        if isinstance(x, (np.generic,)):
            return x.item()
        if isinstance(x, np.ndarray):
            return x.tolist()
    except Exception:
        pass
    return str(x)
