"""Profiling helpers (reference: libavutil/timer.h:62-87
START_TIMER/STOP_TIMER cycle-count histogram macros; TPU equivalent adds
jax device-time capture and the jax profiler trace hook — SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

_STATS: Dict[str, list] = defaultdict(lambda: [0, 0.0, float("inf"), 0.0])


@contextlib.contextmanager
def timer(name: str, sync=None):
    """with timer('idct'): ...   — accumulates count/total/min/max.
    Pass sync=array to block on a jax array before stopping the clock
    (device work is async; without a sync you time dispatch only)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        s = _STATS[name]
        s[0] += 1
        s[1] += dt
        s[2] = min(s[2], dt)
        s[3] = max(s[3], dt)


def report(out=None) -> str:
    """STOP_TIMER-style summary."""
    lines = []
    for name, (n, total, mn, mx) in sorted(_STATS.items()):
        if n == 0:
            continue
        lines.append(f"{total / n * 1e6:10.1f} us avg in {name} "
                     f"(n={n}, min={mn * 1e6:.1f}, max={mx * 1e6:.1f})")
    text = "\n".join(lines)
    if out is not None:
        out.write(text + "\n")
    return text


def reset():
    _STATS.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax profiler trace (xplane) around a region — the structured
    tracing the reference lacks (timer.h is ad hoc)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
