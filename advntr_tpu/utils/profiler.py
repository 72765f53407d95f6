"""Stage timing: the reference logs wall time per stage via a decorator
(advntr/profiler.py:5-13).  Here the same decorator also aggregates stage
totals for the run summary, and an optional jax.profiler trace can wrap a
whole run."""

from __future__ import annotations

import contextlib
import functools
import logging
import time
from collections import defaultdict

STAGE_TOTALS: dict[str, float] = defaultdict(float)
STAGE_COUNTS: dict[str, int] = defaultdict(int)


def time_usage(func):
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        beg = time.time()
        result = func(*args, **kwargs)
        elapsed = time.time() - beg
        STAGE_TOTALS[func.__name__] += elapsed
        STAGE_COUNTS[func.__name__] += 1
        logging.debug("%s executed in %.4fs", func.__name__, elapsed)
        return result
    return wrapper


def stage_summary() -> str:
    lines = ["stage timing:"]
    for name, total in sorted(STAGE_TOTALS.items(), key=lambda kv: -kv[1]):
        lines.append(f"  {name}: {total:.3f}s over {STAGE_COUNTS[name]} calls")
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Optionally capture a jax.profiler trace around a block."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
