"""Profiling/timing utilities.

TPU equivalents of the reference's tracing hooks (SURVEY.md §5):
- `timed` decorator = ytools.bench.test_torch_cuda_time (cuda-sync timing,
  sam2_base_dam4sam.py usage) with block_until_ready;
- `trace` context = jax.profiler trace capture;
- `Timer`/`fps_benchmark` = the wall-clock FPS harness (sam2/benchmark.py:72-92).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict, List, Optional


def timed(label: Optional[str] = None, sync: bool = True):
    """Decorator that times a function, synchronizing device work first
    (the test_torch_cuda_time equivalent). Collects stats on the function
    object (`fn.timings`)."""

    def deco(fn: Callable):
        timings: List[float] = []

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            if sync:
                import jax

                try:
                    jax.block_until_ready(out)
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            timings.append(dt)
            name = label or fn.__name__
            print(f"[timed] {name}: {dt*1000:.2f} ms "
                  f"(avg {sum(timings)/len(timings)*1000:.2f} ms over "
                  f"{len(timings)})")
            return out

        wrapper.timings = timings
        return wrapper

    return deco


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sam2_tpu_trace"):
    """jax.profiler trace capture (view with tensorboard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating section timer."""

    def __init__(self):
        self.sections: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        yield
        self.sections[name] = self.sections.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    def summary(self) -> str:
        total = sum(self.sections.values())
        lines = [f"total {total:.3f}s"]
        for k, v in sorted(self.sections.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k}: {v:.3f}s ({100*v/max(total,1e-9):.0f}%)")
        return "\n".join(lines)


def fps_benchmark(step_fn: Callable[[], object], warmup: int = 3,
                  iters: int = 20) -> float:
    """Wall-clock FPS of a repeated step (reference sam2/benchmark.py:72-92).
    On relay-attached TPUs prefer bench.py's in-graph loop methodology."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(step_fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step_fn()
    jax.block_until_ready(out)
    return iters / (time.perf_counter() - t0)
