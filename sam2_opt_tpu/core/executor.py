"""Executor layer: the TPU-native replacement for `ytools` (SURVEY.md §2.2).

The reference's runtime backends (ytools.onnxruntime.OnnxRuntimeExecutor,
ytools.tensorrt.TensorRTExecutor) are replaced by jit-compiled XLA executables:

- engine build + disk cache  ->  jax.jit + the JAX persistent compilation cache
- TRT optimization profiles  ->  per-shape compiled executables (XLA compiles
  one executable per input signature; warmup pre-populates hot shapes)
- Inference/warmup/Release   ->  the same protocol here, so `speedup()` /
  `set_runtime_backend()` keep the reference's call-site shape.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Protocol, Sequence

import jax
import jax.numpy as jnp

_CACHE_INITIALIZED = False


def enable_persistent_cache(cache_dir: Optional[str] = None) -> None:
    """Enable the JAX persistent compilation cache (the XLA analogue of the
    reference's TRT `use_cache=True` engine caching)."""
    global _CACHE_INITIALIZED
    if _CACHE_INITIALIZED:
        return
    cache_dir = cache_dir or os.environ.get(
        "SAM2_TPU_CACHE_DIR", os.path.expanduser("~/.cache/sam2_opt_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    _CACHE_INITIALIZED = True


class LRUCache:
    """Bounded dict for compiled executables. Long-lived servers (serve/)
    accumulate per-shape jitted fns keyed by video resolution / mask shape;
    without eviction that leaks compiled executables. Default capacity via
    SAM2_TPU_JIT_CACHE_SIZE (128)."""

    def __init__(self, maxsize: Optional[int] = None):
        from collections import OrderedDict

        if maxsize is None:
            maxsize = int(os.environ.get("SAM2_TPU_JIT_CACHE_SIZE", "128"))
        self.maxsize = max(int(maxsize), 1)
        self._d = OrderedDict()

    def get(self, key, default=None):
        try:
            self._d.move_to_end(key)
            return self._d[key]
        except KeyError:
            return default

    def __getitem__(self, key):
        self._d.move_to_end(key)
        return self._d[key]

    def __setitem__(self, key, value):
        if key in self._d:
            self._d.move_to_end(key)
        self._d[key] = value
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def __contains__(self, key):
        return key in self._d

    def __len__(self):
        return len(self._d)

    def clear(self):
        self._d.clear()


class Executor(Protocol):
    """Protocol mirroring ytools.executor.ModelExectuor (sic) — SURVEY.md §2.2."""

    def Inference(self, inputs: List[Any], output_type: str = "jax") -> List[Any]: ...

    def warmup(self, inputs: List[Any]) -> None: ...

    def Release(self) -> None: ...

    def GetModelInputDesc(self) -> list: ...


class JitExecutor:
    """Wraps a pure function into the Executor protocol.

    `fn(*inputs) -> tuple` is jit-compiled; each distinct input signature gets
    its own cached executable (the XLA replacement for TRT profiles).
    """

    def __init__(self, fn: Callable, name: str = "jit", static_argnums=()):
        enable_persistent_cache()
        self._name = name
        self._fn = jax.jit(fn, static_argnums=static_argnums)

    def Inference(self, inputs: List[Any], output_type: str = "jax") -> List[Any]:
        outs = self._fn(*inputs)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        if output_type == "numpy":
            import numpy as np

            return [np.asarray(o) for o in outs]
        return list(outs)

    def warmup(self, inputs: List[Any]) -> None:
        outs = self._fn(*inputs)
        jax.block_until_ready(outs)

    def Release(self) -> None:
        # XLA executables are managed by JAX's cache; nothing to free eagerly.
        pass

    def GetModelInputDesc(self) -> list:
        return []
