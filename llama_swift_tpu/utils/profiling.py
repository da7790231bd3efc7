"""Profiling / introspection — the observability the reference stubs out.

SURVEY.md §5.1: ggml has per-node perf counters behind a compile flag
(``GGML_PERF``, ``ggml.c:9514-9554``), `ggml_graph_print` (per-op timing
table, ``:9567-9607``) and `ggml_graph_dump_dot` (Graphviz export,
``:9635-9750``) — and the engine never reports any of it.  TPU equivalents,
actually wired up:

* :func:`trace` — capture a Perfetto/TensorBoard trace of a region
  (``jax.profiler``): the per-kernel timeline replaces per-node counters.
* :func:`graph_summary` — compile a jitted function and report XLA cost
  analysis (flops/bytes/memory) — the `ggml_graph_print` analogue.
* :func:`dump_hlo` — optimized HLO text — the `ggml_graph_dump_dot`
  analogue (compiler-level graph instead of op-DAG dot).
* :class:`StepTimer` — host-side tokens/s + TTFT accounting for the serving
  loop (counters the reference accumulates but never prints,
  ``LlamaPredictOperation.mm:778-871``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _lower(fn, *args, **kwargs):
    if hasattr(fn, "lower"):
        return fn.lower(*args, **kwargs)
    return jax.jit(fn).lower(*args, **kwargs)


def graph_summary(fn, *args, **kwargs) -> dict:
    """Compile ``fn(*args)`` and return XLA cost analysis
    (flops, bytes accessed, peak memory when available)."""
    compiled = _lower(fn, *args, **kwargs).compile()
    out: dict[str, Any] = {}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        out.update({k: v for k, v in dict(cost).items()})
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        for attr in (
            "temp_size_in_bytes", "argument_size_in_bytes",
            "output_size_in_bytes", "generated_code_size_in_bytes",
        ):
            if hasattr(mem, attr):
                out[attr] = getattr(mem, attr)
    except Exception:
        pass
    return out


def dump_hlo(fn, *args, optimized: bool = True, **kwargs) -> str:
    """Return the (optimized) HLO text for ``fn(*args)``."""
    lowered = _lower(fn, *args, **kwargs)
    if optimized:
        try:
            return lowered.compile().as_text()
        except Exception:
            pass
    return lowered.as_text()


class StepTimer:
    """tokens/s + TTFT accounting for a generation run."""

    def __init__(self):
        self.t_start: Optional[float] = None
        self.t_first_token: Optional[float] = None
        self.t_last: Optional[float] = None
        self.decode_tokens = 0

    def start(self):
        self.t_start = time.perf_counter()
        return self

    def first_token(self):
        if self.t_first_token is None:
            self.t_first_token = time.perf_counter()

    def tick(self, n: int = 1):
        self.first_token()
        self.decode_tokens += n
        self.t_last = time.perf_counter()

    @property
    def ttft_s(self) -> Optional[float]:
        if self.t_start is None or self.t_first_token is None:
            return None
        return self.t_first_token - self.t_start

    @property
    def decode_tok_per_s(self) -> Optional[float]:
        if self.t_first_token is None or self.t_last is None:
            return None
        dt = self.t_last - self.t_first_token
        if dt <= 0 or self.decode_tokens <= 1:
            return None
        return (self.decode_tokens - 1) / dt

    def summary(self) -> dict:
        return {
            "ttft_s": self.ttft_s,
            "decode_tok_per_s": self.decode_tok_per_s,
            "decode_tokens": self.decode_tokens,
        }
