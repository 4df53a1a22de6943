"""Profiling / tracing utilities.

The reference ships none (SURVEY.md §5: wall_clock_breakdown off, no tracing).
Built here because the north-star metric is queries/sec/chip:
  - `trace(logdir)`: jax.profiler trace context (view in TensorBoard/XProf/Perfetto),
  - `annotate(name)`: named trace region,
  - `PhaseTimer`: host-side per-phase wall timers with real device sync
    (host readback — `block_until_ready` does not synchronize on the axon
    tunnel backend in this environment),
  - `decode_stats`: prefill/decode split from two generation lengths.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def sync(tree) -> None:
    """Force completion of a device computation by reading back one leaf."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


class PhaseTimer:
    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, result_holder=None):
        t0 = time.perf_counter()
        yield
        if result_holder is not None:
            sync(result_holder)
        self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {k: float(np.median(v)) for k, v in self.times.items()}


def decode_stats(run_fn, n_short: int, n_long: int, batch: int) -> Dict[str, float]:
    """run_fn(n_new) -> wall seconds (synced). Returns prefill/decode split."""
    t_s = run_fn(n_short)
    t_l = run_fn(n_long)
    step = (t_l - t_s) / max(n_long - n_short, 1)
    return {
        "decode_step_s": step,
        "decode_tokens_per_s": batch / step if step > 0 else float("inf"),
        "prefill_s": max(t_s - n_short * step, 0.0),
    }
