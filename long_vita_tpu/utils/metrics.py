"""Metrics logging + profiling hooks.

Replaces the reference's tensorboardX logging and torch profiler flag group
(--profile-ranks/-level/..., arguments.py:121-134; --log-throughput): a
JSONL metrics stream any dashboard can tail, plus jax.profiler traces
viewable in XProf/TensorBoard.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax


class MetricsLogger:
    """Append-only JSONL metrics (one object per step)."""

    def __init__(self, output_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, **values):
        rec = {"step": step, "wall_s": round(time.time() - self._t0, 3)}
        rec.update({
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in values.items()
        })
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()


class Profiler:
    """jax.profiler trace over a step window (start <= step < stop)."""

    def __init__(self, output_dir: str, start_step: int, stop_step: int):
        self.output_dir = output_dir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def step(self, step: int):
        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.output_dir)
            self._active = True
        elif step == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def mfu(
    tokens_per_second: float,
    num_params: float,
    peak_flops: float,
    seq_len: Optional[int] = None,
    attn_flops_per_token: float = 0.0,
) -> float:
    """Model FLOPs utilization for a training step (6ND + attention)."""
    flops_per_token = 6.0 * num_params + attn_flops_per_token
    return tokens_per_second * flops_per_token / peak_flops
