"""Trace-time hardware-target resolution for kernel dispatch.

Pallas-vs-XLA kernel choice happens at TRACE time, but
``jax.default_backend()`` reflects the PROCESS backend — wrong for AOT
compiles that lower for a TPU topology from a CPU host
(benchmarks/aot_fullscale.py lowers the 1M recipes against
jax.experimental.topologies without a pod; with the process backend on
cpu, "auto" silently compiled the XLA einsum attention into the
artifact — a 32 GB [32K, 32K] score temp at 72B). ``LVT_TARGET=tpu|cpu``
pins the target explicitly; unset, the process backend decides.
"""
import os

import jax


def target_is_tpu() -> bool:
    t = os.environ.get("LVT_TARGET")
    if t:
        return t.lower() == "tpu"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
