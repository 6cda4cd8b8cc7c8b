"""Kernel-dispatch target resolution (ops/_target.py).

Trace-time Pallas-vs-XLA choice must be overridable for AOT compiles
that lower for a TPU topology from a CPU host — keyed on LVT_TARGET,
falling back to the process backend (the round-3 finding: without the
override, aot_fullscale.py silently baked XLA einsum attention into TPU
artifacts)."""
import os

from long_vita_tpu.ops._target import target_is_tpu


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("LVT_TARGET", "tpu")
    assert target_is_tpu() is True
    monkeypatch.setenv("LVT_TARGET", "TPU")
    assert target_is_tpu() is True
    monkeypatch.setenv("LVT_TARGET", "cpu")
    assert target_is_tpu() is False


def test_default_is_process_backend(monkeypatch):
    monkeypatch.delenv("LVT_TARGET", raising=False)
    # the test harness forces the cpu backend (conftest.py)
    assert target_is_tpu() is False


def test_dispatch_sites_route_through_target(monkeypatch):
    """The four dispatch sites must consult the override (a raw
    jax.default_backend() check would silently reintroduce the bug)."""
    import jax.numpy as jnp
    import numpy as np

    from long_vita_tpu.ops.attention import _on_tpu, _pick_impl
    from long_vita_tpu.ops.attention_pair import _use_pallas
    from long_vita_tpu.ops.flash_attention import _interpret

    monkeypatch.setenv("LVT_TARGET", "tpu")
    assert _on_tpu() and _use_pallas() and not _interpret()
    q = jnp.zeros((1, 256, 2, 16))
    assert _pick_impl(q, q, True, None) == "flash"
    monkeypatch.setenv("LVT_TARGET", "cpu")
    assert not _on_tpu() and not _use_pallas() and _interpret()
    assert _pick_impl(q, q, True, None) == "xla"
