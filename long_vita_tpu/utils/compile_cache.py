"""Persistent XLA compilation cache.

Long-context programs compile for minutes (remote-compiled axon chips even
more); caching executables on disk makes repeat runs of bench/serve/train
start in seconds.
"""
from __future__ import annotations

import os

import jax

_DEFAULT = os.path.expanduser("~/.cache/long_vita_tpu/jax")


def enable(cache_dir: str = _DEFAULT, min_compile_secs: float = 1.0) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
