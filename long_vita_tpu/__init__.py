"""long-vita-tpu: TPU-native Long-VITA framework (JAX/XLA/Pallas).

Quick API:
    from long_vita_tpu import (
        LongVITAConfig, load_checkpoint, build_engine, SamplingParams,
    )
    engine = build_engine("/path/to/Long-VITA-16K_HF")
    out = engine.generate([{"role": "user", "content": "<image>\\nWhat?"}],
                          images=["photo.jpg"])
"""
__version__ = "0.1.0"

from long_vita_tpu.config import LongVITAConfig, TextConfig, VisionConfig


def load_checkpoint(path, **kw):
    from long_vita_tpu.utils.checkpoint_io import load_long_vita_checkpoint

    return load_long_vita_checkpoint(path, **kw)


def build_engine(path, **kw):
    from long_vita_tpu.inference.cli import build_engine as _build

    return _build(path, **kw)


def __getattr__(name):
    if name == "SamplingParams":
        from long_vita_tpu.inference.sampler import SamplingParams

        return SamplingParams
    if name == "InferenceEngine":
        from long_vita_tpu.inference.engine import InferenceEngine

        return InferenceEngine
    raise AttributeError(name)
