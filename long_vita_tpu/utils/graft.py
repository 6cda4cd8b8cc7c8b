"""Graft a base LLM + vision tower into a fresh Long-VITA model.

Reference semantics (tools/finetune_long_vita.py:480-530): stage-1 starts
from a stock Qwen2.5-Instruct checkpoint and a stock InternViT-300M
checkpoint — the vision tower is grafted on, the projector is freshly
initialized, and the embedding table is resized for the 17 multimodal
tokens (vocab 152064 already has headroom, so resizing is a no-op for the
released geometry).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig, TextConfig, VisionConfig
from long_vita_tpu.models.projector import init_projector_params
from long_vita_tpu.utils.checkpoint_io import (
    SafetensorsIndex,
    load_text_params,
    load_vision_params,
)

Params = dict[str, Any]


def graft_checkpoints(
    llm_dir: str,
    vit_dir: str,
    *,
    dtype=jnp.bfloat16,
    seed: int = 0,
) -> tuple[Params, LongVITAConfig]:
    """-> (params, cfg) for a fresh Long-VITA from stock checkpoints.

    llm_dir: HF Qwen2-family checkpoint (config.json + safetensors).
    vit_dir: HF InternViT checkpoint (InternVisionModel naming, i.e. keys
             like `embeddings.*` / `encoder.layers.*` without the grafted
             `model.vision_model.` prefix).
    """
    with open(os.path.join(llm_dir, "config.json")) as f:
        llm_cfg = json.load(f)
    with open(os.path.join(vit_dir, "config.json")) as f:
        vit_cfg = json.load(f)

    text_fields = {f.name for f in TextConfig.__dataclass_fields__.values()}
    vis_fields = {f.name for f in VisionConfig.__dataclass_fields__.values()}
    vision = VisionConfig(
        **{k: v for k, v in vit_cfg.items() if k in vis_fields}
    )
    downsample = 0.5
    cfg = LongVITAConfig(
        text=TextConfig(**{k: v for k, v in llm_cfg.items() if k in text_fields}),
        vision=vision,
        vision_downsample_ratio=downsample,
        image_token_length=int((vision.grid * downsample) ** 2),
    )

    llm_idx = SafetensorsIndex(llm_dir)
    params: Params = {"text": load_text_params(llm_idx, cfg, dtype)}
    llm_idx.close()

    vit_idx = SafetensorsIndex(vit_dir)
    # stock InternViT checkpoints have no grafted prefix
    prefix = (
        "model.vision_model."
        if any(k.startswith("model.vision_model.") for k in vit_idx.keys())
        else ""
    )
    params["vision"] = load_vision_params(vit_idx, cfg, dtype, prefix=prefix)
    vit_idx.close()

    params["projector"] = init_projector_params(
        jax.random.PRNGKey(seed), cfg, dtype
    )
    return params, cfg
