"""HF checkpoint loaders for the alternative vision towers.

The reference converts stock checkpoints into mcore shards with
ckpt_converter_clip.py / ckpt_converter_siglip.py (long_vita_modellink/);
both consume standard HF `CLIPVisionModel` / `SiglipVisionModel` naming
(`vision_model.embeddings.*`, `.self_attn.{q,k,v}_proj`, ...). We load the
same HF files directly into the `models/generic_vit.py` pytree — no
intermediate format. Matching the converters' behavior:

  - CLIP: ln_pre kept, ln_post + visual.proj dropped
    (ckpt_converter_clip.py:39,59-62)
  - SigLIP: post_layernorm + attention-pool head + text tower dropped
    (ckpt_converter_siglip.py:80-88)
  - EVA: the reference ships eva_vit_model.py but no loader (the script
    points at a `--loader eva_sat` module that is not in the tree), so
    there is no checkpoint format to be compatible with; init randomly via
    `init_generic_vit_params(eva_4b(...))`.

The q|k|v concat order matches generic_vit's `qkv.reshape(b, s, 3, nh, d)`
split, and the patch-conv weight reorders (out,3,p,p) -> ((p,p,3), out) for
the patchify GEMM — same convention as checkpoint_io.load_vision_params.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from long_vita_tpu.models.generic_vit import GenericViTConfig
from long_vita_tpu.utils.checkpoint_io import SafetensorsIndex, _as_jnp

Params = dict[str, Any]


def _conv_to_patchify(w: np.ndarray) -> np.ndarray:
    """(out, 3, p, p) conv weight -> (p*p*3, out) patchify-GEMM kernel."""
    return w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])


def _encoder_layers(idx, cfg, dtype, prefix, qkv_fused=False):
    """Stack HF encoder layers into the [L, ...] scan pytree."""
    l = cfg.num_hidden_layers

    def stack(fmt, transpose=False):
        arrs = [idx.get(fmt.format(i=i)) for i in range(l)]
        if transpose:
            arrs = [a.T for a in arrs]
        return _as_jnp(np.stack(arrs), dtype)

    def stack_qkv(kind):  # kind: "weight" | "bias"
        rows = []
        for i in range(l):
            parts = [
                idx.get(f"{prefix}encoder.layers.{i}.self_attn.{p}_proj.{kind}")
                for p in ("q", "k", "v")
            ]
            cat = np.concatenate(parts, axis=0)  # [3h, h] or [3h]
            rows.append(cat.T if kind == "weight" else cat)
        return _as_jnp(np.stack(rows), dtype)

    p = prefix + "encoder.layers.{i}."
    return {
        "norm1": {"scale": stack(p + "layer_norm1.weight"),
                  "bias": stack(p + "layer_norm1.bias")},
        "norm2": {"scale": stack(p + "layer_norm2.weight"),
                  "bias": stack(p + "layer_norm2.bias")},
        "qkv": {"kernel": stack_qkv("weight"), "bias": stack_qkv("bias")},
        "proj": {"kernel": stack(p + "self_attn.out_proj.weight", True),
                 "bias": stack(p + "self_attn.out_proj.bias")},
        "fc1": {"kernel": stack(p + "mlp.fc1.weight", True),
                "bias": stack(p + "mlp.fc1.bias")},
        "fc2": {"kernel": stack(p + "mlp.fc2.weight", True),
                "bias": stack(p + "mlp.fc2.bias")},
    }


def load_clip_vit_params(
    path: str, cfg: GenericViTConfig, dtype=jnp.bfloat16
) -> Params:
    """HF CLIPVisionModel checkpoint dir -> generic_vit pytree.

    Expects `pre_layernorm=True, final_layernorm=False` (ln_post is
    intentionally dropped, like the reference converter)."""
    idx = SafetensorsIndex(path)
    pre = (
        "vision_model."
        if any(k.startswith("vision_model.") for k in idx.keys())
        else ""
    )
    conv = idx.get(pre + "embeddings.patch_embedding.weight")
    params: Params = {
        "patch_embed": {
            "kernel": _as_jnp(_conv_to_patchify(conv), dtype),
            # OpenAI CLIP's patch conv has no bias
            "bias": jnp.zeros((cfg.hidden_size,), dtype),
        },
        "cls_token": _as_jnp(
            idx.get(pre + "embeddings.class_embedding").reshape(
                1, 1, cfg.hidden_size
            ),
            dtype,
        ),
        "pos_embed": _as_jnp(
            idx.get(pre + "embeddings.position_embedding.weight"), dtype
        ),
        # HF spells it "pre_layrnorm" (sic)
        "pre_norm": {
            "scale": _as_jnp(idx.get(pre + "pre_layrnorm.weight"), dtype),
            "bias": _as_jnp(idx.get(pre + "pre_layrnorm.bias"), dtype),
        },
        "layers": _encoder_layers(idx, cfg, dtype, pre),
    }
    idx.close()
    return params


def load_siglip_vit_params(
    path: str, cfg: GenericViTConfig, dtype=jnp.bfloat16
) -> Params:
    """HF SiglipVisionModel checkpoint dir -> generic_vit pytree.

    No CLS token; post_layernorm/head/text tower ignored."""
    idx = SafetensorsIndex(path)
    pre = (
        "vision_model."
        if any(k.startswith("vision_model.") for k in idx.keys())
        else ""
    )
    conv = idx.get(pre + "embeddings.patch_embedding.weight")
    params: Params = {
        "patch_embed": {
            "kernel": _as_jnp(_conv_to_patchify(conv), dtype),
            "bias": _as_jnp(
                idx.get(pre + "embeddings.patch_embedding.bias"), dtype
            ),
        },
        "pos_embed": _as_jnp(
            idx.get(pre + "embeddings.position_embedding.weight"), dtype
        ),
        "layers": _encoder_layers(idx, cfg, dtype, pre),
    }
    idx.close()
    return params


def vit_config_from_hf(path: str, family: str) -> GenericViTConfig:
    """Build a GenericViTConfig from an HF config.json.

    family: "clip" | "siglip". Handles both plain vision configs and
    two-tower configs with a `vision_config` sub-dict."""
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    hf = hf.get("vision_config", hf)
    common = dict(
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        image_size=hf["image_size"],
        patch_size=hf.get("patch_size", 14),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-6),
    )
    if family == "clip":
        return GenericViTConfig(
            **common, add_class_token=True, pre_layernorm=True,
            hidden_act=hf.get("hidden_act", "quick_gelu"),
        )
    if family == "siglip":
        act = hf.get("hidden_act", "gelu_pytorch_tanh")
        return GenericViTConfig(
            **common, add_class_token=False,
            hidden_act="gelu_tanh" if act == "gelu_pytorch_tanh" else act,
        )
    raise ValueError(f"unknown vision family {family!r} (clip|siglip)")
