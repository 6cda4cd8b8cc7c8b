"""Checkpoint I/O: released Long-VITA *_HF safetensors -> our param pytree.

Replaces the reference's converter zoo (SURVEY.md C23: hf2mcore_long_vita.py
and the per-ViT converters): since the HF checkpoints exist for every
released model (README.md:66-70), we map HF names directly — no Megatron
formats, no TP shard files; sharding happens at load time via
jax.device_put with the mesh rules (parallel/sharding.py).

HF key schema (modeling_long_vita.py / modeling_intern_vit.py /
resampler_projector.py):
  model.embed_tokens.weight, model.layers.{i}.self_attn.{q,k,v,o}_proj.*,
  model.layers.{i}.mlp.{gate,up,down}_proj.weight,
  model.layers.{i}.{input,post_attention}_layernorm.weight, model.norm.weight,
  lm_head.weight,
  model.vision_model.embeddings.{class_embedding,position_embedding,
    patch_embedding.{weight,bias}},
  model.vision_model.encoder.layers.{i}.{ls1,ls2,attn.qkv.*,attn.proj.*,
    mlp.fc{1,2}.*,norm{1,2}.*},
  model.vision_projection.pre_proj_layernorm.{weight,bias},
  model.vision_projection.mlp.{0,2}.weight
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Optional

import numpy as np

import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig

Params = dict[str, Any]


class SafetensorsIndex:
    """Reads tensors across sharded .safetensors files by name, lazily."""

    def __init__(self, path: str):
        self.path = path
        self.name_to_file: dict[str, str] = {}
        index_file = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index_file):
            with open(index_file) as f:
                weight_map = json.load(f)["weight_map"]
            for name, fname in weight_map.items():
                self.name_to_file[name] = os.path.join(path, fname)
        else:
            from safetensors import safe_open

            for fname in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
                with safe_open(fname, framework="numpy") as f:
                    for name in f.keys():
                        self.name_to_file[name] = fname
        self._open_files: dict[str, Any] = {}

    def __contains__(self, name: str) -> bool:
        return name in self.name_to_file

    def keys(self):
        return self.name_to_file.keys()

    def get(self, name: str) -> np.ndarray:
        from safetensors import safe_open

        fname = self.name_to_file[name]
        if fname not in self._open_files:
            self._open_files[fname] = safe_open(fname, framework="numpy")
        tensor = self._open_files[fname].get_tensor(name)
        if tensor.dtype == np.dtype("V2"):  # raw bfloat16 comes back as void
            tensor = tensor.view(np.uint16)
        return tensor

    def close(self):
        self._open_files.clear()


def _as_jnp(x: np.ndarray, dtype) -> jnp.ndarray:
    if x.dtype == np.uint16:  # bfloat16 bits
        x = jnp.asarray(x).view(jnp.bfloat16)
        return x.astype(dtype)
    return jnp.asarray(x, dtype)


def load_text_params(
    idx: SafetensorsIndex, cfg: LongVITAConfig, dtype=jnp.bfloat16,
    prefix: str = "model.",
) -> Params:
    t = cfg.text
    l = t.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = [idx.get(fmt.format(i)) for i in range(l)]
        if transpose:
            mats = [m.T for m in mats]
        return _as_jnp(np.stack(mats), dtype)

    p = prefix + "layers.{}."
    lm_head_key = "lm_head.weight"
    if lm_head_key not in idx:  # tied embeddings fallback
        lm_head_key = prefix + "embed_tokens.weight"
    return {
        "embed": {
            "embedding": _as_jnp(idx.get(prefix + "embed_tokens.weight"), dtype)
        },
        "layers": {
            "input_norm": stack(p + "input_layernorm.weight"),
            "post_attn_norm": stack(p + "post_attention_layernorm.weight"),
            "q_proj": {
                "kernel": stack(p + "self_attn.q_proj.weight", transpose=True),
                "bias": stack(p + "self_attn.q_proj.bias"),
            },
            "k_proj": {
                "kernel": stack(p + "self_attn.k_proj.weight", transpose=True),
                "bias": stack(p + "self_attn.k_proj.bias"),
            },
            "v_proj": {
                "kernel": stack(p + "self_attn.v_proj.weight", transpose=True),
                "bias": stack(p + "self_attn.v_proj.bias"),
            },
            "o_proj": {
                "kernel": stack(p + "self_attn.o_proj.weight", transpose=True)
            },
            "gate_proj": {
                "kernel": stack(p + "mlp.gate_proj.weight", transpose=True)
            },
            "up_proj": {"kernel": stack(p + "mlp.up_proj.weight", transpose=True)},
            "down_proj": {
                "kernel": stack(p + "mlp.down_proj.weight", transpose=True)
            },
        },
        "final_norm": _as_jnp(idx.get(prefix + "norm.weight"), dtype),
        "lm_head": {"kernel": _as_jnp(idx.get(lm_head_key), dtype).T},
    }


def load_vision_params(
    idx: SafetensorsIndex, cfg: LongVITAConfig, dtype=jnp.bfloat16,
    prefix: str = "model.vision_model.",
) -> Params:
    v = cfg.vision
    l = v.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = [idx.get(fmt.format(i)) for i in range(l)]
        if transpose:
            mats = [m.T for m in mats]
        return _as_jnp(np.stack(mats), dtype)

    conv_w = idx.get(prefix + "embeddings.patch_embedding.weight")  # [H,C,p,p]
    if conv_w.dtype == np.uint16:
        conv_w = np.asarray(
            jnp.asarray(conv_w).view(jnp.bfloat16).astype(jnp.float32)
        )
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])

    p = prefix + "encoder.layers.{}."
    return {
        "embeddings": {
            "patch_embed": {
                "kernel": jnp.asarray(patch_kernel, dtype),
                "bias": _as_jnp(
                    idx.get(prefix + "embeddings.patch_embedding.bias"), dtype
                ),
            },
            "cls_token": _as_jnp(
                idx.get(prefix + "embeddings.class_embedding"), dtype
            ),
            "pos_embed": _as_jnp(
                idx.get(prefix + "embeddings.position_embedding"), dtype
            )[0],
        },
        "layers": {
            "norm1": {
                "scale": stack(p + "norm1.weight"),
                "bias": stack(p + "norm1.bias"),
            },
            "norm2": {
                "scale": stack(p + "norm2.weight"),
                "bias": stack(p + "norm2.bias"),
            },
            "qkv": {
                "kernel": stack(p + "attn.qkv.weight", transpose=True),
                "bias": stack(p + "attn.qkv.bias"),
            },
            "proj": {
                "kernel": stack(p + "attn.proj.weight", transpose=True),
                "bias": stack(p + "attn.proj.bias"),
            },
            "fc1": {
                "kernel": stack(p + "mlp.fc1.weight", transpose=True),
                "bias": stack(p + "mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": stack(p + "mlp.fc2.weight", transpose=True),
                "bias": stack(p + "mlp.fc2.bias"),
            },
            "ls1": stack(p + "ls1"),
            "ls2": stack(p + "ls2"),
        },
    }


def load_projector_params(
    idx: SafetensorsIndex, cfg: LongVITAConfig, dtype=jnp.bfloat16,
    prefix: str = "model.vision_projection.",
) -> Params:
    return {
        "pre_norm": {
            "scale": _as_jnp(idx.get(prefix + "pre_proj_layernorm.weight"), dtype),
            "bias": _as_jnp(idx.get(prefix + "pre_proj_layernorm.bias"), dtype),
        },
        "fc1": {"kernel": _as_jnp(idx.get(prefix + "mlp.0.weight"), dtype).T},
        "fc2": {"kernel": _as_jnp(idx.get(prefix + "mlp.2.weight"), dtype).T},
    }


def load_long_vita_checkpoint(
    path: str,
    cfg: Optional[LongVITAConfig] = None,
    dtype=jnp.bfloat16,
) -> tuple[Params, LongVITAConfig]:
    """Load a released Long-VITA-*_HF checkpoint directory."""
    if cfg is None:
        cfg = LongVITAConfig.from_json(os.path.join(path, "config.json"))
    idx = SafetensorsIndex(path)
    params: Params = {"text": load_text_params(idx, cfg, dtype)}
    if cfg.vision is not None and any(
        k.startswith("model.vision_model.") for k in idx.keys()
    ):
        params["vision"] = load_vision_params(idx, cfg, dtype)
        params["projector"] = load_projector_params(idx, cfg, dtype)
    idx.close()
    return params, cfg
