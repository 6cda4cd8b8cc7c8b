"""Export our param pytree back to HF LongVITA safetensors.

Reverse of utils/checkpoint_io.py — replaces the reference's
mcore->HF converter direction (tools/hf2mcore_long_vita.py:374-517): a
TPU-trained checkpoint becomes a directory loadable by the reference's HF
inference stack (trust_remote_code LongVITAForCausalLM) or by ours.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig

Params = dict[str, Any]

_SHARD_BYTES = 4 * 1024**3


def _np(x, dtype=None) -> np.ndarray:
    # ascontiguousarray matters: safetensors serializes the raw buffer and
    # silently ignores strides of non-contiguous views (e.g. transposes)
    return np.ascontiguousarray(np.asarray(jnp.asarray(x, dtype) if dtype else x))


def flatten_to_hf(params: Params, cfg: LongVITAConfig) -> dict[str, np.ndarray]:
    """Our pytree -> HF-named state dict (numpy, bf16 preserved)."""
    out: dict[str, np.ndarray] = {}
    t = params["text"]
    out["model.embed_tokens.weight"] = _np(t["embed"]["embedding"])
    out["model.norm.weight"] = _np(t["final_norm"])
    out["lm_head.weight"] = _np(jnp.transpose(t["lm_head"]["kernel"]))
    layers = t["layers"]
    n_layers = layers["input_norm"].shape[0]
    for i in range(n_layers):
        p = f"model.layers.{i}."
        out[p + "input_layernorm.weight"] = _np(layers["input_norm"][i])
        out[p + "post_attention_layernorm.weight"] = _np(
            layers["post_attn_norm"][i]
        )
        for name in ("q_proj", "k_proj", "v_proj"):
            out[p + f"self_attn.{name}.weight"] = _np(
                jnp.transpose(layers[name]["kernel"][i])
            )
            out[p + f"self_attn.{name}.bias"] = _np(layers[name]["bias"][i])
        out[p + "self_attn.o_proj.weight"] = _np(
            jnp.transpose(layers["o_proj"]["kernel"][i])
        )
        for name in ("gate_proj", "up_proj", "down_proj"):
            out[p + f"mlp.{name}.weight"] = _np(
                jnp.transpose(layers[name]["kernel"][i])
            )

    if "vision" in params:
        v = params["vision"]
        emb = v["embeddings"]
        vp = "model.vision_model."
        out[vp + "embeddings.class_embedding"] = _np(emb["cls_token"])
        out[vp + "embeddings.position_embedding"] = _np(emb["pos_embed"])[None]
        p_sz = cfg.vision.patch_size
        kern = _np(emb["patch_embed"]["kernel"])  # [p*p*3, H]
        out[vp + "embeddings.patch_embedding.weight"] = np.ascontiguousarray(
            kern.reshape(p_sz, p_sz, 3, -1).transpose(3, 2, 0, 1)
        )
        out[vp + "embeddings.patch_embedding.bias"] = _np(
            emb["patch_embed"]["bias"]
        )
        vl = v["layers"]
        for i in range(vl["ls1"].shape[0]):
            p = f"{vp}encoder.layers.{i}."
            out[p + "ls1"] = _np(vl["ls1"][i])
            out[p + "ls2"] = _np(vl["ls2"][i])
            out[p + "norm1.weight"] = _np(vl["norm1"]["scale"][i])
            out[p + "norm1.bias"] = _np(vl["norm1"]["bias"][i])
            out[p + "norm2.weight"] = _np(vl["norm2"]["scale"][i])
            out[p + "norm2.bias"] = _np(vl["norm2"]["bias"][i])
            out[p + "attn.qkv.weight"] = _np(jnp.transpose(vl["qkv"]["kernel"][i]))
            out[p + "attn.qkv.bias"] = _np(vl["qkv"]["bias"][i])
            out[p + "attn.proj.weight"] = _np(
                jnp.transpose(vl["proj"]["kernel"][i])
            )
            out[p + "attn.proj.bias"] = _np(vl["proj"]["bias"][i])
            out[p + "mlp.fc1.weight"] = _np(jnp.transpose(vl["fc1"]["kernel"][i]))
            out[p + "mlp.fc1.bias"] = _np(vl["fc1"]["bias"][i])
            out[p + "mlp.fc2.weight"] = _np(jnp.transpose(vl["fc2"]["kernel"][i]))
            out[p + "mlp.fc2.bias"] = _np(vl["fc2"]["bias"][i])

        proj = params["projector"]
        pp = "model.vision_projection."
        out[pp + "pre_proj_layernorm.weight"] = _np(proj["pre_norm"]["scale"])
        out[pp + "pre_proj_layernorm.bias"] = _np(proj["pre_norm"]["bias"])
        out[pp + "mlp.0.weight"] = _np(jnp.transpose(proj["fc1"]["kernel"]))
        out[pp + "mlp.2.weight"] = _np(jnp.transpose(proj["fc2"]["kernel"]))
    return out


def save_hf_checkpoint(
    params: Params, cfg: LongVITAConfig, out_dir: str, tokenizer=None
) -> None:
    """Write sharded safetensors + index + config.json (+ tokenizer)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    if tokenizer is not None:
        tokenizer.save_pretrained(out_dir)
    sd = flatten_to_hf(params, cfg)

    # shard by size
    shards: list[dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for name, arr in sd.items():
        nbytes = arr.nbytes
        if sizes[-1] + nbytes > _SHARD_BYTES and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = arr
        sizes[-1] += nbytes

    weight_map = {}
    total = sum(sizes)
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = (
            "model.safetensors" if n == 1
            else f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        )
        save_file(shard, os.path.join(out_dir, fname))
        for name in shard:
            weight_map[name] = fname
    if n > 1:
        with open(
            os.path.join(out_dir, "model.safetensors.index.json"), "w"
        ) as f:
            json.dump(
                {"metadata": {"total_size": total}, "weight_map": weight_map},
                f, indent=2,
            )

    # config.json in the HF LongVITA schema
    t, v = cfg.text, cfg.vision
    hf_cfg = {
        "architectures": ["LongVITAForCausalLM"],
        "model_type": "long_vita",
        "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size,
        "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_hidden_layers,
        "num_attention_heads": t.num_attention_heads,
        "num_key_value_heads": t.num_key_value_heads,
        "rms_norm_eps": t.rms_norm_eps,
        "rope_theta": t.rope_theta,
        "max_position_embeddings": t.max_position_embeddings,
        "tie_word_embeddings": t.tie_word_embeddings,
        "bos_token_id": t.bos_token_id,
        "eos_token_id": t.eos_token_id,
        "hidden_act": "silu",
        "torch_dtype": "bfloat16",
        "use_cache": True,
    }
    if v is not None:
        hf_cfg["visual"] = {
            "architectures": ["InternVisionModel"],
            "model_type": "intern_vit_6b",
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_hidden_layers,
            "num_attention_heads": v.num_attention_heads,
            "image_size": v.image_size,
            "patch_size": v.patch_size,
            "layer_norm_eps": v.layer_norm_eps,
            "hidden_act": "gelu",
            "norm_type": "layer_norm",
            "qkv_bias": True,
            "qk_normalization": False,
        }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
