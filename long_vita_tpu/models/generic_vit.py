"""Generic pre-LN vision transformer covering the reference's alternative
vision towers (SURVEY.md C18: clip_vit_model.py, siglip_vit_model.py,
eva_vit_model.py + their arg presets at pretrain_long_vita.py:101-307).

All three are pre-LN GELU ViTs differing only in geometry and two
structural switches:

  - CLIP  (openai_300m): 24L/1024h/16H, patch 14, CLS token
  - SigLIP (so400m):     27L/1152h/16H, patch 14, img 384, no CLS
  - EVA   (eva_4b):      63L/1792h/16H, patch 14, CLS token

InternViT adds per-channel layer-scale and keeps a CLS token — it has its
own module (models/intern_vit.py) because it is the shipped tower; this
generic module exists for checkpoint-compatible training with the other
encoders the reference supports.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from long_vita_tpu.models.intern_vit import layer_norm
from long_vita_tpu.ops.attention import dot_product_attention

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GenericViTConfig:
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    image_size: int
    patch_size: int = 14
    add_class_token: bool = True
    use_layer_scale: bool = False
    pre_layernorm: bool = False  # CLIP: LN on embeddings before the encoder
    final_layernorm: bool = False
    post_norm: bool = False  # EVA: LN on branch OUTPUTS (eva_vit_model.py:46-60)
    hidden_act: str = "gelu"  # "gelu" | "gelu_tanh" (SigLIP) | "quick_gelu" (CLIP)
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.add_class_token else 0)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def clip_vit_300m(image_size: int = 448) -> GenericViTConfig:
    """openai_300m preset (pretrain_long_vita.py get_vision_model_args_openai_300m).

    ln_pre kept, ln_post dropped — matches ckpt_converter_clip.py:39,59-62.
    HF CLIPVisionModel (ViT-L/14) uses eps 1e-5 and quick_gelu.
    """
    return GenericViTConfig(1024, 4096, 24, 16, image_size,
                            add_class_token=True, pre_layernorm=True,
                            hidden_act="quick_gelu", layer_norm_eps=1e-5)


def siglip_so400m(image_size: int = 384) -> GenericViTConfig:
    """siglip so400m geometry (siglip_vit_model.py: no CLS token).

    post_layernorm + attention-pool head dropped — matches
    ckpt_converter_siglip.py:83-87. HF SigLIP uses gelu_pytorch_tanh.
    """
    return GenericViTConfig(1152, 4304, 27, 16, image_size,
                            add_class_token=False, hidden_act="gelu_tanh",
                            layer_norm_eps=1e-6)


def eva_4b(image_size: int = 448) -> GenericViTConfig:
    """eva_4b preset (get_vision_model_args_eva_4b): post-norm residual
    (eva_vit_model.py:46-60 applies input_layernorm/pre_mlp_layernorm to the
    branch outputs), final LN omitted (eva_vit_model.py:146)."""
    return GenericViTConfig(1792, 15360, 63, 16, image_size,
                            add_class_token=True, post_norm=True)


def generic_vit(
    params: Params,
    pixels: jnp.ndarray,  # [N, H, W, 3] NHWC
    cfg: GenericViTConfig,
    *,
    remat: bool = False,
) -> jnp.ndarray:
    """-> [N, seq, hidden] (CLS first when present)."""
    n, h, w, _ = pixels.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    x = pixels.reshape(n, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, gh * gw, p * p * 3).astype(params["patch_embed"]["kernel"].dtype)
    x = x @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    if cfg.add_class_token:
        cls = jnp.broadcast_to(
            params["cls_token"].astype(x.dtype), (n, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]

    eps = cfg.layer_norm_eps
    nh, d = cfg.num_attention_heads, cfg.head_dim
    if cfg.pre_layernorm:
        x = layer_norm(
            x, params["pre_norm"]["scale"], params["pre_norm"]["bias"], eps
        )

    if cfg.hidden_act == "quick_gelu":
        act = lambda t: t * jax.nn.sigmoid(1.702 * t)
    elif cfg.hidden_act == "gelu_tanh":
        act = lambda t: jax.nn.gelu(t, approximate=True)
    else:
        act = lambda t: jax.nn.gelu(t, approximate=False)

    def layer(carry, lp):
        xx = carry
        # post_norm (EVA): branches read the raw residual stream and LN is
        # applied to the branch output before the add (eva_vit_model.py:46-60)
        y = xx if cfg.post_norm else layer_norm(
            xx, lp["norm1"]["scale"], lp["norm1"]["bias"], eps
        )
        qkv = y @ lp["qkv"]["kernel"] + lp["qkv"]["bias"]
        b, s, _ = qkv.shape
        q, k, v = jnp.split(qkv.reshape(b, s, 3, nh, d), 3, axis=2)
        attn = dot_product_attention(
            q.squeeze(2), k.squeeze(2), v.squeeze(2), causal=False
        )
        attn = attn.reshape(b, s, -1) @ lp["proj"]["kernel"] + lp["proj"]["bias"]
        if cfg.post_norm:
            attn = layer_norm(attn, lp["norm1"]["scale"], lp["norm1"]["bias"], eps)
        if cfg.use_layer_scale:
            attn = attn * lp["ls1"]
        xx = xx + attn
        y = xx if cfg.post_norm else layer_norm(
            xx, lp["norm2"]["scale"], lp["norm2"]["bias"], eps
        )
        y = act(y @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
        y = y @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
        if cfg.post_norm:
            y = layer_norm(y, lp["norm2"]["scale"], lp["norm2"]["bias"], eps)
        if cfg.use_layer_scale:
            y = y * lp["ls2"]
        return xx + y, None

    if remat:
        layer = jax.checkpoint(layer)
    x, _ = jax.lax.scan(layer, x, params["layers"])
    if cfg.final_layernorm:
        x = layer_norm(
            x, params["final_norm"]["scale"], params["final_norm"]["bias"], eps
        )
    return x


def init_generic_vit_params(
    rng: jax.Array, cfg: GenericViTConfig, dtype=jnp.float32
) -> Params:
    l, h, i, p = (cfg.num_hidden_layers, cfg.hidden_size,
                  cfg.intermediate_size, cfg.patch_size)
    keys = iter(jax.random.split(rng, 10))

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    params: Params = {
        "patch_embed": {
            "kernel": dense(next(keys), (p * p * 3, h)),
            "bias": jnp.zeros((h,), dtype),
        },
        "pos_embed": dense(next(keys), (cfg.seq_len, h)),
        "layers": {
            "norm1": {"scale": jnp.ones((l, h), dtype),
                      "bias": jnp.zeros((l, h), dtype)},
            "norm2": {"scale": jnp.ones((l, h), dtype),
                      "bias": jnp.zeros((l, h), dtype)},
            "qkv": {"kernel": dense(next(keys), (l, h, 3 * h)),
                    "bias": jnp.zeros((l, 3 * h), dtype)},
            "proj": {"kernel": dense(next(keys), (l, h, h)),
                     "bias": jnp.zeros((l, h), dtype)},
            "fc1": {"kernel": dense(next(keys), (l, h, i)),
                    "bias": jnp.zeros((l, i), dtype)},
            "fc2": {"kernel": dense(next(keys), (l, i, h)),
                    "bias": jnp.zeros((l, h), dtype)},
        },
    }
    if cfg.add_class_token:
        params["cls_token"] = dense(next(keys), (1, 1, h))
    if cfg.pre_layernorm:
        params["pre_norm"] = {
            "scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)
        }
    if cfg.use_layer_scale:
        params["layers"]["ls1"] = jnp.ones((l, h), dtype)
        params["layers"]["ls2"] = jnp.ones((l, h), dtype)
    if cfg.final_layernorm:
        params["final_norm"] = {
            "scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)
        }
    return params
