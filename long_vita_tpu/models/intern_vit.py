"""InternViT-300M-448px vision encoder, functional JAX.

Behavioral parity target: reference
long_vita/models/long_vita_qwen2_intern/modeling_intern_vit.py —
conv patch embed (14x14/stride14) + CLS token + learned position embedding
(bicubically interpolated when the patch grid differs, :88-107), 24
pre-LayerNorm transformer layers with per-channel layer-scale ls1/ls2
(:200-229), GELU MLP, non-causal attention with qkv bias.

TPU-first notes:
  - The conv patch-embed is expressed as a patchify-reshape + one [P*P*3, H]
    matmul — lands on the MXU as a single large GEMM instead of a conv.
  - Layers run under lax.scan over stacked params (compile once).
  - Attention is non-causal flash (ops/attention.py ViT branch, mirroring the
    reference's seq==vision_seq_length routing in dot_product_attention.py:312-329).
  - Tiles are batched: input [N_tiles, H, W, 3] (NHWC, TPU-friendly layout).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from long_vita_tpu.config import VisionConfig
from long_vita_tpu.ops.attention import dot_product_attention

Params = dict[str, Any]


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def patch_embed(params: Params, pixels: jnp.ndarray, cfg: VisionConfig):
    """[N, H, W, 3] NHWC -> [N, grid*grid, hidden] via patchify + GEMM."""
    n, h, w, c = pixels.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    x = pixels.reshape(n, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, gh * gw, p * p * c)
    x = x.astype(params["kernel"].dtype)
    return x @ params["kernel"] + params["bias"], (gh, gw)


def _interp_pos_embed(pos: jnp.ndarray, src_grid: int, dst: tuple[int, int]):
    """Bicubic-resample the learned [src*src, H] patch pos-embed to dst grid.

    Matches reference modeling_intern_vit.py:88-94 (F.interpolate bicubic,
    align_corners=False). Uses jax.image.resize(cubic) in f32.
    """
    gh, gw = dst
    if (gh, gw) == (src_grid, src_grid):
        return pos
    hdim = pos.shape[-1]
    grid = pos.astype(jnp.float32).reshape(src_grid, src_grid, hdim)
    out = jax.image.resize(grid, (gh, gw, hdim), method="cubic")
    return out.reshape(gh * gw, hdim).astype(pos.dtype)


def vit_embeddings(params: Params, pixels: jnp.ndarray, cfg: VisionConfig):
    """-> [N, 1+gh*gw, hidden] with CLS prepended and pos-embed added."""
    x, (gh, gw) = patch_embed(params["patch_embed"], pixels, cfg)
    n = x.shape[0]
    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (n, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pos = params["pos_embed"]  # [1+grid^2, hidden]
    patch_pos = _interp_pos_embed(pos[1:], cfg.grid, (gh, gw))
    full_pos = jnp.concatenate([pos[:1], patch_pos], axis=0)
    return x + full_pos.astype(x.dtype)[None]


def vit_layer(layer: Params, x: jnp.ndarray, cfg: VisionConfig, attn_impl: str):
    b, s, h = x.shape
    nh, d = cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    y = layer_norm(x, layer["norm1"]["scale"], layer["norm1"]["bias"], eps)
    qkv = y @ layer["qkv"]["kernel"] + layer["qkv"]["bias"]  # [B,S,3H]
    q, k, v = jnp.split(qkv.reshape(b, s, 3, nh, d), 3, axis=2)
    q, k, v = q.squeeze(2), k.squeeze(2), v.squeeze(2)
    attn = dot_product_attention(q, k, v, causal=False, impl=attn_impl)
    attn = attn.reshape(b, s, h) @ layer["proj"]["kernel"] + layer["proj"]["bias"]
    x = x + attn * layer["ls1"]

    y = layer_norm(x, layer["norm2"]["scale"], layer["norm2"]["bias"], eps)
    y = y @ layer["fc1"]["kernel"] + layer["fc1"]["bias"]
    y = jax.nn.gelu(y, approximate=False)
    y = y @ layer["fc2"]["kernel"] + layer["fc2"]["bias"]
    return x + y * layer["ls2"]


def intern_vit(
    params: Params,
    pixels: jnp.ndarray,
    cfg: VisionConfig,
    *,
    attn_impl: str = "auto",
    remat: bool = False,
) -> jnp.ndarray:
    """Encode tiles: [N, H, W, 3] -> [N, 1+gh*gw, hidden] (CLS included)."""
    x = vit_embeddings(params["embeddings"], pixels, cfg)

    def body(carry, layer):
        return vit_layer(layer, carry, cfg, attn_impl), None

    if remat:
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.nothing_saveable)

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def init_vit_params(rng: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> Params:
    l, h, i = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    p = cfg.patch_size
    keys = iter(jax.random.split(rng, 12))

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "embeddings": {
            "patch_embed": {
                "kernel": dense(next(keys), (p * p * cfg.num_channels, h)),
                "bias": jnp.zeros((h,), dtype),
            },
            "cls_token": dense(next(keys), (1, 1, h)),
            "pos_embed": dense(next(keys), (cfg.num_patches + 1, h)),
        },
        "layers": {
            "norm1": {"scale": jnp.ones((l, h), dtype), "bias": jnp.zeros((l, h), dtype)},
            "norm2": {"scale": jnp.ones((l, h), dtype), "bias": jnp.zeros((l, h), dtype)},
            "qkv": {
                "kernel": dense(next(keys), (l, h, 3 * h)),
                "bias": jnp.zeros((l, 3 * h), dtype),
            },
            "proj": {
                "kernel": dense(next(keys), (l, h, h)),
                "bias": jnp.zeros((l, h), dtype),
            },
            "fc1": {
                "kernel": dense(next(keys), (l, h, i)),
                "bias": jnp.zeros((l, i), dtype),
            },
            "fc2": {
                "kernel": dense(next(keys), (l, i, h)),
                "bias": jnp.zeros((l, h), dtype),
            },
            "ls1": jnp.full((l, h), cfg.initializer_factor, dtype),
            "ls2": jnp.full((l, h), cfg.initializer_factor, dtype),
        },
    }
