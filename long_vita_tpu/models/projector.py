"""Pixel-shuffle resampler projector: ViT patch features -> LM embedding space.

Behavioral parity target: reference resampler_projector.py:8-46 —
pixel_shuffle(scale 0.5) on the [grid, grid] patch map (4x channel expansion,
4x token reduction: 1024 patches -> 256 tokens/tile), then LayerNorm and a
bias-free 2-layer GELU MLP into the decoder hidden size.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig
from long_vita_tpu.models.intern_vit import layer_norm

Params = dict[str, Any]


def pixel_shuffle(x: jnp.ndarray, scale: float = 0.5) -> jnp.ndarray:
    """[N, W, H, C] -> [N, W*s, H*s, C/s^2], reference semantics.

    Mirrors the exact reshape/permute dance of resampler_projector.py:36-46
    (which interleaves the two spatial halvings through channel dim) so that
    the channel ordering of the released checkpoint weights is preserved.
    """
    n, w, h, c = x.shape
    hs, ws = int(h * scale), int(w * scale)
    cs = int(c / scale)
    x = x.reshape(n, w, hs, cs)
    x = x.transpose(0, 2, 1, 3)  # [N, H*s, W, C/s]
    x = x.reshape(n, hs, ws, int(c / (scale * scale)))
    x = x.transpose(0, 2, 1, 3)  # [N, W*s, H*s, C/s^2]
    return x


def project_features(
    params: Params, patch_features: jnp.ndarray, cfg: LongVITAConfig
) -> jnp.ndarray:
    """[N_tiles, grid*grid, vit_hidden] -> [N_tiles, tokens, lm_hidden]."""
    n, s, c = patch_features.shape
    grid = int(round(s ** 0.5))  # actual patch grid (pos-embed interpolates)
    x = patch_features.reshape(n, grid, grid, c)
    x = pixel_shuffle(x, cfg.vision_downsample_ratio)
    x = x.reshape(n, -1, x.shape[-1])  # [N, tokens, 4*vit_hidden]
    x = layer_norm(x, params["pre_norm"]["scale"], params["pre_norm"]["bias"], 1e-5)
    x = x @ params["fc1"]["kernel"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["fc2"]["kernel"]
    return x


def init_projector_params(
    rng: jax.Array, cfg: LongVITAConfig, dtype=jnp.float32
) -> Params:
    vit_h = cfg.vision.hidden_size
    in_dim = vit_h * int(1 / cfg.vision_downsample_ratio) ** 2
    k1, k2 = jax.random.split(rng)

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "pre_norm": {
            "scale": jnp.ones((in_dim,), dtype),
            "bias": jnp.zeros((in_dim,), dtype),
        },
        "fc1": {"kernel": dense(k1, (in_dim, vit_h))},
        "fc2": {"kernel": dense(k2, (vit_h, cfg.text.hidden_size))},
    }
