"""Rotary position embeddings (HF non-interleaved / rotate-half convention).

The released checkpoints were trained with HF-style RoPE (rotate_half layout,
cos/sin duplicated across both halves) — see reference
modeling_long_vita.py (Qwen2 path) and
long_vita_megatron/core/models/common/embeddings/rotary_pos_embedding.py:114-121,
which gathers frequencies by data-driven position ids for packed sequences.

TPU notes: we precompute nothing persistent; inv_freq is tiny, the cos/sin
tables are computed on the fly from position_ids under jit so XLA can fuse
the gather + elementwise application into surrounding ops. All math in f32.
"""
from __future__ import annotations

import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    """[head_dim//2] inverse frequencies, f32."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponent)


def rope_cos_sin(position_ids: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin tables for given positions.

    position_ids: int array [..., S] (any leading dims).
    Returns (cos, sin) each [..., S, head_dim] in f32, duplicated-half layout.
    """
    inv_freq = rope_inv_freq(head_dim, theta)
    angles = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [..., S, D/2]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [..., S, D]
    return jnp.cos(angles), jnp.sin(angles)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply rotary embedding.

    q: [B, S, Hq, D], k: [B, S, Hk, D]; cos/sin: [B, S, D] or [S, D].
    Computation in f32, result cast back to input dtype.

    Half-split formulation: the textbook `x*cos + rotate_half(x)*sin`
    materializes the rotate_half CONCAT as an f32 [B, S, H, D] HBM
    transient (~4.7 ms/layer at 16K/40h — gemm_ceiling_probe.py glue
    itemization). Computing the two output halves directly and casting
    each to the input dtype BEFORE the output concat is element-for-
    element the same f32 math (x1*cos - x2*sin / x2*cos + x1*sin with
    the duplicated-half cos/sin tables), but every intermediate stays
    inside one XLA fusion — the only HBM traffic is the bf16 read of x
    and write of the result."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    half = q.shape[-1] // 2
    # duplicated-half layout: cos[..., :half] == cos[..., half:]
    cos_h = cos[:, :, None, :half].astype(jnp.float32)  # [B, S, 1, D/2]
    sin_h = sin[:, :, None, :half].astype(jnp.float32)

    def _rot(x):
        x1 = x[..., :half].astype(jnp.float32)
        x2 = x[..., half:].astype(jnp.float32)
        return jnp.concatenate(
            [
                (x1 * cos_h - x2 * sin_h).astype(x.dtype),
                (x2 * cos_h + x1 * sin_h).astype(x.dtype),
            ],
            axis=-1,
        )

    return _rot(q), _rot(k)
