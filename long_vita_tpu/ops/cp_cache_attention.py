"""Context-parallel attention against a sequence-sharded KV cache.

The 1M-token serving path (SURVEY.md C21 / §5 "CP inference"): the
reference's CP server cannot keep a KV cache under context parallelism, so
it re-prefills ALL tokens for every emitted token
(inference/text_generation/generation.py:123-258, server_cp.sh keeps
--use-kv-cache off). Here the cache shards over the cp axis by SEQUENCE
(shard r holds global positions [r*C, (r+1)*C)); each query chunk computes
a partial attention against the local shard with exact position masks (the
flash kernel's q/kv offsets + kv_valid_len), and partials merge across the
axis with a log-sum-exp-weighted psum — decode is O(cache/cp) per chip
instead of O(prefill) recompute.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from long_vita_tpu.ops.flash_attention import NEG_INF


def _local_partial(q, k_shard, v_shard, q_offset, shard_start, valid_len):
    """(o, lse) of q vs the local cache shard, exact global causal mask."""
    b, sq, hq, d = q.shape
    if jax.default_backend() == "tpu" and sq >= 128 and sq % 128 == 0:
        from long_vita_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k_shard, v_shard, causal=True,
            q_offset=q_offset, kv_offset=shard_start,
            kv_valid_len=valid_len, return_lse=True,
        )
    # XLA fallback (CPU tests / tiny q): positions-based masks, LSE out
    skv = k_shard.shape[1]
    hkv = k_shard.shape[2]
    g = hq // hkv
    qg = q.reshape(b, sq, hkv, g, d)
    s = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k_shard, preferred_element_type=jnp.float32
    ) / (d ** 0.5)
    q_pos = q_offset + jnp.arange(sq)
    kv_pos = shard_start + jnp.arange(skv)
    mask = jnp.logical_and(
        kv_pos[None, :] <= q_pos[:, None],
        (jnp.arange(skv) < valid_len)[None, :],
    )  # [sq, skv]
    s = jnp.where(mask[None, None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)
    l = jnp.sum(jnp.exp(s - m[..., None]), axis=-1)
    lse = jnp.where(l == 0, NEG_INF, m + jnp.log(jnp.where(l == 0, 1.0, l)))
    p = jnp.exp(s - lse[..., None])
    o = jnp.einsum("bhgqk,bkhd->bqhgd", p.astype(v_shard.dtype), v_shard)
    o = o.reshape(b, sq, hq, d)
    lse = lse.reshape(b, hkv * g, sq)
    return o.astype(q.dtype), lse


def cp_cached_attention(
    q: jnp.ndarray,  # [B, Sq, Hq, D], replicated over cp
    k_shard: jnp.ndarray,  # [B, C, Hkv, D] local cache shard
    v_shard: jnp.ndarray,
    q_offset,  # scalar: global position of q[0]
    cache_len,  # scalar: global number of valid cache slots
    axis_name: str = "cp",
    k_scale=None,  # [B, C, Hkv, 1] int8-cache scales (optional)
    v_scale=None,
) -> jnp.ndarray:
    """Merge per-shard partials across cp. Must run inside shard_map.

    With k_scale/v_scale the shards are int8 (models/qwen2.py quantize_kv);
    dequantization happens shard-locally so only int8 bytes cross HBM."""
    cp = jax.lax.axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    c = k_shard.shape[1]
    shard_start = r * c
    valid_len = jnp.clip(cache_len - shard_start, 0, c)

    if k_scale is not None:
        # shard-local dequant (bf16 copy of ONE shard, 1/cp of the cache)
        k_shard = (k_shard.astype(jnp.float32) * k_scale).astype(q.dtype)
        v_shard = (v_shard.astype(jnp.float32) * v_scale).astype(q.dtype)

    o, lse = _local_partial(
        q, k_shard, v_shard, q_offset, shard_start, valid_len
    )  # o [B,Sq,H,D], lse [B,H,Sq]

    lse_max = jax.lax.pmax(lse, axis_name)
    w = jnp.exp(lse - lse_max)  # [B,H,Sq], 0 where shard saw nothing
    w_q = jnp.transpose(w, (0, 2, 1))[..., None]  # [B,Sq,H,1]
    o_sum = jax.lax.psum(o.astype(jnp.float32) * w_q, axis_name)
    w_sum = jax.lax.psum(w_q, axis_name)
    return (o_sum / jnp.maximum(w_sum, 1e-30)).astype(q.dtype)
