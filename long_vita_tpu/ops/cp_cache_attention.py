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


def _local_partial(
    q, k_shard, v_shard, q_offset, shard_start, valid_len,
    k_scale=None, v_scale=None,
):
    """(o, lse) of q vs the local cache shard, exact global causal mask.

    q_offset / valid_len may be scalars or [B] vectors (ragged batched
    serving — each row attends up to its own frontier). With
    k_scale/v_scale the shard is int8: on TPU the int8-fused flash kernel
    dequantizes per block in VMEM; the XLA fallback folds the per-row
    scales into the matmuls (xla_attention_quant pattern) — either way no
    bf16 copy of the shard ever lands in HBM."""
    b, sq, hq, d = q.shape
    per_row = (
        getattr(q_offset, "ndim", 0) == 1
        or getattr(valid_len, "ndim", 0) == 1
    )
    from long_vita_tpu.ops._target import target_is_tpu

    if (
        target_is_tpu() and sq >= 128 and sq % 128 == 0
        and not per_row
    ):
        if k_scale is not None:
            from long_vita_tpu.ops.flash_attention import (
                flash_attention_quant,
            )

            return flash_attention_quant(
                q, k_shard, k_scale, v_shard, v_scale,
                q_offset=q_offset, kv_offset=shard_start,
                kv_valid_len=valid_len, return_lse=True,
            )
        from long_vita_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k_shard, v_shard, causal=True,
            q_offset=q_offset, kv_offset=shard_start,
            kv_valid_len=valid_len, return_lse=True,
        )
    # XLA fallback (CPU tests / decode-sized q): positions-based masks,
    # LSE out, optional fused int8 scales
    skv = k_shard.shape[1]
    hkv = k_shard.shape[2]
    g = hq // hkv
    qg = q.reshape(b, sq, hkv, g, d)
    if k_scale is not None:
        s = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qg.astype(jnp.bfloat16),
            k_shard.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        ks = jnp.transpose(k_scale[..., 0], (0, 2, 1))[:, :, None, None, :]
        s = s * ks / (d ** 0.5)
    else:
        s = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qg, k_shard,
            preferred_element_type=jnp.float32,
        ) / (d ** 0.5)
    q_pos = jnp.reshape(jnp.asarray(q_offset), (-1, 1)) + jnp.arange(sq)
    vlen = jnp.reshape(jnp.asarray(valid_len), (-1, 1))  # [B or 1, 1]
    kv_idx = jnp.arange(skv)
    mask = jnp.logical_and(
        (shard_start + kv_idx)[None, None, :] <= q_pos[:, :, None],
        kv_idx[None, None, :] < vlen[:, :, None],
    )  # [B or 1, sq, skv]
    mask = jnp.broadcast_to(mask, (b, sq, skv))[:, None, None]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1)
    l = jnp.sum(jnp.exp(s - m[..., None]), axis=-1)
    lse = jnp.where(l == 0, NEG_INF, m + jnp.log(jnp.where(l == 0, 1.0, l)))
    p = jnp.exp(s - lse[..., None])
    if v_scale is not None:
        vs = jnp.transpose(v_scale[..., 0], (0, 2, 1))[:, :, None, None, :]
        o = jnp.einsum(
            "bhgqk,bkhd->bqhgd", (p * vs).astype(jnp.bfloat16),
            v_shard.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        o = jnp.einsum("bhgqk,bkhd->bqhgd", p.astype(v_shard.dtype), v_shard)
    o = o.reshape(b, sq, hq, d)
    lse = lse.reshape(b, hkv * g, sq)
    return o.astype(q.dtype), lse


def _shard_update(cache_shard, new_rows, layer_idx, cache_len, axis_name):
    """Write new_rows [B, s, H, ...] (replicated over cp) into this rank's
    cache shard [L, B, C, H, ...] at GLOBAL slot cache_len, layer layer_idx.

    A dynamic_update_slice on the globally-sharded cache would make GSPMD
    all-gather the whole cache (the offset is traced, so the partitioner
    can't place the write); inside shard_map the offset is rank-local and
    the write touches s rows. Handles writes that straddle shard
    boundaries: each rank takes the overlapping rows, others keep theirs.

    cache_len may be a [B] vector (ragged batched decode): each row writes
    one token at its own frontier; rows whose frontier lies in another
    rank's shard keep this shard untouched.
    """
    r = jax.lax.axis_index(axis_name)
    c = cache_shard.shape[2]
    s = new_rows.shape[1]
    if getattr(cache_len, "ndim", 0) == 1:
        # [B] frontiers: each row writes its s tokens at its OWN offset
        # (ragged batched decode s=1; batched speculative verify s=k).
        # Rows/tokens whose slot lies in another rank's shard keep this
        # shard untouched; a row's block may straddle the boundary, in
        # which case each rank takes its overlapping tokens.
        b = new_rows.shape[0]
        bidx = jnp.arange(b)
        off = cache_len[:, None] + jnp.arange(s)[None] - r * c  # [B, s]
        # negative offsets (slot in an earlier rank's shard) remap to c so
        # scatter mode="drop" discards them; >= c offsets are dropped as-is
        offd = jnp.where(off >= 0, off, c)
        return cache_shard.at[layer_idx, bidx[:, None], offd].set(
            new_rows.astype(cache_shard.dtype), mode="drop"
        )
    off = cache_len - r * c  # intended local offset (may be outside [0, c-s])
    offc = jnp.clip(off, 0, c - s)
    # local slot offc+i should receive new_rows[offc+i - off]
    idx = jnp.arange(s) + (offc - off)
    valid = jnp.logical_and(idx >= 0, idx < s)
    gathered = jnp.take(new_rows, jnp.clip(idx, 0, s - 1), axis=1)
    cur = jax.lax.dynamic_slice(
        cache_shard,
        (layer_idx, 0, offc) + (0,) * (cache_shard.ndim - 3),
        (1,) + cache_shard.shape[1:2] + (s,) + cache_shard.shape[3:],
    )[0]
    mask = valid[None, :, None, None]
    rows = jnp.where(mask, gathered.astype(cache_shard.dtype), cur)
    return jax.lax.dynamic_update_slice(
        cache_shard,
        rows[None],
        (layer_idx, 0, offc) + (0,) * (cache_shard.ndim - 3),
    )


def cp_cache_update_attend(
    q, ck_shard, cv_shard, k_new, v_new, ks_shard, vs_shard, k_sc, v_sc,
    layer_idx, cache_len, q_offset, axis_name: str = "cp",
    q_sharded: bool = False,
):
    """Fused shard-local cache write + partial-merged attention.

    ck/cv_shard: [L, B, C, Hkv, D] local cache shards; k/v_new: [B, s, Hkv, D]
    the chunk's kv rows (replicated over cp); optional int8 scales likewise.
    Writes the rows at global slot cache_len, then attends q against the
    updated layer shard with total valid length cache_len + s. Must run
    inside shard_map. Returns (out, updated shards...).
    """
    s = k_new.shape[1]
    ck_shard = _shard_update(ck_shard, k_new, layer_idx, cache_len, axis_name)
    cv_shard = _shard_update(cv_shard, v_new, layer_idx, cache_len, axis_name)
    ks_l = vs_l = None
    if ks_shard is not None:
        ks_shard = _shard_update(
            ks_shard, k_sc, layer_idx, cache_len, axis_name
        )
        vs_shard = _shard_update(
            vs_shard, v_sc, layer_idx, cache_len, axis_name
        )
        ks_l = jax.lax.dynamic_index_in_dim(ks_shard, layer_idx, keepdims=False)
        vs_l = jax.lax.dynamic_index_in_dim(vs_shard, layer_idx, keepdims=False)
    k_l = jax.lax.dynamic_index_in_dim(ck_shard, layer_idx, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(cv_shard, layer_idx, keepdims=False)
    out = cp_cached_attention(
        q, k_l, v_l, q_offset, cache_len + s, axis_name, ks_l, vs_l,
        q_sharded=q_sharded,
    )
    return out, ck_shard, cv_shard, ks_shard, vs_shard


def cp_cached_attention(
    q: jnp.ndarray,  # [B, Sq, Hq, D] (local q shard when q_sharded)
    k_shard: jnp.ndarray,  # [B, C, Hkv, D] local cache shard
    v_shard: jnp.ndarray,
    q_offset,  # scalar: global position of q[0]
    cache_len,  # scalar: global number of valid cache slots
    axis_name: str = "cp",
    k_scale=None,  # [B, C, Hkv, 1] int8-cache scales (optional)
    v_scale=None,
    q_sharded: bool = False,
) -> jnp.ndarray:
    """Merge per-shard partials across cp. Must run inside shard_map.

    With k_scale/v_scale the shards are int8 (models/qwen2.py quantize_kv);
    dequantization is fused into the shard-local attention (_local_partial:
    per-block VMEM dequant in the flash kernel, scale-folded matmuls in the
    XLA fallback) so only int8 bytes cross HBM.

    q_offset / cache_len may be [B] vectors (ragged batched decode — each
    row reads up to its own frontier).

    q_sharded (chunked prefill): q arrives SEQUENCE-sharded over cp so the
    surrounding QKV/MLP GEMMs run on 1/cp of the chunk per rank (without
    this, every cp rank redundantly computes the whole chunk and 1M TTFT
    scales with tp only). The chunk-sized q is all-gathered here — a few MB
    vs the cache's GBs — and the LSE-weighted merge returns sequence-sharded
    via psum_scatter (1/cp the psum bytes). Decode (Sq=1) keeps q replicated.
    """
    cp = jax.lax.axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    c = k_shard.shape[1]
    shard_start = r * c
    valid_len = jnp.clip(cache_len - shard_start, 0, c)

    if q_sharded:
        q = jax.lax.all_gather(q, axis_name, axis=1, tiled=True)

    o, lse = _local_partial(
        q, k_shard, v_shard, q_offset, shard_start, valid_len,
        k_scale, v_scale,
    )  # o [B,Sq,H,D], lse [B,H,Sq]

    lse_max = jax.lax.pmax(lse, axis_name)
    w = jnp.exp(lse - lse_max)  # [B,H,Sq], 0 where shard saw nothing
    w_q = jnp.transpose(w, (0, 2, 1))[..., None]  # [B,Sq,H,1]
    ow = o.astype(jnp.float32) * w_q
    if q_sharded:
        # merge + return-to-shard in one collective: rank r keeps the rows
        # it contributed (all_gather above concatenated in rank order)
        o_sum = jax.lax.psum_scatter(
            ow, axis_name, scatter_dimension=1, tiled=True
        )
        w_sum = jax.lax.psum_scatter(
            w_q, axis_name, scatter_dimension=1, tiled=True
        )
    else:
        o_sum = jax.lax.psum(ow, axis_name)
        w_sum = jax.lax.psum(w_q, axis_name)
    return (o_sum / jnp.maximum(w_sum, 1e-30)).astype(q.dtype)
