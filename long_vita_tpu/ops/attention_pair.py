"""Chunk-pair attention primitives for ring attention.

Ring attention decomposes global causal attention into (q-chunk, kv-chunk)
pairs that are each either a full attend or a causal diagonal. These helpers
compute the forward (returning LSE for cross-pair softmax merging) and the
backward (given the GLOBAL lse and delta) for one pair.

On TPU they call the Pallas kernels in ops/flash_attention.py; off-TPU a
pure-XLA reference (materializes [C, C] per pair — fine for tests).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from long_vita_tpu.ops.flash_attention import (
    NEG_INF,
    _bwd_pair_pallas,
    flash_attention,
)


def _use_pallas() -> bool:
    from long_vita_tpu.ops._target import target_is_tpu

    return target_is_tpu()


def _logits(q, k, scale, causal, q_seg, kv_seg):
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    mask = None
    if causal:
        sq, skv = q.shape[1], k.shape[1]
        mask = jnp.arange(skv)[None, :] <= jnp.arange(sq)[:, None]
        mask = mask[None, None]
    if q_seg is not None:
        seg = (q_seg[:, :, None] == kv_seg[:, None, :])[:, None]
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    return s


def _gqa(x, hq):
    if x.shape[2] != hq:
        x = jnp.repeat(x, hq // x.shape[2], axis=2)
    return x


def pair_attn_fwd(
    q: jnp.ndarray,  # [B, Cq, Hq, D]
    k: jnp.ndarray,  # [B, Ck, Hkv, D]
    v: jnp.ndarray,
    *,
    causal: bool,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (o [B, Cq, Hq, D] f32-accumulated in q dtype, lse [B, Hq, Cq] f32).

    Rows with no visible kv get o=0, lse=NEG_INF (mergeable identity).
    """
    if _use_pallas():
        return flash_attention(
            q, k, v, causal=causal,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            return_lse=True,
        )
    hq, d = q.shape[2], q.shape[3]
    kf, vf = _gqa(k, hq), _gqa(v, hq)
    s = _logits(q, kf, 1.0 / (d ** 0.5), causal, q_segment_ids, kv_segment_ids)
    m = jnp.max(s, axis=-1)  # [B,H,Cq]
    l = jnp.sum(jnp.exp(s - m[..., None]), axis=-1)
    lse = m + jnp.log(jnp.where(l == 0, 1.0, l))
    lse = jnp.where(l == 0, NEG_INF, lse)
    p = jnp.exp(s - lse[..., None])  # normalized probabilities
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vf.dtype), vf)
    return o.astype(q.dtype), lse


def pair_attn_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    do: jnp.ndarray,  # [B, Cq, Hq, D]
    lse: jnp.ndarray,  # [B, Hq, Cq] GLOBAL lse
    delta: jnp.ndarray,  # [B, Hq, Cq] GLOBAL rowsum(do * o_final)
    *,
    causal: bool,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Partial (dq, dk, dv) for one pair, exact because lse/delta are global."""
    if _use_pallas():
        return _bwd_pair_pallas(
            q, k, v, do, lse, delta, causal=causal,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        )
    b, cq, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    scale = 1.0 / (d ** 0.5)
    kf, vf = _gqa(k, hq), _gqa(v, hq)
    s = _logits(q, kf, scale, causal, q_segment_ids, kv_segment_ids)
    p = jnp.exp(s - lse[..., None])  # [B,H,Cq,Ck], 0 where masked (s=NEG_INF)
    dof = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, dof)
    dp = jnp.einsum("bqhd,bkhd->bhqk", dof, vf.astype(jnp.float32))
    ds = p * (dp - delta[..., None]) * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf.astype(jnp.float32))
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32))
    if group > 1:
        dk = dk.reshape(b, -1, hkv, group, d).sum(axis=3)
        dv = dv.reshape(b, -1, hkv, group, d).sum(axis=3)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def merge_partials(o1, lse1, o2, lse2):
    """Merge two attention partials (softmax-weighted by their LSEs)."""
    lse = jnp.logaddexp(lse1, lse2)  # [B,H,Cq]
    w1 = jnp.exp(lse1 - lse)[..., None].transpose(0, 2, 1, 3)  # [B,Cq,H,1]
    w2 = jnp.exp(lse2 - lse)[..., None].transpose(0, 2, 1, 3)
    o = o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2
    return o.astype(o1.dtype), lse
