"""Attention dispatch: Pallas flash kernels on TPU, XLA reference elsewhere.

Replaces the reference's attention dispatch layer
(long_vita_megatron/core/transformer/dot_product_attention.py:294-394), which
routes between flash-attn CUDA kernels (causal LLM / non-causal ViT / packed
varlen) and MindSpeed ring kernels. Here the same routing is:

  - ViT: non-causal flash (no mask)
  - decoder prefill: causal flash, optionally with segment ids (packed varlen
    replacing the reference's position_ids-based flash_attn varlen path)
  - decoder decode (Sq==1 or tiny): XLA dot attention against the KV cache —
    bandwidth-bound, XLA is at speed of light already
  - context parallelism handled a level above (ops/ring_attention.py)

All masks are computed from positions/segments rather than materialized
[S, S] tensors, so nothing quadratic ever hits HBM outside the kernel.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.0**30  # large-but-finite: keeps masked softmax NaN-free in f32


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    logits_soft_cap: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention in pure XLA. f32 softmax, output in q.dtype.

    q: [B, Sq, Hq, D]; k, v: [B, Skv, Hkv, D].
    q_positions/kv_positions: absolute token positions (default arange), used
      for the causal mask — lets a KV-cache decode step pass its true offset.
    segment ids: packed-sequence isolation (attend only within same segment).
    kv_valid_len: [B] number of valid cache slots (mask the tail).

    GQA is computed with grouped einsums (q reshaped [B,Sq,Hkv,G,D]) so the
    repeated KV is NEVER materialized — at a 1M-token cache a jnp.repeat
    of KV to 40 heads would move 5+ GB of HBM per layer per decode step.
    """
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    qg = q.reshape(b, sq, hkv, g, d)

    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * scale  # [B, Hkv, G, Sq, Skv]
    if logits_soft_cap is not None:
        logits = logits_soft_cap * jnp.tanh(logits / logits_soft_cap)

    mask = None

    def _and(m, new):
        return new if m is None else jnp.logical_and(m, new)

    if causal:
        qpos = (
            q_positions
            if q_positions is not None
            else jnp.broadcast_to(jnp.arange(sq), (b, sq))
        )
        kpos = (
            kv_positions
            if kv_positions is not None
            else jnp.broadcast_to(jnp.arange(skv), (b, skv))
        )
        mask = _and(mask, kpos[:, None, :] <= qpos[:, :, None])  # [B,Sq,Skv]
    if q_segment_ids is not None:
        mask = _and(
            mask, q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        )
    if kv_valid_len is not None:
        mask = _and(
            mask, jnp.arange(skv)[None, None, :] < kv_valid_len[:, None, None]
        )

    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def decode_attention(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k: jnp.ndarray,  # [B, Skv, Hkv, D]
    v: jnp.ndarray,
    *,
    q_positions: jnp.ndarray,  # [B, 1]
    kv_valid_len: jnp.ndarray,  # [B]
    k_scale: Optional[jnp.ndarray] = None,  # [B, Skv, Hkv, 1] (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-token cache attention as two clean batched dots.

    The general xla_attention einsum ("bqhgd,bkhd->bhgqk") can lower to a
    dilated CONVOLUTION inside the decode scan (layout propagation from
    the stacked cache's dynamic-slice picks a grouped-conv form) — seen in
    the AOT-compiled decode HLO at 128K. This formulation keeps batch dims
    (b, hkv) explicit so the contraction is an unambiguous batched GEMM:
    [G, D] x [D, S] per (b, kv-head). Handles bf16 and int8 caches (scales
    folded after/before the dots, as xla_attention_quant).
    """
    b, sq, hq, d = q.shape
    assert sq == 1, "decode_attention is the Sq==1 path"
    skv, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    qg = q[:, 0].reshape(b, hkv, g, d)

    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    if k_scale is not None:
        logits = jnp.einsum(
            "bhgd,bshd->bhgs", qg.astype(jnp.bfloat16),
            k.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
        )
        logits = logits * jnp.transpose(
            k_scale[..., 0], (0, 2, 1)
        )[:, :, None, :] * scale
    else:
        logits = jnp.einsum(
            "bhgd,bshd->bhgs", qg, k, preferred_element_type=jnp.float32,
        ) * scale

    kpos = jnp.arange(skv)[None]
    mask = jnp.logical_and(
        kpos <= q_positions[:, :1], kpos < kv_valid_len[:, None]
    )  # [B, Skv]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)

    if v_scale is not None:
        probs = probs * jnp.transpose(
            v_scale[..., 0], (0, 2, 1)
        )[:, :, None, :]
    # int8 cache: bf16 operands (the dequant-fused contract of
    # xla_attention_quant); otherwise follow the cache dtype exactly
    pdt = jnp.bfloat16 if v_scale is not None else v.dtype
    out = jnp.einsum(
        "bhgs,bshd->bhgd", probs.astype(pdt), v.astype(pdt),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, 1, hq, d).astype(q.dtype)


def xla_attention_quant(
    q: jnp.ndarray,  # [B, Sq, Hq, D]
    k_q: jnp.ndarray,  # [B, Skv, Hkv, D] int8
    k_scale: jnp.ndarray,  # [B, Skv, Hkv, 1] f32
    v_q: jnp.ndarray,
    v_scale: jnp.ndarray,
    *,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Causal attention against an int8 KV cache, dequant fused into the
    matmuls: logits pick up the per-row k scale AFTER the int8 dot; probs
    pick up the v scale BEFORE the int8 dot — the bf16 cache never
    materializes, so decode reads half the HBM."""
    b, sq, hq, d = q.shape
    skv, hkv = k_q.shape[1], k_q.shape[2]
    g = hq // hkv
    qg = q.reshape(b, sq, hkv, g, d)

    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg.astype(jnp.bfloat16),
        k_q.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )
    # fold in per-(token, head) k scales: [B,Skv,Hkv,1] -> [B,Hkv,1,1,Skv]
    ks = jnp.transpose(k_scale[..., 0], (0, 2, 1))[:, :, None, None, :]
    logits = logits * ks * scale

    qpos = (
        q_positions if q_positions is not None
        else jnp.broadcast_to(jnp.arange(sq), (b, sq))
    )
    kpos = (
        kv_positions if kv_positions is not None
        else jnp.broadcast_to(jnp.arange(skv), (b, skv))
    )
    mask = kpos[:, None, :] <= qpos[:, :, None]
    if kv_valid_len is not None:
        mask = jnp.logical_and(
            mask, jnp.arange(skv)[None, None, :] < kv_valid_len[:, None, None]
        )
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    vs = jnp.transpose(v_scale[..., 0], (0, 2, 1))[:, :, None, None, :]
    probs_scaled = (probs * vs).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs_scaled, v_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def quant_prefill_attention(
    q: jnp.ndarray,
    k_q: jnp.ndarray,
    k_scale: jnp.ndarray,
    v_q: jnp.ndarray,
    v_scale: jnp.ndarray,
    *,
    q_positions: jnp.ndarray,
    kv_valid_len: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Chunked-prefill attention against an int8 KV cache.

    On TPU: the int8-fused flash kernel (per-block VMEM dequantization —
    the whole-slice dequant it replaces was a multi-GB HBM transient that
    capped single-chip context). Elsewhere / tiny chunks: dequantize and
    take the XLA reference path."""
    if _on_tpu() and q.shape[1] >= 128:
        from long_vita_tpu.ops.flash_attention import flash_attention_quant

        return flash_attention_quant(
            q, k_q, k_scale, v_q, v_scale,
            q_offset=q_positions[0, 0],
            kv_valid_len=kv_valid_len[0],
        )
    b = q.shape[0]
    skv = k_q.shape[1]
    k = (k_q.astype(jnp.float32) * k_scale).astype(q.dtype)
    v = (v_q.astype(jnp.float32) * v_scale).astype(q.dtype)
    return xla_attention(
        q, k, v, causal=True,
        q_positions=q_positions,
        kv_positions=jnp.broadcast_to(jnp.arange(skv), (b, skv)),
        kv_valid_len=kv_valid_len,
    )


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Main attention entry point. Shapes as xla_attention.

    impl "short": single-pass non-causal kernel for ViT-length sequences
    — whole k/v resident in VMEM per (b, head) cell, ~1.5x the streaming
    flash kernel's forward at the InternViT shape. Chosen EXPLICITLY by
    forward-only surfaces (serving/eval image encode, frozen-ViT
    training); trainable-ViT paths keep "flash", whose VJP saves padded
    residuals and has the faster backward arrangement (measured:
    benchmarks/train_step_mm.py stage2)."""
    if impl == "auto":
        impl = _pick_impl(q, k, causal, kv_valid_len)
    if impl == "short":
        if (
            _on_tpu()
            and not causal
            and q_segment_ids is None
            and kv_valid_len is None
            and q.shape[1] == k.shape[1] <= 2048
        ):
            from long_vita_tpu.ops.flash_attention import short_attention

            return short_attention(q, k, v)
        impl = _pick_impl(q, k, causal, kv_valid_len)
    if impl == "flash":
        from long_vita_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q,
            k,
            v,
            causal=causal,
            q_positions=q_positions,
            kv_positions=kv_positions,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            kv_valid_len=kv_valid_len[0] if kv_valid_len is not None else None,
        )
    return xla_attention(
        q,
        k,
        v,
        causal=causal,
        q_positions=q_positions,
        kv_positions=kv_positions,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
        kv_valid_len=kv_valid_len,
    )


def _on_tpu() -> bool:
    from long_vita_tpu.ops._target import target_is_tpu

    return target_is_tpu()


def _pick_impl(q, k, causal, kv_valid_len) -> str:
    sq, skv = q.shape[1], k.shape[1]
    d = q.shape[3]
    if not _on_tpu():
        return "xla"
    if sq < 128 or skv < 128:
        return "xla"  # decode / tiny: bandwidth-bound, XLA is optimal
    return "flash"  # wrapper pads ragged seq; kv_valid_len masks the tail
