"""Ulysses (DeepSpeed-style) context parallelism: head-scatter all-to-all.

The reference's `ulysses_cp_algo` (SURVEY.md §2b): each cp rank holds a
contiguous sequence shard; an all-to-all swaps the sharding from sequence to
heads, every rank runs FULL-sequence attention for its head subset, and a
second all-to-all swaps back (MindSpeed UlyssesContextAttention + the GQA
KV-repeat wrapper, dot_product_attention.py:131-148).

vs ring attention: one big a2a instead of cp ppermute steps — lower latency
at moderate context, but head-count-bound (cp must divide the repeated KV
head count) and the full sequence must fit one chip's attention working set.
Sequence shards are CONTIGUOUS (no zigzag) — causal balance is irrelevant
because every rank sees the full sequence.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from long_vita_tpu.ops.attention import dot_product_attention


def _repeat_kv_heads(k: jnp.ndarray, target: int) -> jnp.ndarray:
    """[B, S, Hkv, D] -> [B, S, target, D] (GQA repeat for divisibility)."""
    hkv = k.shape[2]
    if hkv >= target:
        return k
    assert target % hkv == 0, (hkv, target)
    return jnp.repeat(k, target // hkv, axis=2)


def ulysses_attention(
    q: jnp.ndarray,  # local [B, S/cp, Hq, D]
    k: jnp.ndarray,  # local [B, S/cp, Hkv, D]
    v: jnp.ndarray,
    axis_name: str = "cp",
    q_segment_ids: Optional[jnp.ndarray] = None,  # local [B, S/cp]
    kv_segment_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Causal attention over the full sequence via head-parallel a2a.

    Must run inside shard_map with the sequence dim sharded contiguously on
    `axis_name`. Returns the local output shard [B, S/cp, Hq, D].
    """
    cp = jax.lax.axis_size(axis_name)
    b, s_local, hq, d = q.shape
    assert hq % cp == 0, f"q heads {hq} not divisible by cp {cp}"

    k = _repeat_kv_heads(k, cp)
    v = _repeat_kv_heads(v, cp)

    def scatter_heads(x):  # [B, s/cp, H, D] -> [B, S, H/cp, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    def gather_seq(x):  # [B, S, H/cp, D] -> [B, s/cp, H, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    qg = scatter_heads(q)
    kg = scatter_heads(k)
    vg = scatter_heads(v)

    segs = {}
    if q_segment_ids is not None:
        # segment ids are head-agnostic: all-gather the sequence dim
        full_q_seg = jax.lax.all_gather(
            q_segment_ids, axis_name, axis=1, tiled=True
        )
        full_kv_seg = jax.lax.all_gather(
            kv_segment_ids, axis_name, axis=1, tiled=True
        )
        segs = dict(q_segment_ids=full_q_seg, kv_segment_ids=full_kv_seg)

    out = dot_product_attention(qg, kg, vg, causal=True, **segs)
    return gather_seq(out)
