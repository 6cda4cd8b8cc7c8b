"""Hybrid context parallelism: Ulysses within nodes x ring across nodes.

The reference's `hybrid_cp_algo` (SURVEY.md §2b; group construction at
core/parallel_state.py:315-376 keeps Ulysses ranks intra-node): the cp axis
factors into (ring groups x inner lanes). An all-to-all inside each inner
group swaps sequence-sharding for head-sharding (one hop, rides the fast
intra-node ICI), then zigzag ring attention runs across the groups with
2*inner-times-larger chunks (fewer, bigger ring steps across nodes), and a
second all-to-all restores the layout.

Data layout expectation: the global sequence is zigzag-permuted over the
ring GROUPS (cp // inner), and each group's chunk pair is split
contiguously over its lanes — exactly `zigzag_permute(x, cp // inner)`
followed by plain P("cp") sharding.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from long_vita_tpu.ops.ring_attention import ring_attention
from long_vita_tpu.ops.ulysses import _repeat_kv_heads


def hybrid_attention(
    q: jnp.ndarray,  # local [B, S/cp, Hq, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "cp",
    inner: int = 2,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    window: int = 0,
) -> jnp.ndarray:
    """Causal hybrid-CP attention. Must run inside shard_map over axis_name.

    window: double-ring window over the OUTER ring groups (0 = plain)."""
    cp = jax.lax.axis_size(axis_name)
    assert cp % inner == 0, (cp, inner)
    groups = [
        list(range(g * inner, (g + 1) * inner))
        for g in range(cp // inner)
    ]
    hq = q.shape[2]
    assert hq % inner == 0, f"q heads {hq} not divisible by inner {inner}"

    k = _repeat_kv_heads(k, inner)
    v = _repeat_kv_heads(v, inner)

    def scatter_heads(x):  # [B, s, H, D] -> [B, s*inner, H/inner, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True,
            axis_index_groups=groups,
        )

    def gather_seq(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True,
            axis_index_groups=groups,
        )

    qg, kg, vg = scatter_heads(q), scatter_heads(k), scatter_heads(v)

    have_segs = q_segment_ids is not None
    if have_segs:
        qs = jax.lax.all_gather(
            q_segment_ids, axis_name, axis=1, tiled=True,
            axis_index_groups=groups,
        )
        ks = jax.lax.all_gather(
            kv_segment_ids, axis_name, axis=1, tiled=True,
            axis_index_groups=groups,
        )
        out = ring_attention(qg, kg, vg, axis_name, True, inner, qs, ks,
                             window)
    else:
        out = ring_attention(qg, kg, vg, axis_name, False, inner, None, None,
                             window)
    return gather_seq(out)
