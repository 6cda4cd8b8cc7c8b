"""Pipeline parallelism: GPipe-style microbatch pipeline over a "pp" axis.

Covers the reference's PP support (SURVEY.md §2b: Megatron PP schedules,
used by the 72B recipe scripts/megatron/qwen25/finetune_qwen25_72b_..._
tp8pp8_stage1.sh; the 14B flagship runs PP=1). TPU-first shape: the stacked
layer dim [L, ...] shards over "pp" (each stage holds L/pp layers), and all
stages run one shard_map program — per step every stage applies its layers
to its in-flight microbatch, then the (activation + per-microbatch metadata)
pytree `ppermute`s one stage down the chain. M microbatches drain in
M + pp - 1 steps (the usual GPipe bubble); bubble steps compute on zeros
(static shapes, results discarded).

Composes with TP/dp via partial-manual shard_map (axis_names={"pp"}): the
other mesh axes stay in GSPMD-auto mode inside the pipeline body.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def _shift_down(tree, axis_name: str, pp: int):
    """Send to stage s+1; stage 0 receives zeros (no wraparound)."""
    perm = [(i, i + 1) for i in range(pp - 1)]
    return jax.tree.map(
        lambda x: jax.lax.ppermute(x, axis_name, perm), tree
    )


def pipeline_apply(
    stage_params: Params,
    microbatches: Any,  # pytree, every leaf [M, ...]
    body_fn: Callable[[Params, Any], Any],
    axis_name: str = "pp",
) -> Any:
    """Run microbatches through the pipeline. Must be called inside
    shard_map with `stage_params` already stage-local (leading layer dim
    L/pp) and `microbatches` replicated over the pp axis.

    body_fn(stage_params, mb_tree) applies one stage's layers and must
    return a pytree of the SAME structure (per-microbatch metadata like
    positions passes through unchanged — it travels the ring with the
    activations so each stage sees its in-flight microbatch's metadata).
    Returns the [M, ...] output pytree, valid on every stage (broadcast
    from the last).
    """
    pp = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    leaves = jax.tree.leaves(microbatches)
    m = leaves[0].shape[0]
    steps = m + pp - 1

    def _pvary(x):
        try:
            if axis_name in jax.typeof(x).vma:
                return x
        except Exception:
            return x
        return jax.lax.pvary(x, axis_name)

    # carries become stage-varying (stage-dependent ingest/emit)
    state = jax.tree.map(
        lambda x: _pvary(jnp.zeros(x.shape[1:], x.dtype)), microbatches
    )
    outputs = jax.tree.map(lambda x: _pvary(jnp.zeros_like(x)), microbatches)

    def step_fn(carry, t):
        state, outputs = carry
        # stage 0 ingests microbatch t (clamped; bubble steps feed zeros
        # which are computed and discarded)
        mb_idx = jnp.clip(t, 0, m - 1)
        ingest = jnp.logical_and(stage == 0, t < m)
        x_in = jax.tree.map(
            lambda mb, st: jnp.where(ingest, mb[mb_idx], st),
            microbatches, state,
        )

        y = body_fn(stage_params, x_in)

        # last stage emits microbatch t - (pp - 1)
        out_idx = jnp.clip(t - (pp - 1), 0, m - 1)
        emit = jnp.logical_and(stage == pp - 1, t >= pp - 1)
        outputs = jax.tree.map(
            lambda out, yy: jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(emit, yy, out[out_idx]), out_idx, axis=0
            ),
            outputs, y,
        )

        state = _shift_down(y, axis_name, pp)
        return (state, outputs), None

    (_, outputs), _ = jax.lax.scan(
        step_fn, (state, outputs), jnp.arange(steps)
    )

    # broadcast final outputs from the last stage to every stage
    return jax.tree.map(
        lambda out: jax.lax.psum(
            jnp.where(stage == pp - 1, out, jnp.zeros_like(out)), axis_name
        ),
        outputs,
    )


def split_stages(layer_params: Params, pp: int) -> Params:
    """Host-side: check the stacked layer dim divides into pp stages."""
    leaves = jax.tree.leaves(layer_params)
    l = leaves[0].shape[0]
    assert l % pp == 0, f"{l} layers not divisible by pp={pp}"
    return layer_params
