"""Pipeline parallelism: GPipe-style microbatch pipeline over a "pp" axis.

Covers the reference's PP support (SURVEY.md §2b: Megatron PP schedules,
used by the 72B recipe scripts/megatron/qwen25/finetune_qwen25_72b_..._
tp8pp8_stage1.sh; the 14B flagship runs PP=1). TPU-first shape: the stacked
layer dim [L, ...] shards over "pp" (each stage holds L/pp layers), and all
stages run one shard_map program — per step every stage applies its layers
to its in-flight microbatch, then activations `ppermute` one stage down the
chain. M microbatches drain in M + pp - 1 steps (the usual GPipe bubble);
bubble steps compute on zeros (static shapes, results discarded).

Composable with TP (GSPMD shards the per-stage matmuls) and dp; CP+PP
composition is left for when a recipe needs it.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def _shift_down(x, axis_name: str, pp: int):
    """Send to stage s+1; stage 0 receives zeros (no wraparound)."""
    perm = [(i, i + 1) for i in range(pp - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def pipeline_apply(
    stage_params: Params,
    microbatches: jnp.ndarray,  # [M, ...x_shape]
    body_fn: Callable[[Params, jnp.ndarray], jnp.ndarray],
    axis_name: str = "pp",
) -> jnp.ndarray:
    """Run microbatches through the pipeline. Must be called inside
    shard_map with `stage_params` already stage-local (leading layer dim
    L/pp) and `microbatches` replicated over the pp axis.

    body_fn(stage_params, x) applies one stage's layers.
    Returns [M, ...] outputs, valid on every stage (broadcast from the last).
    """
    pp = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    m = microbatches.shape[0]
    steps = m + pp - 1

    def _pvary(x):
        try:
            if axis_name in jax.typeof(x).vma:
                return x
        except Exception:
            return x
        return jax.lax.pvary(x, axis_name)

    x_shape = microbatches.shape[1:]
    # carries become stage-varying (stage-dependent ingest/emit)
    state = _pvary(jnp.zeros(x_shape, microbatches.dtype))
    outputs = _pvary(jnp.zeros_like(microbatches))

    def step_fn(carry, t):
        state, outputs = carry
        # stage 0 ingests microbatch t (clamped; bubble steps feed zeros
        # which are computed and discarded)
        mb_idx = jnp.clip(t, 0, m - 1)
        ingest = jnp.logical_and(stage == 0, t < m)
        x_in = jnp.where(ingest, microbatches[mb_idx], state)

        y = body_fn(stage_params, x_in)

        # last stage emits microbatch t - (pp - 1)
        out_idx = jnp.clip(t - (pp - 1), 0, m - 1)
        emit = jnp.logical_and(stage == pp - 1, t >= pp - 1)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs,
            jnp.where(emit, y, outputs[out_idx]),
            out_idx,
            axis=0,
        )

        state = _shift_down(y, axis_name, pp)
        return (state, outputs), None

    (_, outputs), _ = jax.lax.scan(
        step_fn, (state, outputs), jnp.arange(steps)
    )

    # broadcast final outputs from the last stage to every stage
    full = jax.lax.psum(
        jnp.where(stage == pp - 1, outputs, jnp.zeros_like(outputs)),
        axis_name,
    )
    return full


def split_stages(layer_params: Params, pp: int) -> Params:
    """Host-side: check the stacked layer dim divides into pp stages."""
    leaves = jax.tree.leaves(layer_params)
    l = leaves[0].shape[0]
    assert l % pp == 0, f"{l} layers not divisible by pp={pp}"
    return layer_params
