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
        return jax.lax.pcast(x, axis_name, to="varying")

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


def _shift_ring(tree, axis_name: str, pp: int):
    """Send to stage (s+1) % pp — the interleaved schedule wraps around
    (chunk c's output on the last stage feeds chunk c+1 on stage 0)."""
    perm = [(i, (i + 1) % pp) for i in range(pp)]
    return jax.tree.map(
        lambda x: jax.lax.ppermute(x, axis_name, perm), tree
    )


def pipeline_apply_interleaved(
    stage_params: Params,
    microbatches: Any,  # pytree, every leaf [M, ...]
    body_fn: Callable[[Params, Any], Any],
    axis_name: str = "pp",
    virtual: int = 2,
    remat_policy: Any = None,
) -> Any:
    """Interleaved (virtual-chunk) pipeline: the reference gets this from
    Megatron core's interleaved 1F1B schedule (SURVEY.md §2b,
    --num-layers-per-virtual-pipeline-stage); this is the TPU-native
    equivalent for the forward pass, with autodiff providing the
    (equally interleaved, time-reversed) backward schedule.

    Each device holds `virtual` chunks of layers laid ROUND-ROBIN over the
    pp ring: virtual stage j = c*pp + d (chunk c, device d) holds global
    layers [j*Lv, (j+1)*Lv). `stage_params` must arrive CHUNK-MAJOR per
    device (rows [c*Lv, (c+1)*Lv) = chunk c) — qwen2._pipelined_decoder
    permutes the stacked layer dim accordingly.

    Lockstep schedule: at tick T, device d serves unit u = T - d with
        m = (u // (pp*v))*pp + u % pp      (microbatch)
        c = (u % (pp*v)) // pp             (local chunk)
    Consecutive virtual stages land exactly one tick and one ring hop
    apart (T(m, j+1) = T(m, j) + 1, device j%pp -> (j+1)%pp), so the
    incoming ppermute value IS the activation a device consumes next tick
    — no reorder buffers. Fresh microbatches ingest at (d=0, c=0);
    finished ones emit at (d=pp-1, c=v-1). M microbatches drain in
    M*v + pp - 1 ticks of 1/v-size work each: the bubble is
    (pp-1)/v microbatch-times vs GPipe's (pp-1) — the same bubble
    shrink Megatron's interleaved schedule buys, without 1F1B's
    depth-first memory bookkeeping (XLA remat owns activation memory).

    Requires M % pp == 0 (Megatron's own interleaving constraint) so the
    round-robin stays dense.
    """
    pp = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    leaves = jax.tree.leaves(microbatches)
    m = leaves[0].shape[0]
    assert m % pp == 0, (
        f"interleaved pipeline needs microbatches ({m}) % pp == 0"
    )
    l_local = jax.tree.leaves(stage_params)[0].shape[0]
    assert l_local % virtual == 0
    l_chunk = l_local // virtual
    u_last = ((m - 1) // pp) * pp * virtual + (virtual - 1) * pp \
        + (m - 1) % pp
    steps = u_last + pp  # + (pp-1) warmup skew + 1

    def _pvary(x):
        try:
            if axis_name in jax.typeof(x).vma:
                return x
        except Exception:
            return x
        return jax.lax.pcast(x, axis_name, to="varying")

    ring = jax.tree.map(
        lambda x: _pvary(jnp.zeros(x.shape[1:], x.dtype)), microbatches
    )
    outputs = jax.tree.map(lambda x: _pvary(jnp.zeros_like(x)), microbatches)

    # Chunk selection must live INSIDE a remat boundary whose input is the
    # loop-invariant full stage stack. Any selected-chunk value that
    # reaches backward as a residual gets stacked per scan tick — measured
    # at 72B tp8xpp8 v2 (benchmarks/aot_fullscale.py): a dynamic_slice at
    # the traced chunk index stacked 23 x ~1.1 GB sliced-weight copies
    # (+26 GB/chip), and a lax.switch over static slices STILL stacked the
    # switch OUTPUT per tick because the per-layer jax.checkpoint inside
    # body_fn saves its weight inputs (bf16[23,5,8192,3696]... in the HLO).
    # With remat_policy set, the whole tick (select + body) is one
    # jax.checkpoint: its residuals are the full stage stack (invariant ->
    # hoisted by scan partial-eval, no copy), the scalar chunk index, the
    # tick input, and the policy-named activations; the backward re-slices
    # and replays the chunk forward once. Callers must then DISABLE
    # per-layer remat inside body_fn — nesting both would recompute the
    # forward twice.
    def _select_chunk(c):
        return jax.tree.map(
            lambda p: jax.lax.dynamic_slice_in_dim(
                p, c * l_chunk, l_chunk, axis=0
            ),
            stage_params,
        )

    if remat_policy is not None:
        def _tick(c, x):
            return body_fn(_select_chunk(c), x)

        run_tick = jax.checkpoint(_tick, policy=remat_policy)
    else:
        # no remat: static slices of the invariant hoist out of the loop
        branches = [
            (lambda c: lambda x: body_fn(jax.tree.map(
                lambda p: jax.lax.slice_in_dim(
                    p, c * l_chunk, (c + 1) * l_chunk, axis=0
                ), stage_params,
            ), x))(c)
            for c in range(virtual)
        ]
        run_tick = lambda c, x: jax.lax.switch(c, branches, x)

    def step_fn(carry, t):
        ring, outputs = carry
        u = t - stage
        mb_idx = (u // (pp * virtual)) * pp + u % pp  # < 0 for u < 0
        c_idx = (u % (pp * virtual)) // pp  # in [0, v) even for u < 0
        valid = jnp.logical_and(mb_idx >= 0, mb_idx < m)
        mb_cl = jnp.clip(mb_idx, 0, m - 1)

        ingest = jnp.logical_and(
            valid, jnp.logical_and(stage == 0, c_idx == 0)
        )
        x_in = jax.tree.map(
            lambda mb, r: jnp.where(ingest, mb[mb_cl], r),
            microbatches, ring,
        )
        y = run_tick(c_idx, x_in)

        emit = jnp.logical_and(
            valid,
            jnp.logical_and(stage == pp - 1, c_idx == virtual - 1),
        )
        outputs = jax.tree.map(
            lambda out, yy: jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(emit, yy, out[mb_cl]), mb_cl, axis=0
            ),
            outputs, y,
        )
        ring = _shift_ring(y, axis_name, pp)
        return (ring, outputs), None

    (_, outputs), _ = jax.lax.scan(
        step_fn, (ring, outputs), jnp.arange(steps)
    )
    return jax.tree.map(
        lambda out: jax.lax.psum(
            jnp.where(stage == pp - 1, out, jnp.zeros_like(out)), axis_name
        ),
        outputs,
    )


def interleave_permutation(n_layers: int, pp: int, virtual: int):
    """Storage permutation for the interleaved schedule: perm[n] is the
    GLOBAL layer index stored at position n, where positions
    [d*(L/pp) + c*Lv + i] hold device d's chunk c (virtual stage c*pp+d,
    global layers [(c*pp+d)*Lv + i]). jnp.take(layers, perm, 0) lays a
    globally-stacked [L, ...] pytree out chunk-major for a P("pp") shard."""
    assert n_layers % (pp * virtual) == 0
    l_v = n_layers // (pp * virtual)
    perm = []
    for d in range(pp):
        for c in range(virtual):
            base = (c * pp + d) * l_v
            perm.extend(range(base, base + l_v))
    return perm


def permute_layer_stack(
    layer_params: Params, pp: int, virtual: int, inverse: bool = False
) -> Params:
    """One-time storage relayout for the interleaved schedule: lay the
    stacked layer dim out chunk-major (interleave_permutation) so each
    stage's P("pp") shard holds its `virtual` chunks contiguously and the
    per-step schedule needs NO cross-stage weight movement. (A runtime
    jnp.take on the pp-sharded stack instead all-gathers the whole stack
    per chip inside the step — 2.4B-element gathers, 102.6 GB/chip at 72B
    tp8xpp8 v2, measured by benchmarks/aot_fullscale.py.)

    Apply once at state init (train_step.init_train_state) or after
    restoring a canonical-order checkpoint; `inverse=True` converts back
    to canonical layer order (HF export, stage handoff into a different
    geometry). Analogue of Megatron-core's per-rank model-chunk param
    grouping for --num-layers-per-virtual-pipeline-stage (SURVEY.md §2b) —
    there the storage is naturally chunk-local per rank; here the single
    SPMD layer stack gets the equivalent layout by permutation."""
    if virtual <= 1:
        return layer_params
    import numpy as np

    n_layers = jax.tree.leaves(layer_params)[0].shape[0]
    perm = np.asarray(interleave_permutation(n_layers, pp, virtual))
    if inverse:
        perm = np.argsort(perm)
    idx = jnp.asarray(perm)
    return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), layer_params)


def split_stages(layer_params: Params, pp: int) -> Params:
    """Host-side: check the stacked layer dim divides into pp stages."""
    leaves = jax.tree.leaves(layer_params)
    l = leaves[0].shape[0]
    assert l % pp == 0, f"{l} layers not divisible by pp={pp}"
    return layer_params
