"""Language-model loss with the logits-masked head.

Reference semantics (SURVEY.md C11/C17/C19):
  - instruction shift: labels[t] supervises logits[t-1]
    (gpt_vl_model.py:389-391); our data pipeline pre-shifts labels so
    labels[t] is the target FOR position t's logits.
  - IGNORE_INDEX(-100) rows contribute nothing (constants.py:97)
  - logits-masked LM head (tensor_parallel/layers.py:402-407): select the
    supervised rows BEFORE the vocab GEMM so the [S, 152k] logits tensor
    never materializes at S=1M.

XLA twist: masked_select is dynamic-shape, so the supervised-row budget is
static — callers pass `logit_positions` [B, M] (padded with position 0 and
label IGNORE_INDEX). At inference the same mechanism emits only the final
row. Loss reductions over dp/cp fall out of GSPMD (jnp.sum over the global
array), replacing the reference's explicit CP/DP all-reduces
(pretrain_long_vita.py:802-831).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from long_vita_tpu.constants import IGNORE_INDEX


def cross_entropy(
    logits: jnp.ndarray,  # [B, M, V] f32
    labels: jnp.ndarray,  # [B, M] int, IGNORE_INDEX = masked
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (summed loss, token count), both f32 scalars."""
    mask = labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * mask
    return jnp.sum(nll), jnp.sum(mask).astype(jnp.float32)


def vocab_parallel_ce(
    lm_head_kernel: jnp.ndarray,  # [H, V] (tp-sharded on the vocab dim)
    hidden: jnp.ndarray,          # [B, M, H] gathered budget rows
    labels: jnp.ndarray,          # [B, M] int, IGNORE_INDEX = masked
    parallel,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Budget-row logits GEMM + CE with the lm_head weight kept tp-sharded.

    The reference's vocab-parallel CE (VocabParallelEmbedding + masked
    gather, core/tensor_parallel/layers.py:151): each tp rank computes its
    [B, M, V/tp] logits shard against its own weight shard, the softmax
    normalizer psums over tp, and each label's gold logit comes from the
    one rank whose vocab range contains it. Removes the last known
    training inefficiency (PERF.md): GSPMD previously all-gathered the
    full [5120, 152064] weight (778M elements) per micro-step to form the
    gathered-rows GEMM. Budget rows additionally shard over cp (disjoint
    row blocks), so the GEMM work splits cp*tp ways.

    -> (summed loss, token count), f32 scalars (identical math to
    cross_entropy(lm_head(hidden), labels) — grad-parity tested)."""
    from jax.sharding import PartitionSpec as P

    axis_tp, axis_cp, axis_dp = (
        parallel.axis_tp, parallel.axis_cp, parallel.axis_dp,
    )

    def body(w, h, y):
        tp_i = jax.lax.axis_index(axis_tp)
        vloc = w.shape[1]
        start = tp_i * vloc
        logits = jnp.einsum(
            "bmh,hv->bmv", h, w, preferred_element_type=jnp.float32
        )
        # stable logsumexp across the tp shards; the max offset cancels
        # mathematically, so stop_gradient is exact — applied to pmax's
        # INPUT (pmax has no differentiation rule, so it must see a
        # constant under grad tracing)
        m = jax.lax.pmax(
            jax.lax.stop_gradient(jnp.max(logits, axis=-1)), axis_tp
        )
        sumexp = jax.lax.psum(
            jnp.sum(jnp.exp(logits - m[..., None]), axis=-1), axis_tp
        )
        logz = m + jnp.log(sumexp)
        mask = y != IGNORE_INDEX
        safe = jnp.where(mask, y, 0)
        loc = safe - start
        mine = jnp.logical_and(loc >= 0, loc < vloc)
        gold_local = jnp.take_along_axis(
            logits, jnp.clip(loc, 0, vloc - 1)[..., None], axis=-1
        )[..., 0]
        gold = jax.lax.psum(jnp.where(mine, gold_local, 0.0), axis_tp)
        nll = (logz - gold) * mask
        # rows are disjoint over (dp, cp): psum completes the global sums;
        # tp ranks already agree (gold/logz are psum-merged)
        loss = jax.lax.psum(jnp.sum(nll), (axis_dp, axis_cp))
        count = jax.lax.psum(
            jnp.sum(mask).astype(jnp.float32), (axis_dp, axis_cp)
        )
        return loss, count

    return jax.shard_map(
        body,
        mesh=parallel.mesh,
        in_specs=(P(None, axis_tp), P(axis_dp, axis_cp, None),
                  P(axis_dp, axis_cp)),
        out_specs=(P(), P()),
        check_vma=False,
    )(lm_head_kernel, hidden, labels)


def make_logit_positions(
    labels: jnp.ndarray, budget: int
) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """Host-side helper: pack supervised positions into a [B, budget] tensor.

    Returns (positions [B, budget], packed_labels [B, budget], dropped);
    positions beyond the budget are dropped and COUNTED — callers must size
    the budget from the packing recipe (long-context stages supervise a
    sparse fraction of the sequence, which is the whole point of the
    logits-masked head; dense-SFT stages should set budget = seq_len).
    Unused slots carry IGNORE_INDEX.
    """
    import numpy as np

    labels = np.asarray(labels)
    b, s = labels.shape
    budget = min(budget, s)
    pos = np.zeros((b, budget), np.int32)
    out = np.full((b, budget), IGNORE_INDEX, labels.dtype)
    dropped = 0
    for i in range(b):
        idx = np.nonzero(labels[i] != IGNORE_INDEX)[0]
        dropped += max(len(idx) - budget, 0)
        idx = idx[:budget]
        pos[i, : len(idx)] = idx
        out[i, : len(idx)] = labels[i, idx]
    return pos, out, dropped
