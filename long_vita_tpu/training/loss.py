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
