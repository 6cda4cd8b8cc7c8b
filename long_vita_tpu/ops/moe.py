"""Mixture-of-experts MLP with expert parallelism.

The reference plumbs MoE/EP without using it in any Long-VITA recipe
(SURVEY.md §2b: EP group regeneration parallel_state.py:123-169, MoE flag
groups arguments.py:284-335). This is the TPU-native counterpart, kept as a
drop-in replacement for the dense SwiGLU `_mlp_block`:

  - top-k softmax routing with optional capacity factor
  - capacity-based dispatch/combine as einsums (one-hot matmuls land on the
    MXU; no scatter/gather scalar loops)
  - expert parallelism: experts shard over a mesh axis inside shard_map;
    tokens move via all_to_all exactly twice (dispatch + return)

Dropped tokens (over capacity) fall through on the residual path, the
standard Switch/GShard behavior. Note the capacity unit differs by mode:
local mode budgets `capacity_factor` over the whole batch, EP mode per rank
— under tight capacity the two modes may drop different copies (outputs are
identical whenever nothing drops).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def init_moe_params(
    rng: jax.Array,
    num_experts: int,
    hidden: int,
    intermediate: int,
    dtype=jnp.float32,
) -> Params:
    ks = jax.random.split(rng, 4)

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "router": {"kernel": dense(ks[0], (hidden, num_experts))},
        "experts": {
            "gate": dense(ks[1], (num_experts, hidden, intermediate)),
            "up": dense(ks[2], (num_experts, hidden, intermediate)),
            "down": dense(ks[3], (num_experts, intermediate, hidden)),
        },
    }


def _expert_mlp(experts: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [E, C, H] -> [E, C, H] (batched per-expert SwiGLU)."""
    gate = jnp.einsum("ech,ehi->eci", x, experts["gate"])
    up = jnp.einsum("ech,ehi->eci", x, experts["up"])
    return jnp.einsum("eci,eih->ech", jax.nn.silu(gate) * up, experts["down"])


def moe_mlp(
    params: Params,
    x: jnp.ndarray,  # [B, S, H]
    *,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    axis_name: Optional[str] = None,  # expert-parallel axis (inside shard_map)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (output [B, S, H], aux_loss scalar (load-balancing))."""
    b, s, h = x.shape
    n_tok = b * s
    xe = x.reshape(n_tok, h)
    num_experts = params["router"]["kernel"].shape[-1]
    capacity = max(
        int(capacity_factor * n_tok * top_k / num_experts), top_k
    )

    logits = (xe @ params["router"]["kernel"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # [N, E]
    gate_vals, expert_ids = jax.lax.top_k(probs, top_k)  # [N, K]

    # load-balancing aux loss (Switch): E * sum(fraction * mean_prob)
    one_hot = jax.nn.one_hot(expert_ids, num_experts, dtype=jnp.float32)
    tokens_per_expert = one_hot.sum(axis=(0, 1)) / (n_tok * top_k)
    mean_probs = probs.mean(axis=0)
    aux_loss = num_experts * jnp.sum(tokens_per_expert * mean_probs)

    # capacity slots: position of each (token, k) within its expert queue
    flat_ids = expert_ids.reshape(-1)  # [N*K], token-major
    flat_onehot = jax.nn.one_hot(flat_ids, num_experts, dtype=jnp.int32)
    slot = jnp.cumsum(flat_onehot, axis=0) * flat_onehot - 1  # [N*K, E]
    slot = slot.max(axis=-1)  # slot index within the chosen expert
    keep = slot < capacity
    gates = gate_vals.reshape(-1) * keep

    # dispatch tensor [E, NK, C]: one-hot (expert, slot) per routed copy
    slot_oh = jax.nn.one_hot(
        jnp.where(keep, slot, capacity), capacity, dtype=xe.dtype
    )  # [N*K, C] (dropped -> out of range -> all-zero row)
    disp = jnp.einsum("te,tc->etc", flat_onehot.astype(xe.dtype), slot_oh)
    xk = jnp.repeat(xe, top_k, axis=0)  # [N*K, H] token-major k copies
    expert_in = jnp.einsum("etc,th->ech", disp, xk)  # [E, C, H]

    if axis_name is not None:
        # Expert parallelism (inside shard_map): this rank holds
        # E_local = E/ep experts' params and its local tokens' dispatch for
        # ALL E experts. tiled all_to_all over the expert dim routes each
        # expert's slots to its owner; received rows arrive source-rank-
        # major, so regroup [ep, E_local, C, H] -> [E_local, ep*C, H]
        # before the local-expert GEMMs, and invert on the way back.
        ep = jax.lax.axis_size(axis_name)
        e_local = params["experts"]["gate"].shape[0]
        expert_in = jax.lax.all_to_all(
            expert_in, axis_name, split_axis=0, concat_axis=0, tiled=True
        )  # [ep*E_local, C, H], leading dim = source rank
        expert_in = (
            expert_in.reshape(ep, e_local, capacity, h)
            .transpose(1, 0, 2, 3)
            .reshape(e_local, ep * capacity, h)
        )
        expert_out = _expert_mlp(params["experts"], expert_in)
        expert_out = (
            expert_out.reshape(e_local, ep, capacity, h)
            .transpose(1, 0, 2, 3)
            .reshape(ep * e_local, capacity, h)
        )
        expert_out = jax.lax.all_to_all(
            expert_out, axis_name, split_axis=0, concat_axis=0, tiled=True
        )  # back to [E, C, H] in this rank's original expert order
    else:
        expert_out = _expert_mlp(params["experts"], expert_in)

    combined = jnp.einsum(
        "etc,ech->th", disp, expert_out
    ) * gates[:, None]  # [N*K, H]
    out = combined.reshape(n_tok, top_k, h).sum(axis=1)
    return out.reshape(b, s, h).astype(x.dtype), aux_loss
