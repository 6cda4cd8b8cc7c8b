"""Parameter and activation sharding rules.

Replaces the reference's Megatron tensor-parallel layer classes
(long_vita_megatron/core/tensor_parallel/layers.py: VocabParallelEmbedding
:151, ColumnParallelLinear :651, row-parallel und sequence-parallel
collectives :389-484) with declarative GSPMD PartitionSpecs: we annotate the
weights once and XLA inserts the same all-gather / reduce-scatter /
all-reduce schedule the reference hand-codes (including sequence
parallelism over the tp axis).

Layout conventions (see models/qwen2.py):
  - decoder layer weights are stacked [L, in, out]
  - column-parallel (q/k/v/gate/up): shard the OUT dim on tp
  - row-parallel (o_proj/down): shard the IN dim on tp
  - embedding/lm_head: shard the vocab dim on tp (Megatron-style vocab
    parallelism; the logits-masked head keeps the gathered rows tiny)
  - ViT + projector: replicated — on TPU the 300M ViT is cheapest run
    data-parallel over the tile batch (no collectives inside the tower),
    unlike the reference's TP-sharded ViT (ckpt_converter_intern_vit.py:28).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from long_vita_tpu.parallel.mesh import AXIS_CP, AXIS_DP, AXIS_TP

Params = dict[str, Any]


def text_param_specs() -> Params:
    """PartitionSpecs matching the pytree of models/qwen2.py params."""
    col = P(None, None, AXIS_TP)  # [L, in, out@tp]
    row = P(None, AXIS_TP, None)  # [L, in@tp, out]
    bias_col = P(None, AXIS_TP)
    rep2 = P(None, None)
    return {
        "embed": {"embedding": P(AXIS_TP, None)},  # vocab-parallel
        "layers": {
            "input_norm": rep2,
            "post_attn_norm": rep2,
            "q_proj": {"kernel": col, "bias": bias_col},
            "k_proj": {"kernel": col, "bias": bias_col},
            "v_proj": {"kernel": col, "bias": bias_col},
            "o_proj": {"kernel": row},
            "gate_proj": {"kernel": col},
            "up_proj": {"kernel": col},
            "down_proj": {"kernel": row},
        },
        "final_norm": P(None),
        "lm_head": {"kernel": P(None, AXIS_TP)},
    }


def _replicate_like(tree: Params) -> Params:
    return jax.tree.map(lambda _: P(), tree)


def long_vita_param_specs(params: Params) -> Params:
    """Specs for the full VLM param pytree (vision/projector replicated)."""
    specs: Params = {"text": text_param_specs()}
    if "vision" in params:
        specs["vision"] = _replicate_like(params["vision"])
        specs["projector"] = _replicate_like(params["projector"])
    return specs


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place a param pytree onto the mesh according to the rules above."""
    specs = long_vita_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> P:
    """tokens/labels [B, S]: batch over dp, sequence over cp."""
    return P(AXIS_DP, AXIS_CP)


def activation_spec() -> P:
    """hidden [B, S, H]."""
    return P(AXIS_DP, AXIS_CP, None)
