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


def text_param_specs(
    fsdp: bool = False, pp: bool = False, moe: bool = False,
    lora_targets: tuple = (), tp2d: bool = False,
) -> Params:
    """PartitionSpecs matching the pytree of models/qwen2.py params.

    fsdp=True additionally shards an INTERIOR dim of each stacked weight
    over dp (the dim tp does not already claim), NOT the layer dim: the
    decoder's lax.scan slices layer i locally and GSPMD inserts a
    per-layer all-gather in the loop body — true ZeRO-3 weight streaming
    (one layer's weights live at a time), with dW reduce-scattered back.
    Sharding the LAYER dim instead makes the scan's dynamic-slice
    cross-shard, and XLA materializes the ENTIRE gathered stack inside
    the loop: at 72B that is ~18 GB/chip of temps, measured by
    benchmarks/aot_fullscale.py --case train-72b (99.5 GB, OOM) vs this
    layout. Replaces the reference's --use-distributed-optimizer (which
    only shards optimizer state).
    pp=True shards the layer dim over the pipeline axis (each stage holds
    its layers); combine with fsdp to shard each stage's slice over dp too.
    """
    from long_vita_tpu.parallel.mesh import AXIS_PP, AXIS_TQ

    ldim = AXIS_PP if pp else None
    fs = AXIS_DP if fsdp else None
    if tp2d:
        # 2-D TP (reference tp_x/tp_y, parallel_state.py:1010-1060):
        # both matrix dims shard; GSPMD emits the SUMMA-style partial
        # GEMMs + reduce-scatters. The interior fsdp dim is already
        # claimed by tq, so the combination is rejected.
        if fsdp or moe:
            raise ValueError("tp2d composes with neither fsdp nor MoE")
        col = P(ldim, AXIS_TQ, AXIS_TP)  # [L, in@tq, out@tp]
        row = P(ldim, AXIS_TP, AXIS_TQ)  # [L, in@tp, out@tq]
    else:
        col = P(ldim, fs, AXIS_TP)  # [L@pp?, in@dp?, out@tp]
        row = P(ldim, AXIS_TP, fs)  # [L@pp?, in@tp, out@dp?]
    # 2-D embed/head: hidden@tq so the token gather LANDS in the hidden-
    # sharded SP layout. Do NOT keep the table 1-D under tp2d — a gather
    # from a [V@tp, H] table immediately resharded to hidden@tq
    # mispartitions in XLA's SPMD gather path (measured 0.078 max-abs
    # embedding corruption on an 8-way CPU mesh; the 2-D table is exact
    # AND the better layout).
    head_in = AXIS_TQ if tp2d else None
    embed_h = AXIS_TQ if tp2d else None
    bias_col = P(ldim, AXIS_TP)
    norm = P(ldim, fs)
    vocab = P((AXIS_TP, AXIS_DP) if fsdp else AXIS_TP, embed_h)
    layers = {
        "input_norm": norm,
        "post_attn_norm": norm,
        "q_proj": {"kernel": col, "bias": bias_col},
        "k_proj": {"kernel": col, "bias": bias_col},
        "v_proj": {"kernel": col, "bias": bias_col},
        "o_proj": {"kernel": row},
    }
    if moe:
        # EP claims the dp axis for the expert dim (so no fsdp-over-L on
        # the expert stacks); intermediate still shards over tp like the
        # dense col/row split
        layers["router"] = {"kernel": P(None, None, None)}
        layers["experts"] = {
            "gate": P(None, AXIS_DP, None, AXIS_TP),
            "up": P(None, AXIS_DP, None, AXIS_TP),
            "down": P(None, AXIS_DP, AXIS_TP, None),
        }
    else:
        layers["gate_proj"] = {"kernel": col}
        layers["up_proj"] = {"kernel": col}
        layers["down_proj"] = {"kernel": row}
    for t in lora_targets:
        # adapters are tiny (rank r): replicate except the pp layer dim
        # (not worth fsdp-streaming)
        layers[t]["lora"] = {
            "a": P(ldim, None, None),
            "b": P(ldim, None, None),
        }
    return {
        "embed": {"embedding": vocab},  # vocab-parallel
        "layers": layers,
        "final_norm": P(None),
        "lm_head": {
            "kernel": P(
                head_in, (AXIS_TP, AXIS_DP) if fsdp else AXIS_TP
            )
        },
    }


def _replicate_like(tree: Params) -> Params:
    return jax.tree.map(lambda _: P(), tree)


def long_vita_param_specs(
    params: Params, fsdp: bool = False, pp: bool = False,
    tp2d: bool = False,
) -> Params:
    """Specs for the full VLM param pytree (vision/projector replicated —
    the 300M tower is cheaper gathered than streamed)."""
    layer_params = params["text"]["layers"]
    moe = "router" in layer_params
    lora_targets = tuple(
        t for t, e in layer_params.items()
        if isinstance(e, dict) and "lora" in e
    )
    specs: Params = {
        "text": text_param_specs(fsdp, pp, moe, lora_targets, tp2d)
    }
    if "vision" in params:
        specs["vision"] = _replicate_like(params["vision"])
        specs["projector"] = _replicate_like(params["projector"])
    if any(("kernel_q" in e or "kernel_p4" in e)
           for e in layer_params.values() if isinstance(e, dict)):
        # quantized serving tree (models/quantize.py): kernel_q /
        # kernel_p4 keep the kernel's spec; scales follow (see adapter)
        from long_vita_tpu.models.quantize import quantized_param_specs

        specs = quantized_param_specs(params, specs)
    return specs


def shard_params(
    params: Params, mesh: Mesh, fsdp: bool = False, pp: bool = False
) -> Params:
    """Place a param pytree onto the mesh according to the rules above."""
    specs = long_vita_param_specs(
        params, fsdp, pp, tp2d=mesh.shape.get("tq", 1) > 1
    )
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> P:
    """tokens/labels [B, S]: batch over dp, sequence over cp."""
    return P(AXIS_DP, AXIS_CP)


def activation_spec() -> P:
    """hidden [B, S, H]."""
    return P(AXIS_DP, AXIS_CP, None)
