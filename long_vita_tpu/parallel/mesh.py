"""Device mesh construction: the TPU-native replacement for the reference's
NCCL process-group taxonomy (long_vita_megatron/core/parallel_state.py:51-1060,
SURVEY.md N1).

Where the reference builds eight explicit NCCL groups (tp/pp/dp/cp/cp2/
cp-ulysses/cp-ring/exp), a TPU slice needs exactly one named mesh:

    axes = (dp, cp, tp)

  - "tp"  — tensor parallel, innermost (fastest ICI hops): weight-sharded
    matmuls, GSPMD inserts the all-gather/reduce-scatters the reference
    hand-codes in tensor_parallel/layers.py (sequence parallelism included).
  - "cp"  — context parallel: the sequence dimension of activations; ring
    attention rotates KV over this axis with ppermute (ops/ring_attention.py).
  - "dp"  — data parallel, outermost (can span DCN); optimizer-state
    sharding (ZeRO-1/FSDP) also lives here.

Pipeline parallelism is deliberately absent: on TPU the idiomatic scaling
path for a 14B model is FSDP(dp) x CP x TP over ICI (SURVEY.md §5
"distributed communication backend"). The reference's PP=1 configs for the
14B model agree.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_PP = "pp"
AXIS_CP = "cp"
AXIS_TP = "tp"
AXIS_TQ = "tq"  # second tensor-parallel factor (2-D TP; size 1 = off)
AXES = (AXIS_DP, AXIS_PP, AXIS_CP, AXIS_TP, AXIS_TQ)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    pp: int = 1
    cp: int = 1
    tp: int = 1
    # 2-D tensor parallelism: the reference reserves a tp_x x tp_y
    # factorization (parallel_state.py:1010-1060, init commented out —
    # vestigial there). Here tq is the second factor: weights shard over
    # BOTH matrix dims (col kernels [L, in@tq, out@tp], row kernels
    # [L, in@tp, out@tq]) and the SP activation layout adds hidden@tq, so
    # GSPMD derives the SUMMA-style two-stage collectives the reference
    # would have hand-coded. tq=1 leaves every 1-D geometry untouched.
    tq: int = 1

    @property
    def size(self) -> int:
        return self.dp * self.pp * self.cp * self.tp * self.tq


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the (dp, cp, tp) mesh.

    With no config, all local devices become cp (the long-context default).
    Axis order (dp outermost, tp innermost) matches ICI locality: tp traffic
    is densest, cp is ring-structured, dp is bulk gradient reduction.
    """
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(cp=len(devices))
    if cfg.size != len(devices):
        raise ValueError(
            f"mesh {cfg} needs {cfg.size} devices, have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(
        cfg.dp, cfg.pp, cfg.cp, cfg.tp, cfg.tq
    )
    return Mesh(arr, AXES)


def validate_geometry(
    text_cfg, mesh_cfg: MeshConfig, seq_len: int = 0, virtual_pp: int = 1
):
    """Fail fast when a model geometry cannot shard over a mesh.

    The reference validates these per-flag in arguments.py (_validate_cp_args
    :172-254 + TP divisibility asserts inside tensor_parallel/layers.py);
    here one call covers the 72B tp8/pp8 recipe class before any compile.
    """
    errs = []
    tp, pp, cp = mesh_cfg.tp, mesh_cfg.pp, mesh_cfg.cp
    if text_cfg.num_attention_heads % tp:
        errs.append(
            f"attention heads {text_cfg.num_attention_heads} % tp {tp} != 0"
        )
    if text_cfg.num_key_value_heads % tp and tp % text_cfg.num_key_value_heads:
        errs.append(
            f"kv heads {text_cfg.num_key_value_heads} incompatible with tp "
            f"{tp} (need kv%tp==0 or tp%kv==0)"
        )
    if text_cfg.vocab_size % tp:
        errs.append(f"vocab {text_cfg.vocab_size} % tp {tp} != 0")
    if text_cfg.intermediate_size % tp:
        errs.append(
            f"intermediate {text_cfg.intermediate_size} % tp {tp} != 0"
        )
    if text_cfg.num_hidden_layers % (pp * max(virtual_pp, 1)):
        errs.append(
            f"layers {text_cfg.num_hidden_layers} % (pp {pp} * virtual_pp "
            f"{virtual_pp}) != 0"
        )
    if pp > 1 and cp > 1:
        errs.append("pp and cp are mutually exclusive (pipeline runs cp=1)")
    if seq_len and cp > 1 and seq_len % (2 * cp):
        errs.append(
            f"seq_len {seq_len} % 2*cp {2 * cp} != 0 (zigzag needs 2cp "
            "equal chunks)"
        )
    if mesh_cfg.tq > 1:
        if text_cfg.hidden_size % mesh_cfg.tq:
            errs.append(
                f"hidden {text_cfg.hidden_size} % tq {mesh_cfg.tq} != 0"
            )
        if pp > 1:
            errs.append("2-D TP (tq > 1) does not compose with pp")
        if getattr(text_cfg, "num_experts", 0) > 0:
            errs.append("2-D TP (tq > 1) does not compose with MoE/EP")
    if errs:
        raise ValueError(
            "model geometry cannot shard over mesh "
            f"{mesh_cfg}: " + "; ".join(errs)
        )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
