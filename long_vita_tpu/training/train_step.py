"""Sharded training step.

Replaces the reference's forward_step/loss_func/pretrain glue
(pretrain_long_vita.py:671-903): one jitted function over the (dp, cp, tp)
mesh — GSPMD shards the matmuls (TP/SP), ring attention handles CP, and the
loss reduction is a plain global sum (the CP loss all-reduce + `loss*cp_size`
dance at :802-835 disappears because the arrays stay logically global).

Batch contract (device arrays, already zigzag-permuted when cp > 1):
  tokens       [B, S] int32
  positions    [B, S] int32   (original positions — RoPE-correct under zigzag)
  segment_ids  [B, S] int32   (packed-sequence isolation; all-ones if unpacked)
  logit_positions [B, M] int32 (supervised rows, logits-masked head)
  labels       [B, M] int32   (IGNORE_INDEX padded)
  images       [N, H, W, 3] or None
  image_indices [2, N, T] int32 or None (indices into the PERMUTED sequence)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from long_vita_tpu.config import LongVITAConfig
from long_vita_tpu.models.long_vita import long_vita_forward
from long_vita_tpu.models.qwen2 import ParallelConfig
from long_vita_tpu.parallel.mesh import AXIS_CP, AXIS_DP
from long_vita_tpu.parallel.sharding import long_vita_param_specs
from long_vita_tpu.training.loss import cross_entropy, vocab_parallel_ce

Params = dict[str, Any]


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def loss_fn(
    params: Params,
    batch: dict[str, jnp.ndarray],
    cfg: LongVITAConfig,
    parallel: Optional[ParallelConfig],
    remat: bool,
    vision_chunk: int = 0,
    freeze_vision: bool = False,
    freeze_text: bool = False,
    vocab_parallel: Optional[bool] = None,
):
    if freeze_text:
        # the reference freezes via requires_grad=False, which SKIPS the
        # weight-grad computation entirely; an optimizer mask alone still
        # builds every frozen dW (at 72B stage-1 the lm_head dW alone is a
        # ~5e9-element all-gather per step — caught by aot_fullscale.py).
        # stop_gradient prunes those transposes at trace time while
        # activation grads still flow THROUGH the decoder to the projector.
        params = {**params, "text": jax.lax.stop_gradient(params["text"])}
    # vocab-parallel budget-row loss (reference vocab-parallel CE,
    # core/tensor_parallel/layers.py:151): on tp>1 training meshes the
    # logits GEMM fuses into a tp-sharded shard_map so the [H, 152k]
    # lm_head weight is never all-gathered (it was the largest remaining
    # collective in the stage-4 text artifact, PERF.md). pp meshes keep
    # the plain head (the pipeline owns the last-stage loss layout).
    if vocab_parallel is None:  # auto (tests may force either path)
        vocab_parallel = (
            parallel is not None
            and parallel.mesh.shape.get("pp", 1) == 1
            and parallel.mesh.shape.get("tq", 1) == 1  # 2-D TP keeps the
            # plain head: its lm_head is [H@tq, V@tp] (hidden-contraction
            # psums over tq) — the 1-D vp CE shard_map doesn't model tq
            and parallel.mesh.shape.get(parallel.axis_tp, 1) > 1
            and batch["logit_positions"].shape[1]
            % parallel.mesh.shape.get(parallel.axis_cp, 1) == 0
        )
    out, _, aux = long_vita_forward(
        params,
        batch["tokens"],
        batch["positions"],
        cfg,
        images=batch.get("images"),
        image_indices=batch.get("image_indices"),
        segment_ids=batch.get("segment_ids"),
        logit_positions=batch["logit_positions"],
        vision_chunk=vision_chunk,
        remat=remat,
        parallel=parallel,
        return_aux=True,
        freeze_vision=freeze_vision,
        head=not vocab_parallel,
    )
    if vocab_parallel:
        loss_sum, count = vocab_parallel_ce(
            params["text"]["lm_head"]["kernel"], out, batch["labels"],
            parallel,
        )
    else:
        loss_sum, count = cross_entropy(out, batch["labels"])
    loss = loss_sum / jnp.maximum(count, 1.0)
    if cfg.text.num_experts > 0:
        # MoE load-balancing term (Switch aux loss; reference
        # --moe-aux-loss-coeff plumbing, arguments.py:284-335)
        loss = loss + cfg.text.moe_aux_loss_coef * aux
    return loss, count


def make_parallel_config(
    mesh: Optional[Mesh],
    *,
    cp_algo: str = "ring",
    cp_inner: int = 1,
    cp_window: int = 0,
    virtual_pp: int = 1,
) -> Optional["ParallelConfig"]:
    """Mesh context for the model, or None on a single device.

    ANY multi-device mesh needs the mesh context threaded into the
    model — Pallas (Mosaic) kernels cannot lower outside a shard_map on
    a multi-device mesh, even on dp/tp-only geometries (the 72B dp8xtp8
    AOT compile fails without this). With cp == 1 the attention
    shard_map runs the local flash kernel over (dp, tp) shards. Every
    caller that jits loss_fn against a mesh (train step, grad-accum
    micro-step, Trainer.evaluate) MUST build its config here — a stale
    `use_ring or pp > 1` condition at one call site is a latent
    trace-time crash on exactly the dp/tp-only recipes."""
    if mesh is None or mesh.devices.size <= 1:
        return None
    return ParallelConfig(
        mesh, cp_algo=cp_algo, cp_inner=cp_inner, cp_window=cp_window,
        virtual_pp=virtual_pp,
    )


def make_train_step(
    cfg: LongVITAConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    use_ring: bool = False,
    cp_algo: str = "ring",
    cp_inner: int = 1,
    cp_window: int = 0,
    virtual_pp: int = 1,
    remat: bool = True,
    vision_chunk: int = 0,
    freeze_vision: bool = False,
    freeze_text: bool = False,
):
    """Build the jitted train step. With a mesh, params/batch are expected
    device-put with the sharding rules; the returned fn is donate-safe."""
    pp = mesh.shape.get("pp", 1) if mesh is not None else 1
    parallel = make_parallel_config(
        mesh, cp_algo=cp_algo, cp_inner=cp_inner, cp_window=cp_window,
        virtual_pp=virtual_pp,
    )
    if parallel is not None and pp > 1:
        assert mesh.shape.get("cp", 1) == 1, "PP and CP are mutually exclusive"

    def train_step(state: TrainState, batch):
        if mesh is not None:
            batch = dict(batch)
            for key, spec in (
                ("tokens", P(AXIS_DP, AXIS_CP)),
                ("positions", P(AXIS_DP, AXIS_CP)),
                ("segment_ids", P(AXIS_DP, AXIS_CP)),
            ):
                if batch.get(key) is not None:
                    batch[key] = jax.lax.with_sharding_constraint(
                        batch[key], NamedSharding(mesh, spec)
                    )
        (loss, count), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, cfg, parallel, remat, vision_chunk,
          freeze_vision, freeze_text)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "tokens": count,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_grad_accum_steps(
    cfg: LongVITAConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    use_ring: bool = False,
    cp_algo: str = "ring",
    cp_inner: int = 1,
    cp_window: int = 0,
    virtual_pp: int = 1,
    remat: bool = True,
    vision_chunk: int = 0,
    freeze_vision: bool = False,
    freeze_text: bool = False,
):
    """Gradient accumulation: (grad_fn, apply_fn) for GBS > micro-batch.

    The reference's stage-4 recipe is GBS 8 at micro-batch 1 via Megatron's
    accumulation loop (stage4.sh:131-137) — one fused step over 8 x 1M-token
    rows would hold 8x the activations. grad_fn computes one micro-batch's
    grads (f32 accumulation buffer, the Megatron main-grad convention);
    apply_fn applies the mean of the accumulated grads. Loss semantics:
    mean of per-micro-batch mean losses, matching the reference's
    loss/num_micro reduction (pretrain_long_vita.py:831-838)."""
    parallel = make_parallel_config(
        mesh, cp_algo=cp_algo, cp_inner=cp_inner, cp_window=cp_window,
        virtual_pp=virtual_pp,
    )

    def grad_fn_impl(params, batch):
        if mesh is not None:
            batch = dict(batch)
            for key in ("tokens", "positions", "segment_ids"):
                if batch.get(key) is not None:
                    batch[key] = jax.lax.with_sharding_constraint(
                        batch[key],
                        NamedSharding(mesh, P(AXIS_DP, AXIS_CP)),
                    )
        (loss, count), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, cfg, parallel, remat, vision_chunk, freeze_vision,
          freeze_text)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        return grads, loss, count

    def accum_fn_impl(acc, grads):
        return jax.tree.map(jnp.add, acc, grads)

    def apply_fn_impl(state, grads, loss_sum, count_sum, n_micro):
        grads = jax.tree.map(lambda g: g / n_micro, grads)
        updates, new_opt = tx.update(
            jax.tree.map(
                lambda g, p: g.astype(p.dtype), grads, state.params
            ),
            state.opt_state, state.params,
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss_sum / n_micro,
            "tokens": count_sum,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(new_params, new_opt, state.step + 1), metrics

    grad_fn = jax.jit(grad_fn_impl)
    accum_fn = jax.jit(accum_fn_impl, donate_argnums=(0,))
    apply_fn = jax.jit(apply_fn_impl, donate_argnums=(0, 1))
    return grad_fn, accum_fn, apply_fn


def init_train_state(
    params: Params, tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None, fsdp: bool = False,
    virtual_pp: int = 1,
) -> TrainState:
    """Shard params onto the mesh and build optimizer state.

    With `virtual_pp > 1` on a pp mesh, the text layer stack is relaid
    chunk-major ONCE here (pipeline.permute_layer_stack) — the
    interleaved schedule's pre-permuted storage contract. Everything
    downstream (optimizer state, grads, orbax checkpoints of this run)
    lives in the permuted layout; canonical-order checkpoints convert at
    the restore boundary (training/checkpoint.py layer-layout metadata).
    """
    if mesh is not None:
        pp_size = mesh.shape.get("pp", 1)
        if pp_size > 1 and virtual_pp > 1:
            from long_vita_tpu.parallel.pipeline import permute_layer_stack

            params = {
                **params,
                "text": {
                    **params["text"],
                    "layers": permute_layer_stack(
                        params["text"]["layers"], pp_size, virtual_pp
                    ),
                },
            }
        specs = long_vita_param_specs(
            params, fsdp, pp_size > 1,
            tp2d=mesh.shape.get("tq", 1) > 1,
        )
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
        )
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))
