"""Optimizer construction: AdamW with ViT lr multiplier, per-layer lr decay,
and stage-style freezing.

Reference semantics: `_get_param_groups` override
(long_vita_megatron/core/optimizer/__init__.py:75-127) gives vision-tower
params `--vit-lr-mult` and an exponential per-layer lr decay
(`--vit-layer-decay`); stage scripts freeze the LLM and/or ViT per stage
(pretrain_long_vita.py:660-665, finetune_long_vita.py:532-551).

TPU-native: one optax chain; freezing and multipliers are optax masks /
per-leaf scale trees, so the distributed optimizer (ZeRO-1) falls out of
sharding the optimizer state pytree like the params.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 5e-6
    weight_decay: float = 0.0
    betas: tuple[float, float] = (0.9, 0.95)
    eps: float = 1e-8
    grad_clip: float = 1.0
    warmup_steps: int = 0
    total_steps: int = 1000
    min_lr_ratio: float = 0.0
    vit_lr_mult: float = 1.0
    vit_layer_decay: float = 1.0  # <1.0: deeper ViT layers get higher lr
    freeze_vision: bool = False
    freeze_projector: bool = False
    freeze_text: bool = False
    freeze_embed: bool = False
    lora_only: bool = False  # train ONLY adapter (lora) leaves
    moment_dtype: str = "float32"  # "bfloat16" halves Adam m-state memory


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def trainable_mask(params: Params, cfg: OptimizerConfig) -> Params:
    """True = trainable. Mirrors the reference's stage freeze flags."""

    def rule(path, _):
        p = _path_str(path)
        if cfg.lora_only:
            # parameter-efficient finetuning: only the adapters move
            # (reference --lora-target-modules workflow)
            return "/lora/" in p
        if p.startswith("vision"):
            return not cfg.freeze_vision
        if p.startswith("projector"):
            return not cfg.freeze_projector
        if p.startswith("text/embed") or p.startswith("text/lm_head"):
            return not (cfg.freeze_text or cfg.freeze_embed)
        if p.startswith("text"):
            return not cfg.freeze_text
        return True

    return jax.tree_util.tree_map_with_path(rule, params)


def lr_scale_tree(params: Params, cfg: OptimizerConfig, num_vit_layers: int) -> Params:
    """Per-leaf lr multipliers (ViT lr-mult x layer decay).

    ViT decoder-layer leaves are stacked [L, ...]; the per-layer decay
    becomes a broadcastable [L, 1, ...] factor applied to the update.
    """

    def rule(path, leaf):
        p = _path_str(path)
        if not p.startswith("vision"):
            return 1.0
        mult = cfg.vit_lr_mult
        if cfg.vit_layer_decay != 1.0 and "/layers/" in p:
            l = num_vit_layers
            decay = cfg.vit_layer_decay ** jnp.arange(l - 1, -1, -1)
            shape = [l] + [1] * (leaf.ndim - 1)
            return mult * decay.reshape(shape)
        return mult

    return jax.tree_util.tree_map_with_path(rule, params)


def _scale_by_tree(scales: Params) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    params: Params,
    cfg: OptimizerConfig,
    num_vit_layers: int = 24,
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0 if cfg.warmup_steps else cfg.lr,
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=cfg.lr * cfg.min_lr_ratio,
    )
    import jax.numpy as jnp_

    mu_dtype = {"float32": None, "bfloat16": jnp_.bfloat16}[cfg.moment_dtype]
    chain = [
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps, mu_dtype=mu_dtype
        ),
    ]
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    # freezing folds into the per-leaf scale (scale 0 = frozen): keeps one
    # uniform pytree structure through the whole chain (sharding-friendly)
    mask = trainable_mask(params, cfg)
    scales = lr_scale_tree(params, cfg, num_vit_layers)
    scales = jax.tree.map(
        lambda s, m: s if m else (s * 0.0), scales, mask
    )
    chain.append(_scale_by_tree(scales))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)
