"""LoRA adapters: add / merge / save / load.

Covers the reference's LoRA flag group (long_vita_megatron/training/
arguments.py:263-281: --lora-r, --lora-alpha, --lora-target-modules,
--lora-load) in the functional stack: adapters are extra {"a", "b"}
entries INSIDE each targeted projection's pytree node, so the stacked
layer scan, serving engine, beam search and pipeline all apply them with
no separate code path (models/qwen2.py:_with_lora). Training freezes
everything except the adapters via an optax mask (optimizer.py
lora_only); merge_lora folds W + A B * alpha/r for export.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from long_vita_tpu.config import TextConfig

Params = dict[str, Any]

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")
ALL_TARGETS = DEFAULT_TARGETS + ("gate_proj", "up_proj", "down_proj")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 32
    targets: Sequence[str] = DEFAULT_TARGETS


def add_lora_params(
    params: Params,
    cfg: TextConfig,
    lcfg: LoraConfig,
    rng: jax.Array,
    dtype=jnp.float32,
) -> tuple[Params, TextConfig]:
    """Attach zero-initialized adapters to the text decoder's projections.

    B starts at zero so the adapted model is EXACTLY the base model at
    step 0 (standard LoRA init); A ~ N(0, 1/r).
    Returns (params, cfg-with-lora-fields).
    """
    layers = params["text"]["layers"]
    keys = iter(jax.random.split(rng, len(lcfg.targets) + 1))
    for t in lcfg.targets:
        if t not in layers:
            raise ValueError(
                f"lora target {t!r} not in decoder layers "
                f"(dense targets: {ALL_TARGETS})"
            )
        kernel = layers[t]["kernel"]  # [L, in, out]
        l, d_in, d_out = kernel.shape
        a = (
            jax.random.normal(next(keys), (l, d_in, lcfg.r), jnp.float32)
            / lcfg.r
        ).astype(dtype)
        b = jnp.zeros((l, lcfg.r, d_out), dtype)
        layers[t]["lora"] = {"a": a, "b": b}
    new_cfg = dataclasses.replace(cfg, lora_r=lcfg.r, lora_alpha=lcfg.alpha)
    return params, new_cfg


def merge_lora(params: Params, cfg: TextConfig) -> Params:
    """Fold every adapter into its base kernel and drop the lora subtrees
    (export / merged serving; reference users merge with peft before
    releasing checkpoints)."""
    if cfg.lora_r == 0:
        return params
    scale = cfg.lora_alpha / cfg.lora_r
    layers = dict(params["text"]["layers"])
    for t, entry in list(layers.items()):
        if not isinstance(entry, dict) or "lora" not in entry:
            continue
        a = entry["lora"]["a"].astype(jnp.float32)
        b = entry["lora"]["b"].astype(jnp.float32)
        kernel = entry["kernel"]
        merged = (
            kernel.astype(jnp.float32) + jnp.einsum("lir,lro->lio", a, b) * scale
        ).astype(kernel.dtype)
        new_entry = {k: v for k, v in entry.items() if k != "lora"}
        new_entry["kernel"] = merged
        layers[t] = new_entry
    return {**params, "text": {**params["text"], "layers": layers}}


def lora_subtree(params: Params) -> Params:
    """Extract only the adapter arrays (the --lora-load artifact)."""
    out: Params = {}
    for t, entry in params["text"]["layers"].items():
        if isinstance(entry, dict) and "lora" in entry:
            out[t] = entry["lora"]
    return out


def save_lora(path: str, params: Params, cfg: TextConfig,
              lcfg: LoraConfig) -> None:
    """Write the adapters as an npz + json meta (tiny, format-stable)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tree = lora_subtree(params)
    flat = {}
    for t, ab in tree.items():
        flat[f"{t}.a"] = np.asarray(ab["a"])
        flat[f"{t}.b"] = np.asarray(ab["b"])
    np.savez(os.path.join(path, "lora_weights.npz"), **flat)
    with open(os.path.join(path, "lora_config.json"), "w") as f:
        json.dump(
            {"r": lcfg.r, "alpha": lcfg.alpha,
             "targets": list(lcfg.targets)}, f,
        )


def load_lora(path: str, params: Params, cfg: TextConfig,
              dtype=jnp.float32) -> tuple[Params, TextConfig]:
    """Attach adapters from a save_lora directory (--lora-load parity)."""
    import json
    import os

    with open(os.path.join(path, "lora_config.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "lora_weights.npz"))
    layers = params["text"]["layers"]
    for t in meta["targets"]:
        layers[t]["lora"] = {
            "a": jnp.asarray(data[f"{t}.a"], dtype),
            "b": jnp.asarray(data[f"{t}.b"], dtype),
        }
    new_cfg = dataclasses.replace(
        cfg, lora_r=meta["r"], lora_alpha=meta["alpha"]
    )
    return params, new_cfg
