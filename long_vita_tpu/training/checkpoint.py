"""Training checkpointing (orbax) with stage-handoff semantics.

Replaces the reference's forked Megatron checkpointing
(long_vita_megatron/training/checkpointing.py: save_checkpoint:271 /
load_checkpoint:635): no mp_rank_XX shard directories — orbax writes one
sharding-annotated array store that reloads under any mesh.

Stage handoff (reference stage scripts: CKPT_LOAD_DIR = previous stage +
--no-load-optim --no-load-rng --finetune): `load(..., load_optim=False)`
restores params only and keeps the fresh optimizer state. The separate
--vit-load stream (pretrain_long_vita.py:392-393) is unnecessary — vision
params live in the same pytree; partial restores are supported by
`restore_params_only`.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from long_vita_tpu.training.train_step import TrainState


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def _layout_path(directory: str) -> str:
    return os.path.join(os.path.abspath(directory), "layer_layout.json")


def _read_layout(directory: str) -> tuple[int, int]:
    """Stored (pp, virtual_pp) layer-stack layout; canonical if absent."""
    import json

    path = _layout_path(directory)
    if not os.path.exists(path):
        return (1, 1)
    with open(path) as f:
        d = json.load(f)
    return (int(d["pp"]), int(d["virtual_pp"]))


def save_checkpoint(
    directory: str,
    state: TrainState,
    step: Optional[int] = None,
    *,
    layer_layout: tuple[int, int] = (1, 1),
):
    """`layer_layout=(pp, virtual_pp)` records the layer-stack storage
    order of interleaved-pipeline runs (pipeline.permute_layer_stack):
    their params/opt_state are saved CHUNK-MAJOR, not canonical. The
    layout rides next to the orbax store so a restore into a different
    geometry fails loudly instead of silently scrambling layer order."""
    import json

    step = int(state.step) if step is None else step
    mgr = _manager(directory)
    mgr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(state.params),
            opt_state=ocp.args.StandardSave(state.opt_state),
            step=ocp.args.ArraySave(np.asarray(step)),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()
    with open(_layout_path(directory), "w") as f:
        json.dump(
            {"pp": layer_layout[0], "virtual_pp": layer_layout[1]}, f
        )


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_checkpoint(
    directory: str,
    state: TrainState,
    *,
    load_optim: bool = True,
    step: Optional[int] = None,
    layer_layout: tuple[int, int] = (1, 1),
) -> TrainState:
    """Restore into the (possibly sharded) template `state`.

    `layer_layout` is the CURRENT run's (pp, virtual_pp) layer-stack
    storage order; it must match the checkpoint's recorded layout —
    optimizer moments cannot be re-laid here (use restore_params_only
    for cross-geometry stage handoff, which converts params to the
    canonical order)."""
    stored = _read_layout(directory)
    if stored != tuple(layer_layout):
        raise ValueError(
            f"checkpoint {directory} stores layer stacks in interleave "
            f"layout (pp, virtual_pp)={stored} but this run uses "
            f"{tuple(layer_layout)}; resume requires the same geometry — "
            "for a stage handoff into a new geometry use "
            "restore_params_only (params convert via canonical order; "
            "optimizer state starts fresh)"
        )
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {directory}")
    targets = {
        "params": ocp.args.StandardRestore(state.params),
    }
    if load_optim:
        targets["opt_state"] = ocp.args.StandardRestore(state.opt_state)
    restored = mgr.restore(step, args=ocp.args.Composite(**targets))
    mgr.close()
    new_state = TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"] if load_optim else state.opt_state,
        step=(
            jax.numpy.asarray(step, jax.numpy.int32)
            if load_optim else state.step
        ),
    )
    return new_state


def restore_params_only(directory: str, params_template: Any,
                        step: Optional[int] = None) -> Any:
    """Stage handoff: params from a previous stage, everything else fresh.

    Always returns CANONICAL layer order: if the source run stored its
    stacks chunk-major (interleaved pp), the inverse permutation is
    applied here, so the new stage's init_train_state can re-lay them
    for ITS geometry (train.py load_stage -> Trainer)."""
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_template)
        ),
    )
    mgr.close()
    params = restored["params"]
    pp, virtual = _read_layout(directory)
    if virtual > 1:
        from long_vita_tpu.parallel.pipeline import permute_layer_stack

        params = {
            **params,
            "text": {
                **params["text"],
                "layers": permute_layer_stack(
                    params["text"]["layers"], pp, virtual, inverse=True
                ),
            },
        }
    return params
