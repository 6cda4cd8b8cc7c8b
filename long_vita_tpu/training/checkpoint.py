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


def save_checkpoint(directory: str, state: TrainState, step: Optional[int] = None):
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
) -> TrainState:
    """Restore into the (possibly sharded) template `state`."""
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
    """Stage handoff: params from a previous stage, everything else fresh."""
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_template)
        ),
    )
    mgr.close()
    return restored["params"]
