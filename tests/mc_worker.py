"""Multi-controller worker: one process of a 2-process CPU cluster.

Spawned by test_multicontroller.py with LVT_COORDINATOR/LVT_NUM_PROCESSES/
LVT_PROCESS_ID set; 4 virtual CPU devices per process -> an 8-device
global mesh (dp2 x cp2 x tp2). Runs the REAL trainer path: local dp rows
-> make_global_batch -> jitted train step, then orbax save/restore.
Prints "STEP <i> LOSS <repr>" lines the test compares against a
single-process 8-device run of the identical batches.
"""
import os
import sys

import re

flags = os.environ.get("XLA_FLAGS", "")
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from long_vita_tpu.training.distributed import (  # noqa: E402
    local_rows,
    make_global_batch,
    maybe_initialize,
)


def main(ckpt_dir: str):
    assert maybe_initialize(), "LVT_COORDINATOR env contract not set"
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    import __graft_entry__ as g
    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.models.long_vita import init_long_vita_params
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
    from long_vita_tpu.training.optimizer import (
        OptimizerConfig,
        make_optimizer,
    )
    from long_vita_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    cfg = tiny_test_config()
    mesh = make_mesh(MeshConfig(dp=2, pp=1, cp=2, tp=2))
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, np.float32)
    tx = make_optimizer(
        params,
        OptimizerConfig(lr=1e-3, warmup_steps=1, total_steps=10),
        num_vit_layers=cfg.vision.num_hidden_layers,
    )
    state = init_train_state(params, tx, mesh)
    step = make_train_step(cfg, tx, mesh, use_ring=True, remat=True)

    seq, batch_rows, seed = 128, 2, 0
    rng = np.random.default_rng(seed)
    losses = []
    for i in range(3):
        full = g._tiny_batch(
            cfg, rng, batch=batch_rows, seq=seq, n_tiles=2, budget=16, cp=2
        )
        if i < 2:  # text-only steps: the bitwise-parity probe
            full["images"] = None
            full["image_indices"] = None
        full = {
            k: (np.asarray(v) if v is not None else None)
            for k, v in full.items()
        }
        local = local_rows(full, mesh, batch_rows)
        batch = make_global_batch(local, mesh, batch_rows, seq)
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])
        losses.append(loss)
        print(f"STEP {i} LOSS {loss!r}", flush=True)

    # orbax save/restore under multi-controller
    from long_vita_tpu.training.checkpoint import (
        latest_step,
        load_checkpoint,
        save_checkpoint,
    )

    save_checkpoint(ckpt_dir, state)
    assert latest_step(ckpt_dir) == int(state.step)
    restored = load_checkpoint(ckpt_dir, state)

    def norm(s):
        return float(jax.jit(
            lambda p: sum(
                jax.numpy.sum(x.astype(jax.numpy.float64) ** 2)
                for x in jax.tree.leaves(p)
            )
        )(s))

    n0, n1 = norm(state.params), norm(restored.params)
    assert n0 == n1, (n0, n1)
    print("CKPT OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
