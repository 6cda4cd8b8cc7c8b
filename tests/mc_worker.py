"""Multi-controller worker: one process of a 2-process CPU cluster.

Spawned by test_multicontroller.py with LVT_COORDINATOR/LVT_NUM_PROCESSES/
LVT_PROCESS_ID set; 4 virtual CPU devices per process -> an 8-device
global mesh in one of the mc_geoms.GEOMS geometries (dp/cp/tp grid, fsdp
weight streaming, GPipe pp, or the stage-4-shaped dp=1 grid). Runs the
REAL trainer path: local dp rows -> make_global_batch -> jitted train
step, then (geometry-gated) orbax save/restore. Prints "STEP <i> LOSS
<repr>" lines the test compares against a single-process 8-device run of
the identical batches.

run_steps() is importable by the test process for the single-process
reference (env mutation only happens under __main__).
"""
import os
import sys


def _setup_env():
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the container sitecustomize pre-imports jax with JAX_PLATFORMS=axon;
    # env vars alone are too late — override through jax.config (backends
    # are lazy, so this still wins)
    import jax

    jax.config.update("jax_platforms", "cpu")


if __name__ == "__main__":
    _setup_env()

import numpy as np  # noqa: E402

try:
    from tests.mc_geoms import GEOMS
except ImportError:  # run as a script from the tests dir
    from mc_geoms import GEOMS

N_TILES = 4
SEQ = 128


def run_steps(geom: dict, feed, ckpt_dir=None):
    """Run 3 train steps of the geometry; feed(full_np_batch) -> device
    batch. Returns the list of losses. Steps 0-1 are text-only (the
    bitwise-parity probe); step 2 is multimodal when the geometry says so
    (asymmetric tiles: 3 in dp row 0, 1 in the last row)."""
    import jax

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
    mesh = make_mesh(MeshConfig(
        dp=geom["dp"], pp=geom["pp"], cp=geom["cp"], tp=geom["tp"]
    ))
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, np.float32)
    tx = make_optimizer(
        params,
        OptimizerConfig(lr=1e-3, warmup_steps=1, total_steps=10),
        num_vit_layers=cfg.vision.num_hidden_layers,
    )
    state = init_train_state(params, tx, mesh, fsdp=geom["fsdp"])
    step = make_train_step(
        cfg, tx, mesh, use_ring=geom["cp"] > 1, remat=True,
        freeze_vision=geom["pp"] > 1,
    )
    rng = np.random.default_rng(0)
    losses = []
    for i in range(3):
        full = g._tiny_batch(
            cfg, rng, batch=geom["batch"], seq=SEQ, n_tiles=N_TILES,
            budget=16, cp=geom["cp"], spread_tiles=True,
        )
        if i < 2 or not geom["multimodal"]:
            full["images"] = None
            full["image_indices"] = None
        full = {
            k: (np.asarray(v) if v is not None else None)
            for k, v in full.items()
        }
        batch = feed(full)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses, state


def main(ckpt_dir: str, geom_name: str):
    import jax

    from long_vita_tpu.training.distributed import (
        local_rows,
        make_global_batch,
        maybe_initialize,
    )

    assert maybe_initialize(), "LVT_COORDINATOR env contract not set"
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    geom = GEOMS[geom_name]

    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(
        dp=geom["dp"], pp=geom["pp"], cp=geom["cp"], tp=geom["tp"]
    ))

    def feed(full):
        local = local_rows(full, mesh, geom["batch"])
        if full.get("images") is not None:
            n_local = local["images"].shape[0]
            print(f"TILES HOSTLOCAL {n_local}", flush=True)
        batch = make_global_batch(local, mesh, geom["batch"], SEQ)
        if batch.get("images") is not None:
            # tile pixels stay host-local: this process's addressable
            # shards hold exactly 1/process_count of the global stack
            imgs = batch["images"]
            held = sum(s.data.shape[0] for s in imgs.addressable_shards)
            want = imgs.shape[0] // jax.process_count()
            assert held == want, (held, want, imgs.shape)
            print(f"TILES LOCAL {held} GLOBAL {imgs.shape[0]}", flush=True)
        return batch

    losses, state = run_steps(geom, feed, ckpt_dir)
    for i, loss in enumerate(losses):
        print(f"STEP {i} LOSS {loss!r}", flush=True)

    if geom["ckpt"]:
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
    print("GEOM OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "dp2cp2tp2")
