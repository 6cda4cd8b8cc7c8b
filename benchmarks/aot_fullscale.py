"""AOT-compile the FULL-SCALE 1M recipes against an abstract 64-chip
topology and report per-chip memory (VERDICT round-2 #2: the 1M cp8xtp8
claims were arithmetic, not compiled artifacts — this compiles the REAL
48-layer stage-4 train step and the 1M cp-serving prefill, and prints
XLA's own per-chip memory analysis + collective inventory).

No TPU pod needed: jax.experimental.topologies describes the target slice
and the TPU compiler lowers/schedules for it (same mechanism as
ring_overlap_check.py). HBM verdicts are against v5p (95.7 GB/chip), the
hardware class the stage-4 recipe names; v5e (16 GB) shown for contrast.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/aot_fullscale.py \
      --case train-text            # stage-4 text step, mbs 1, seq 1M
      --case train-mm --frames 256 # + frozen-ViT frames (tiles = frames)
      --case serve-1m              # one 16K prefill chunk vs 1M int8 cache
"""
import argparse
import os
import re

# kernel dispatch must target TPU even when this process runs on a CPU
# backend (relay down / CI): without this, "auto" attention compiles the
# XLA einsum path into the artifact (ops/_target.py)
os.environ.setdefault("LVT_TARGET", "tpu")
# every full-scale recipe (stage4_1m, stage{1,2}_72b_*) launches with the
# fused flash backward's blocks capped at 512 — the default 1024x1024
# overflows scoped VMEM at the 32K/80L and 1M/cp8 shapes. Mirror the
# recipe env so artifacts match what the recipes actually run.
os.environ.setdefault("LVT_BWD_BQ", "512")
os.environ.setdefault("LVT_BWD_BK", "512")

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ = 1 << 20  # 1,048,576
BUDGET = 8192
V5P_HBM = 95.7e9
V5E_HBM = 16.0e9


TOPOLOGY = "v5p:4x4x4"  # 64 x TPU v5p — the stage-4 recipe's hardware class


def get_mesh():
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=TOPOLOGY
    )
    devices = np.asarray(topo.devices).reshape(1, 1, 8, 8)
    return Mesh(devices, ("dp", "pp", "cp", "tp"))


def shard_like_params(tree_struct, specs, mesh):
    return jax.tree.map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)
        ),
        tree_struct, specs,
    )


def opt_state_struct(tx, params_struct, mesh, specs):
    """Shardings for the optimizer state: moments match their param's spec
    (looked up by shape — adam states mirror the param tree), scalars
    replicate."""
    by_shape = {}
    for leaf, spec in zip(
        jax.tree.leaves(params_struct), jax.tree.leaves(specs)
    ):
        by_shape.setdefault(leaf.shape, spec)
    opt = jax.eval_shape(tx.init, params_struct)
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, s.dtype,
            sharding=NamedSharding(mesh, by_shape.get(s.shape, P())),
        ),
        opt,
    )


def report(name, compiled, n_chips=64, topology=None):
    ma = compiled.memory_analysis()
    fields = [
        "argument_size_in_bytes", "output_size_in_bytes",
        "temp_size_in_bytes", "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ]
    vals = {f: getattr(ma, f, None) for f in fields}
    print(f"== {name} (per-chip, {n_chips}-chip {TOPOLOGY} topology) ==")
    total = 0
    for f, v in vals.items():
        if v is None:
            continue
        print(f"  {f}: {v/1e9:.3f} GB")
        if f in ("argument_size_in_bytes", "output_size_in_bytes",
                 "temp_size_in_bytes"):
            total += v
    # arguments alias outputs for donated state; peak ~ args + temps
    args_plus_temp = (vals.get("argument_size_in_bytes") or 0) + (
        vals.get("temp_size_in_bytes") or 0
    )
    print(f"  peak estimate (args+temp): {args_plus_temp/1e9:.3f} GB")
    for hbm, label in ((V5P_HBM, "v5p-95.7GB"), (V5E_HBM, "v5e-16GB")):
        verdict = "GREEN" if args_plus_temp < hbm else "RED"
        print(f"  fits {label}: {verdict}")
    txt = compiled.as_text()
    colls = {}
    for op in ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute-start", "all-to-all"):
        n = len(re.findall(rf"\b{op}\b", txt))
        if n:
            colls[op] = n
    print(f"  collectives: {colls}")
    # largest all-gathers (the cache/weight-gather pathology detector)
    gathers = []
    for m in re.finditer(r"= \w+\[([0-9,]*)\][^\n]* all-gather[^\n]*", txt):
        dims = [int(x) for x in m.group(1).split(",") if x]
        numel = int(np.prod(dims)) if dims else 1
        meta = re.search(r'op_name="([^"]*)"', m.group(0))
        gathers.append((numel, meta.group(1) if meta else m.group(0)[:160]))
    gathers.sort(reverse=True)
    biggest = gathers[0][0] if gathers else 0
    print(f"  largest all-gather result: {biggest:,} elements")
    for numel, name in gathers[:5]:
        if numel > 1_000_000:
            print(f"    {numel:>13,}  {name[:120]}")
    import os
    if os.environ.get("AOT_DUMP_HLO"):
        with open(os.environ["AOT_DUMP_HLO"], "w") as f:
            f.write(txt)
        print(f"  HLO dumped to {os.environ['AOT_DUMP_HLO']}")
    return args_plus_temp


def train_case(frames: int, remat="full", trainable_vit=False):
    from long_vita_tpu.config import long_vita_14b
    from long_vita_tpu.models.long_vita import init_long_vita_params
    from long_vita_tpu.parallel.sharding import long_vita_param_specs
    from long_vita_tpu.training.optimizer import (
        OptimizerConfig,
        make_optimizer,
    )
    from long_vita_tpu.training.train_step import TrainState, make_train_step

    mesh = get_mesh()
    cfg = long_vita_14b()
    params_struct = jax.eval_shape(
        lambda: init_long_vita_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16
        )
    )
    specs = long_vita_param_specs(params_struct)
    tx = make_optimizer(
        params_struct,
        OptimizerConfig(
            lr=5e-6, warmup_steps=10, total_steps=500,
            freeze_vision=not trainable_vit,
        ),
        num_vit_layers=cfg.vision.num_hidden_layers,
    )
    state = TrainState(
        params=shard_like_params(params_struct, specs, mesh),
        opt_state=opt_state_struct(tx, params_struct, mesh, specs),
        step=jax.ShapeDtypeStruct((), jnp.int32,
                                  sharding=NamedSharding(mesh, P())),
    )
    row = NamedSharding(mesh, P("dp", None))
    rep = NamedSharding(mesh, P())
    batch = {
        "tokens": jax.ShapeDtypeStruct((1, SEQ), jnp.int32, sharding=row),
        "positions": jax.ShapeDtypeStruct((1, SEQ), jnp.int32, sharding=row),
        "segment_ids": jax.ShapeDtypeStruct(
            (1, SEQ), jnp.int32, sharding=row
        ),
        "logit_positions": jax.ShapeDtypeStruct(
            (1, BUDGET), jnp.int32, sharding=row
        ),
        "labels": jax.ShapeDtypeStruct((1, BUDGET), jnp.int32, sharding=row),
        "images": None,
        "image_indices": None,
    }
    if frames:
        t = cfg.image_token_length
        batch["images"] = jax.ShapeDtypeStruct(
            (frames, cfg.vision.image_size, cfg.vision.image_size, 3),
            jnp.bfloat16, sharding=rep,
        )
        batch["image_indices"] = jax.ShapeDtypeStruct(
            (2, frames, t), jnp.int32, sharding=rep
        )
    # stage-4 trains with the tower frozen; --case train-mm-trainable
    # flips it on (the regime PERF.md row "ViT TRAINABLE at 256 frames"
    # measured RED at 4096 frames pre-round-4: the per-ViT-layer residual
    # [4096, 1025, 1024] alone exceeds int32 words. remat="vit" removes
    # those saves; the smaller vision_chunk bounds the backward replay
    # transient to 24 x [64, 1025, 1024].)
    step = make_train_step(
        cfg, tx, mesh, use_ring=True,
        remat=(True if remat == "full" else remat),
        vision_chunk=64 if trainable_vit else 256,
        freeze_vision=not trainable_vit,
    )
    name = (
        f"stage4 train step seq=1M mbs=1 cp8xtp8 remat={remat} "
        f"frames={frames}"
        + (" TRAINABLE ViT" if trainable_vit else "")
    )
    print(f"lowering {name} ...", flush=True)
    lowered = step.lower(state, batch)
    print("compiling ...", flush=True)
    report(name, lowered.compile())


def train_72b_case(stage: int = 1, pp: bool = False, virtual: int = 1):
    """The 72B recipes as compiled artifacts on 64 chips.

    stage 1 (configs/stage1_72b_tp8fsdp8.yaml): seq 32K, budget 32K,
    vision+text frozen (projector-only — reference
    finetune_qwen25_72b_..._stage1.sh), dp8 (fsdp weight streaming) x tp8.
    stage 2 (configs/stage2_72b_tp8fsdp8.yaml): seq 16K, EVERYTHING
    trainable incl. the ViT (which therefore takes the XLA
    auto-partitionable attention path on this mesh), one accumulation
    micro-step of 8 rows (GBS 512 runs 64 of these per optimizer step).
    pp=True: the STRICT-reference layout instead — tp8 x pp8
    (configs/stage1_72b_tp8pp8.yaml; the reference's own 64-GPU grid),
    GPipe microbatches over the pp axis, layer dim sharded per stage."""
    from long_vita_tpu.config import long_vita_72b
    from long_vita_tpu.models.long_vita import init_long_vita_params
    from long_vita_tpu.parallel.sharding import long_vita_param_specs
    from long_vita_tpu.training.optimizer import (
        OptimizerConfig,
        make_optimizer,
    )
    from long_vita_tpu.training.train_step import TrainState, make_train_step

    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=TOPOLOGY)
    shape = (1, 8, 1, 8) if pp else (8, 1, 1, 8)
    devices = np.asarray(topo.devices).reshape(shape)
    mesh = Mesh(devices, ("dp", "pp", "cp", "tp"))

    cfg = long_vita_72b()
    frozen = stage == 1
    seq = 32768 if frozen else 16384
    budget = seq
    params_struct = jax.eval_shape(
        lambda: init_long_vita_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16
        )
    )
    specs = long_vita_param_specs(params_struct, fsdp=not pp, pp=pp)
    tx = make_optimizer(
        params_struct,
        OptimizerConfig(
            lr=1e-3 if frozen else 1e-5, warmup_steps=30, total_steps=1000,
            freeze_vision=frozen, freeze_text=frozen,
            vit_lr_mult=1.0 if frozen else 0.1,
            vit_layer_decay=1.0 if frozen else 0.9,
        ),
        num_vit_layers=cfg.vision.num_hidden_layers,
    )
    state = TrainState(
        params=shard_like_params(params_struct, specs, mesh),
        opt_state=opt_state_struct(tx, params_struct, mesh, specs),
        step=jax.ShapeDtypeStruct((), jnp.int32,
                                  sharding=NamedSharding(mesh, P())),
    )
    row = NamedSharding(mesh, P("dp", None))
    rep = NamedSharding(mesh, P())
    frames = 8  # one image row per dp shard at max_patch_grid 1
    t = cfg.image_token_length
    batch = {
        "tokens": jax.ShapeDtypeStruct((8, seq), jnp.int32, sharding=row),
        "positions": jax.ShapeDtypeStruct((8, seq), jnp.int32, sharding=row),
        "segment_ids": jax.ShapeDtypeStruct((8, seq), jnp.int32, sharding=row),
        "logit_positions": jax.ShapeDtypeStruct(
            (8, budget), jnp.int32, sharding=row
        ),
        "labels": jax.ShapeDtypeStruct((8, budget), jnp.int32, sharding=row),
        "images": jax.ShapeDtypeStruct(
            (frames, cfg.vision.image_size, cfg.vision.image_size, 3),
            jnp.bfloat16, sharding=rep,
        ),
        "image_indices": jax.ShapeDtypeStruct(
            (2, frames, t), jnp.int32, sharding=rep
        ),
    }
    step = make_train_step(
        cfg, tx, mesh, remat=True, vision_chunk=8, freeze_vision=frozen,
        freeze_text=frozen, virtual_pp=virtual,
        # remat=True (full): even with every frozen dW pruned, stage-1
        # still runs a REAL activation backward through all 80 layers to
        # reach the projector at the embedding — the flash policy's saved
        # o/lse at 80 layers overflows v5p HBM by ~4 GB (measured: 99.5
        # vs 95.7 GB); full remat trades that for recompute.
    )
    name = (
        f"72B stage-{stage} train step seq={seq//1024}K gbs=8 "
        + (("tp8xpp8 " + (f"interleaved v{virtual}" if virtual > 1
                           else "(GPipe)")) if pp else "tp8xfsdp8")
        + " remat=full"
        + ("" if frozen else " (all trainable, one accum micro-step)")
    )
    print(f"lowering {name} ...", flush=True)
    lowered = step.lower(state, batch)
    print("compiling ...", flush=True)
    report(name, lowered.compile())


def serve_case(quant: bool, chunk: int):
    from long_vita_tpu.config import long_vita_14b
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.models.qwen2 import KVCache, ParallelConfig
    from long_vita_tpu.parallel.sharding import long_vita_param_specs
    from long_vita_tpu.models.long_vita import init_long_vita_params

    mesh = get_mesh()
    cfg = long_vita_14b()
    parallel = ParallelConfig(mesh)
    params_struct = jax.eval_shape(
        lambda: init_long_vita_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16
        )
    )
    specs = long_vita_param_specs(params_struct)
    text = shard_like_params(params_struct, specs, mesh)["text"]

    t = cfg.text
    cshape = (t.num_hidden_layers, 1, SEQ, t.num_key_value_heads, t.head_dim)
    cspec = NamedSharding(mesh, P(None, None, "cp", "tp", None))
    kv_dtype = jnp.int8 if quant else jnp.bfloat16
    cache = KVCache(
        k=jax.ShapeDtypeStruct(cshape, kv_dtype, sharding=cspec),
        v=jax.ShapeDtypeStruct(cshape, kv_dtype, sharding=cspec),
        length=jax.ShapeDtypeStruct((), jnp.int32,
                                    sharding=NamedSharding(mesh, P())),
        k_scale=(jax.ShapeDtypeStruct(cshape[:-1] + (1,), jnp.float32,
                                      sharding=cspec) if quant else None),
        v_scale=(jax.ShapeDtypeStruct(cshape[:-1] + (1,), jnp.float32,
                                      sharding=cspec) if quant else None),
    )
    embeds = jax.ShapeDtypeStruct(
        (1, chunk, t.hidden_size), jnp.bfloat16,
        sharding=NamedSharding(mesh, P(None, "cp", None)),
    )
    start = jax.ShapeDtypeStruct((), jnp.int32,
                                 sharding=NamedSharding(mesh, P()))

    def prefill_chunk(p, e, s, c):
        positions = s + jnp.arange(chunk)[None, :]
        hidden, c = qwen2.qwen2_decoder(
            p, e, positions, t, kv_cache=c, parallel=parallel
        )
        return hidden[:, -1], c

    fn = jax.jit(prefill_chunk, donate_argnums=(3,))
    name = (
        f"1M cp-serving prefill chunk={chunk} cache=1M "
        f"{'int8' if quant else 'bf16'} cp8xtp8"
    )
    print(f"lowering {name} ...", flush=True)
    lowered = fn.lower(text, embeds, start, cache)
    print("compiling ...", flush=True)
    report(name, lowered.compile())


if __name__ == "__main__":
    from long_vita_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True,
                    choices=["train-text", "train-mm",
                             "train-mm-trainable", "serve-1m",
                             "serve-1m-bf16", "train-72b",
                             "train-72b-stage2", "train-72b-pp"])
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--remat", default="full",
                    choices=["full", "flash", "vit"])
    ap.add_argument("--virtual", type=int, default=1,
                    help="interleaved pipeline chunks per stage (pp case)")
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--topology", default=None,
                    help="override, e.g. v5e:8x8 (64 chips required)")
    a = ap.parse_args()
    if a.topology:
        TOPOLOGY = a.topology
    if a.case == "train-72b":
        train_72b_case(stage=1)
    elif a.case == "train-72b-stage2":
        train_72b_case(stage=2)
    elif a.case == "train-72b-pp":
        train_72b_case(stage=1, pp=True, virtual=a.virtual)
    elif a.case == "train-text":
        train_case(0, remat=a.remat)
    elif a.case == "train-mm":
        train_case(a.frames, remat=a.remat)
    elif a.case == "train-mm-trainable":
        train_case(a.frames, remat=a.remat, trainable_vit=True)
    elif a.case == "serve-1m":
        serve_case(True, a.chunk)
    else:
        serve_case(False, a.chunk)
