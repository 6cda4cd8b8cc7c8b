"""Multi-controller (multi-host) training support.

The reference's stage-3/4 training is a multi-node torchrun job
(scripts/megatron/qwen25/finetune_..._cp8_stage4.sh:80-115,236 —
NNODES/NODE_RANK/MASTER_ADDR over 64 ranks) with TP-rank-0 data read +
NCCL broadcast (long_vita_megatron/training/utils.py:410-481). The
TPU-native equivalent is JAX's multi-controller runtime: every host runs
the SAME program over one global mesh, and per-host data becomes global
jax.Arrays via jax.make_array_from_process_local_data — no broadcast
code, the arrays are simply constructed sharded.

Data loading discipline (mirrors the reference's): within a dp replica
(the cp x tp grid) every host needs the same rows, so hosts re-read the
shared pack stream and keep only the batch rows their addressable devices
own along dp (`process_dp_rows`). Across dp, rows differ; tokenization is
repeated per host but device memory and transfer are 1/dp — the same
trade the reference makes when TP rank 0 re-reads and broadcasts. At the
stage-4 geometry (dp=1, cp8 x tp8 over 16 hosts) every host feeds the
identical global batch, which this path also handles.

Launch contract (recipe note for a 16-host v5p-64 pod):

    LVT_COORDINATOR=host0:8476 LVT_NUM_PROCESSES=16 LVT_PROCESS_ID=$i \
        python -m long_vita_tpu.training.train --config stage4.yaml

On Cloud TPU pods the three variables may be omitted (set LVT_DISTRIBUTED=1
and jax.distributed.initialize() auto-detects from the TPU metadata).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# batch keys sharded over dp on dim 0; everything else rides the image path
_ROW_KEYS = ("tokens", "positions", "segment_ids", "logit_positions", "labels")


def maybe_initialize() -> bool:
    """Initialize the JAX distributed runtime from env vars, if present.

    LVT_COORDINATOR (host:port), LVT_NUM_PROCESSES, LVT_PROCESS_ID mirror
    torchrun's MASTER_ADDR/NNODES/NODE_RANK; LVT_DISTRIBUTED=1 alone defers
    to JAX auto-detection (Cloud TPU pod metadata). Returns True when the
    runtime was initialized.
    """
    coord = os.environ.get("LVT_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["LVT_NUM_PROCESSES"]),
            process_id=int(os.environ["LVT_PROCESS_ID"]),
        )
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d "
            "global devices", jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return True
    if os.environ.get("LVT_DISTRIBUTED"):
        jax.distributed.initialize()
        return True
    return False


def _dp_rows_by_process(mesh: Mesh, global_batch: int) -> dict:
    """process index -> [start, stop) dp-row ownership, computable on
    EVERY host from the mesh alone (Device.process_index)."""
    dp = mesh.shape.get("dp", 1)
    if global_batch % dp:
        raise ValueError(f"global_batch {global_batch} % dp {dp} != 0")
    rows_per = global_batch // dp
    dev_arr = np.asarray(mesh.devices)
    by_proc: dict = {}
    for idx, d in np.ndenumerate(dev_arr):
        by_proc.setdefault(d.process_index, set()).add(idx[0])
    out = {}
    for p, dps in by_proc.items():
        lo, hi = min(dps), max(dps)
        if sorted(dps) != list(range(lo, hi + 1)):
            raise ValueError(
                f"non-contiguous dp ownership {sorted(dps)} for process "
                f"{p}; reorder the mesh"
            )
        out[p] = (lo * rows_per, (hi + 1) * rows_per)
    return out


def process_dp_rows(mesh: Mesh, global_batch: int) -> tuple[int, int]:
    """[start, stop) of the global batch rows this process feeds.

    Batch rows shard over the dp mesh axis; a process owns the rows of
    every dp index any of its addressable devices sits on (contiguous by
    mesh construction — jax.devices() orders processes along the leading
    axes)."""
    ranges = _dp_rows_by_process(mesh, global_batch)
    me = jax.process_index()
    if me not in ranges:
        raise ValueError("this process owns no devices on the mesh")
    return ranges[me]


def _globalize_images(
    images: Optional[np.ndarray],
    image_indices: Optional[np.ndarray],
    mesh: Mesh,
    row_start: int,
    seq_len: int,
):
    """Prepare this host's tile block for the SHARDED global tile stack.

    Tile counts differ per host (tiling is content-dependent). Each host
    pads its stack to one common block size (global max count, rounded up
    to its local device count) and contributes it as its shard of a
    dim-0-device-sharded global array — tile PIXELS never cross hosts and
    no host ever holds the full stack (round-3 gap: the old path
    process_allgathered ~9.6 GB f32 to EVERY host at 4096 frames; now a
    16-host pod holds ~616 MB/host and allgathers only counts + scatter
    indices, ~8 MB). The reference broadcasts the full image tensor over
    NCCL per step (training/utils.py:457-481) — don't be worse at scale.

    Padding tiles carry OUT-OF-RANGE scatter positions —
    merge_image_embeddings' scatter drops them (JAX scatter OOB
    semantics), so they never touch the embeds. image_indices[0] is
    rewritten from host-local to global batch rows.

    Returns (local_block [block, H, W, C], global_indices [2, N_glob, T])
    as host arrays, or (None, None) when NO host has tiles this step.
    """
    from jax.experimental import multihost_utils as mh

    if images is None:
        images = np.zeros((0, 1, 1, 3), np.float32)
        image_indices = np.zeros((2, 0, 1), np.int32)
    images = np.asarray(images)
    image_indices = np.array(image_indices, copy=True)
    n = images.shape[0]
    counts = np.asarray(
        mh.process_allgather(np.asarray([n], np.int32))
    ).reshape(-1)
    maxc = int(counts.max())
    if maxc == 0:
        return None, None
    # tile/shape metadata must agree across hosts; hosts with zero tiles
    # learn the trailing dims from the gathered max
    dims = np.asarray(mh.process_allgather(
        np.asarray(images.shape[1:] + image_indices.shape[2:], np.int32)
    ))
    if n == 0:
        h, w, c, t = (int(x) for x in dims[np.argmax(counts)])
        images = np.zeros((0, h, w, c), images.dtype)
        image_indices = np.zeros((2, 0, t), np.int32)
    image_indices[0] += row_start  # host-local -> global batch rows
    # equal per-host blocks, divisible by the local device count, so the
    # global array shards evenly over every device
    ldc = jax.local_device_count()
    block = -(-maxc // ldc) * ldc
    pad = block - images.shape[0]
    if pad:
        images = np.pad(
            images, ((0, pad),) + ((0, 0),) * (images.ndim - 1)
        )
        # padding indices: batch row 0, positions past the sequence end
        # (scatter-dropped)
        pad_idx = np.zeros((2, pad, image_indices.shape[2]), np.int32)
        pad_idx[1] = seq_len
        image_indices = np.concatenate([image_indices, pad_idx], axis=1)
    # indices are tiny (int32 [2, N, T]); gather them replicated along the
    # tile axis: [2, N, T] -> [N, 2, T] -> concat -> transpose back
    g_idx = np.asarray(mh.process_allgather(
        np.transpose(image_indices, (1, 0, 2)), tiled=True
    ))
    g_idx = np.transpose(g_idx, (1, 0, 2))
    return images, g_idx


def make_global_batch(
    local_batch: dict, mesh: Mesh, global_batch: int, seq_len: int
) -> dict:
    """Per-host batch rows -> global device arrays for the jitted step.

    local_batch holds THIS host's dp rows (process_dp_rows) for the row
    keys, and this host's tiles with HOST-LOCAL batch indices for
    images/image_indices."""
    row_start, _ = process_dp_rows(mesh, global_batch)
    out = {}
    for key in _ROW_KEYS:
        v = local_batch.get(key)
        if v is None:
            out[key] = None
            continue
        sh = NamedSharding(mesh, P("dp", *([None] * (np.ndim(v) - 1))))
        out[key] = jax.make_array_from_process_local_data(sh, np.asarray(v))
    local_block, g_idx = _globalize_images(
        local_batch.get("images"), local_batch.get("image_indices"),
        mesh, row_start, seq_len,
    )
    if local_block is None:
        out["images"] = out["image_indices"] = None
    else:
        # global tile stack sharded dim-0 over EVERY mesh device: each
        # process contributes exactly its local block, so tile pixels
        # never leave their host (encode_images' tile-shard_map consumes
        # this layout directly)
        tile_sharding = NamedSharding(mesh, P(mesh.axis_names))
        out["images"] = jax.make_array_from_process_local_data(
            tile_sharding, local_block.astype(np.float32)
        )
        out["image_indices"] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), g_idx
        )
    return out


def local_rows(batch: dict, mesh: Mesh, global_batch: int) -> dict:
    """Slice a GLOBAL host batch down to this process's dp rows (for
    pipelines that build full batches on every host; tile indices are
    rewritten to host-local rows so make_global_batch can re-globalize).
    """
    lo, hi = process_dp_rows(mesh, global_batch)
    out = dict(batch)
    for key in _ROW_KEYS:
        if batch.get(key) is not None:
            out[key] = np.asarray(batch[key])[lo:hi]
    idx = batch.get("image_indices")
    if idx is not None:
        idx = np.asarray(idx)
        keep = np.logical_and(idx[0, :, 0] >= lo, idx[0, :, 0] < hi)
        kept = np.array(idx[:, keep], copy=True)
        kept[0] -= lo
        # hosts sharing the same dp rows (the cp x tp host grid of one
        # replica — stage-4's dp=1 shape spans EVERY host) partition the
        # replica's tiles round-robin instead of each holding the full
        # stack: the sharded global assembly (make_global_batch) only
        # needs each tile held ONCE somewhere
        ranges = _dp_rows_by_process(mesh, global_batch)
        peers = sorted(p for p, r in ranges.items() if r == (lo, hi))
        tiles = np.asarray(batch["images"])[keep]
        if len(peers) > 1:
            r = peers.index(jax.process_index())
            kept = kept[:, r::len(peers)]
            tiles = tiles[r::len(peers)]
        out["image_indices"] = kept
        out["images"] = tiles
    return out
