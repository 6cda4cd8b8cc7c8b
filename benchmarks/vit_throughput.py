"""InternViT-300M encode throughput (frames/sec) — BASELINE.md north-star
metric ("ViT frames/s encoded"). Full 24-layer real geometry, bf16.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/vit_throughput.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    from long_vita_tpu.config import LongVITAConfig, VisionConfig
    from long_vita_tpu.models.intern_vit import init_vit_params, intern_vit
    from long_vita_tpu.models.projector import (
        init_projector_params,
        project_features,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--attn-impl", default="auto")
    args = ap.parse_args()

    cfg = LongVITAConfig()  # InternViT-300M 448px + 14B projector
    v = cfg.vision
    batch = args.batch  # tiles per step

    kv = jax.random.PRNGKey(0)
    vit_params = init_vit_params(kv, v, jnp.bfloat16)
    proj_params = init_projector_params(kv, cfg, jnp.bfloat16)

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        rng.standard_normal((batch, v.image_size, v.image_size, 3)),
        jnp.bfloat16,
    )

    @jax.jit
    def encode(vp, pp, x):
        feats = intern_vit(vp, x, v, attn_impl=args.attn_impl)[:, 1:, :]
        out = project_features(pp, feats, cfg)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    _ = jax.device_get(encode(vit_params, proj_params, tiles))
    log(f"compile+first: {time.time() - t0:.1f}s")

    reps = 8
    t0 = time.time()
    for _ in range(reps):
        s = encode(vit_params, proj_params, tiles)
    _ = jax.device_get(s)
    dt = (time.time() - t0) / reps
    fps = batch / dt

    # ViT FLOPs per tile: 24 layers x (attn + mlp) at seq 1025
    s_len, h, i = v.seq_len, v.hidden_size, v.intermediate_size
    per_tile = v.num_hidden_layers * (
        8 * s_len * h * h  # qkv+proj
        + 4 * s_len * s_len * h  # attention
        + 4 * s_len * h * i  # mlp
    )
    tflops = per_tile * batch / dt / 1e12
    log(f"ViT encode: {dt*1000:.1f} ms / {batch} tiles | {fps:.1f} frames/s "
        f"| {tflops:.1f} TFLOP/s")
    print(json.dumps({
        "metric": "vit_frames_per_s",
        "value": round(fps, 1),
        "tflops": round(tflops, 1),
    }))


if __name__ == "__main__":
    main()
