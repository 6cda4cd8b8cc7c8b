"""Capture + decompose a device trace of the long-context DECODE step.

PERF.md round-2: 2-layer-slice decode at 128K runs 4.89 ms/tok bf16 /
4.22 ms int8, vs a ~2.0 ms HBM floor (weights 1.1 GB + cache reads).
This tool answers where the rest goes: the XLA-Ops lane split across the
16-step decode scan (attention fusions, GEMMs, cache dynamic-update
writes, dequant/convert ops, layout copies).

The cache is filled synthetically (random k/v at full length) — decode
cost does not depend on cache CONTENTS, so no 128K prefill is needed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/trace_decode.py
           [--seq 131072] [--layers 2] [--kv-quant] [--steps 16] [--batch 1]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seq", type=int, default=131072)
    parser.add_argument("--layers", type=int, default=2)
    parser.add_argument("--steps", type=int, default=16)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--kv-quant", action="store_true")
    args = parser.parse_args()

    from long_vita_tpu.config import TextConfig
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.models.qwen2 import KVCache
    from long_vita_tpu.utils.compile_cache import enable

    enable()
    cfg = TextConfig(
        vocab_size=152064, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=args.layers, num_attention_heads=40,
        num_key_value_heads=8, rope_theta=1e6,
    )
    b = args.batch
    log(f"{args.layers}-layer 14B slice | ctx {args.seq} | batch {b} | "
        f"quant {args.kv_quant} | device {jax.devices()[0].device_kind}")
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    # synthetic full cache: decode timing is content-independent
    zeros = KVCache.zeros(
        cfg, batch=b, max_len=args.seq,
        dtype=jnp.bfloat16, quantize=args.kv_quant,
    )

    @jax.jit
    def fill(key):
        if args.kv_quant:
            k = jax.random.randint(key, zeros.k.shape, -127, 128, jnp.int8)
            v = jax.random.randint(key, zeros.v.shape, -127, 128, jnp.int8)
            ks = jnp.full(zeros.k_scale.shape, 0.01, zeros.k_scale.dtype)
            return KVCache(k, v, jnp.asarray(args.seq - 1, jnp.int32),
                           k_scale=ks, v_scale=ks)
        k = (jax.random.normal(key, zeros.k.shape, jnp.bfloat16)
             * jnp.bfloat16(0.1))
        return KVCache(k, k, jnp.asarray(args.seq - 1, jnp.int32))

    cache = fill(jax.random.PRNGKey(1))

    @jax.jit
    def decode_n(params, token_embed, start_pos, cache):
        def body(carry, i):
            embed, cache = carry
            hidden, cache = qwen2.qwen2_decoder(
                params, embed, (start_pos + i)[None, None], cfg,
                kv_cache=cache,
            )
            return (hidden[:, -1:].astype(embed.dtype), cache), None

        (last, cache), _ = jax.lax.scan(
            body, (token_embed, cache), jnp.arange(args.steps)
        )
        return jnp.sum(last.astype(jnp.float32))

    tok = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, 1, cfg.hidden_size)),
        jnp.bfloat16,
    )
    start = jnp.asarray(args.seq - 1, jnp.int32)

    t0 = time.time()
    _ = jax.device_get(decode_n(params, tok, start, cache))
    log(f"compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    _ = jax.device_get(decode_n(params, tok, start, cache))
    wall = (time.time() - t0) / args.steps
    log(f"wall: {wall*1000:.2f} ms/token")

    out = "/tmp/lvt_decode_trace"
    with jax.profiler.trace(out):
        _ = jax.device_get(decode_n(params, tok, start, cache))

    f = sorted(glob.glob(f"{out}/**/*.trace.json.gz", recursive=True))[-1]
    data = json.loads(gzip.open(f).read())
    events = data.get("traceEvents", [])
    tid_names, dev_pid = {}, None
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "TPU" in ev["args"].get("name", ""):
                dev_pid = ev["pid"]
    for ev in events:
        if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                and ev.get("pid") == dev_pid):
            tid_names[ev["tid"]] = ev["args"].get("name", "")
    ops_tid = next((t for t, n in tid_names.items() if n == "XLA Ops"), None)
    names = collections.Counter()
    for ev in events:
        if (ev.get("ph") == "X" and ev.get("pid") == dev_pid
                and ev.get("tid") == ops_tid):
            names[ev.get("name", "")] += ev.get("dur", 0) / 1e6
    step_total = max(
        (ev.get("dur", 0) / 1e6 for ev in events
         if ev.get("ph") == "X" and ev.get("pid") == dev_pid
         and tid_names.get(ev.get("tid")) == "XLA Modules"),
        default=0.0,
    )
    per_tok = step_total / args.steps * 1000
    log(f"device program: {step_total*1000:.1f} ms "
        f"({per_tok:.2f} ms/token); top XLA-Ops rows (whole program):")
    rows = {}
    for k, v in names.most_common(14):
        log(f"  {k[:60]:60s} {v*1000:8.2f} ms")
        rows[k[:60]] = round(v * 1000, 2)

    # HBM floor model for comparison
    p_layer = (
        cfg.hidden_size * (cfg.num_attention_heads * cfg.head_dim
                           + 2 * cfg.num_key_value_heads * cfg.head_dim)
        + cfg.num_attention_heads * cfg.head_dim * cfg.hidden_size
        + 3 * cfg.hidden_size * cfg.intermediate_size
    )
    w_bytes = args.layers * p_layer * 2
    kv_elt = 1 if args.kv_quant else 2
    c_bytes = (args.layers * 2 * args.seq
               * cfg.num_key_value_heads * cfg.head_dim * kv_elt) * b
    scale_bytes = (args.layers * 2 * args.seq * cfg.num_key_value_heads * 4
                   * b if args.kv_quant else 0)
    floor_ms = (w_bytes + c_bytes + scale_bytes) / 819e9 * 1000
    log(f"HBM floor: weights {w_bytes/1e9:.2f} GB + cache "
        f"{(c_bytes+scale_bytes)/1e9:.2f} GB -> {floor_ms:.2f} ms/token "
        f"@819 GB/s | achieved {per_tok:.2f} ({floor_ms/per_tok*100:.0f}% "
        "of bound)")
    print(json.dumps({
        "metric": "decode_trace_ms_per_tok", "value": round(per_tok, 3),
        "wall_ms_per_tok": round(wall * 1000, 3),
        "hbm_floor_ms": round(floor_ms, 3),
        "quant": args.kv_quant, "rows": rows,
    }))


if __name__ == "__main__":
    main()
