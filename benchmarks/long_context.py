"""Long-context single-chip benchmarks (run on a real TPU).

Measures, on an L-layer Qwen2.5-14B-geometry slice (per-layer cost is
homogeneous, so times extrapolate by 48/L):
  1. chunked prefill through the KV cache at a long context (TTFT path)
  2. steady-state decode tokens/sec against a long cached context

Usage: python benchmarks/long_context.py [--seq 131072] [--layers 4]

CP dryrun mode (virtual mesh): --cp 8 [--tp 1] re-execs onto cp*tp virtual
CPU devices if needed, runs the real InferenceEngine chunked prefill on the
mesh, and reports per-device compiled FLOPs vs the cp=1 engine — the
prefill GEMMs must scale ~1/cp (serving TTFT rides cp, not just tp).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("_LONG_VITA_BENCH_VIRTUAL"):
    # re-exec'ed for a virtual mesh: the container sitecustomize forces the
    # TPU platform; override before first device use (env alone is too late)
    jax.config.update("jax_platforms", "cpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _reexec_virtual(n: int) -> None:
    """Re-exec this script on n virtual CPU devices (single-chip host)."""
    import subprocess

    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["_LONG_VITA_BENCH_VIRTUAL"] = "1"
    sys.exit(subprocess.run([sys.executable] + sys.argv, env=env).returncode)


def _engine_flops(engine, seq, chunk):
    """Per-device compiled FLOPs of one real prefill chunk mid-sequence."""
    cache = engine._make_cache(batch=1, max_len=seq)
    # pretend half the prompt is already cached; chunk at the midpoint
    cache = type(cache)(
        cache.k, cache.v, jnp.asarray(seq // 2, jnp.int32),
        k_scale=cache.k_scale, v_scale=cache.v_scale,
    )
    embeds = jnp.zeros((1, chunk, engine.cfg.text.hidden_size), jnp.bfloat16)
    if engine.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        embeds = jax.device_put(
            embeds, NamedSharding(engine.mesh, P(None, "cp", None))
        )
    lowered = engine._prefill_chunk.lower(
        engine.params, embeds, jnp.asarray(seq // 2, jnp.int32), cache
    )
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"]), compiled


def cp_dryrun(args, cfg, params):
    from long_vita_tpu.config import LongVITAConfig
    from long_vita_tpu.inference.engine import InferenceEngine
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh

    n = args.cp * args.tp
    if len(jax.devices()) < n and not os.environ.get(
        "_LONG_VITA_BENCH_VIRTUAL"
    ):
        _reexec_virtual(n)

    vcfg = LongVITAConfig(text=cfg, vision=None)
    base = InferenceEngine(
        {"text": params}, vcfg, None,
        max_seq_len=args.seq, chunk=args.chunk,
    )
    f1, _ = _engine_flops(base, args.seq, args.chunk)

    mesh = make_mesh(
        MeshConfig(dp=1, cp=args.cp, tp=args.tp), devices=jax.devices()[:n]
    )
    sharded = InferenceEngine(
        {"text": jax.tree.map(np.asarray, params)}, vcfg, None,
        max_seq_len=args.seq, chunk=args.chunk, mesh=mesh,
    )
    fn, compiled = _engine_flops(sharded, args.seq, args.chunk)
    # (execution parity at this geometry is too slow for a CPU dryrun;
    # tests/test_inference_engine.py covers cp-vs-single-device greedy)

    ratio = fn / f1
    log(f"per-device prefill-chunk FLOPs: cp1={f1:.3e} "
        f"cp{args.cp}xtp{args.tp}={fn:.3e} ratio={ratio:.3f} "
        f"(ideal GEMM scaling {1.0 / (args.cp * args.tp):.3f})")
    print(json.dumps({
        "mode": "cp_dryrun", "cp": args.cp, "tp": args.tp,
        "seq": args.seq, "chunk": args.chunk, "layers": args.layers,
        "flops_per_device_cp1": f1, "flops_per_device_cp": fn,
        "flops_ratio": round(ratio, 4),
        "ideal_ratio": round(1.0 / (args.cp * args.tp), 4),
    }))


def _host_init_quantized(cfg):
    """Random-init the text tree with numpy and int4-quantize each
    projection immediately (peak host memory = one fp stack at a time,
    never a full fp tree on device). Values are random — this bench
    measures THROUGHPUT of the full-geometry model; quality claims need
    real weights (PERF.md real-weight section)."""
    from long_vita_tpu.ops.quant_matmul import quantize_int4_grouped

    rng = np.random.default_rng(0)
    l, h = cfg.num_hidden_layers, cfg.hidden_size
    hq, hkv, d = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )
    i = cfg.intermediate_size

    def q4(shape):
        w = (rng.standard_normal(shape).astype(np.float32)) * 0.02
        packed, scales = quantize_int4_grouped(w)
        del w
        return {"kernel_p4": packed, "scale4": scales}

    def bf16(shape, fill=None):
        import ml_dtypes

        if fill is not None:
            return np.full(shape, fill, ml_dtypes.bfloat16)
        return (
            rng.standard_normal(shape).astype(np.float32) * 0.02
        ).astype(ml_dtypes.bfloat16)

    layers = {
        "input_norm": bf16((l, h), 1.0),
        "post_attn_norm": bf16((l, h), 1.0),
        "q_proj": {**q4((l, h, hq * d)), "bias": bf16((l, hq * d), 0.0)},
        "k_proj": {**q4((l, h, hkv * d)), "bias": bf16((l, hkv * d), 0.0)},
        "v_proj": {**q4((l, h, hkv * d)), "bias": bf16((l, hkv * d), 0.0)},
        "o_proj": q4((l, hq * d, h)),
        "gate_proj": q4((l, h, i)),
        "up_proj": q4((l, h, i)),
        "down_proj": q4((l, i, h)),
    }
    log("host-init: projections quantized (int4 packed)")
    return {
        "embed": {"embedding": bf16((cfg.vocab_size, h))},
        "layers": layers,
        "final_norm": bf16((h,), 1.0),
        "lm_head": q4((h, cfg.vocab_size)),
    }


def mm_composite(args):
    """1M MULTIMODAL single-chip composite (VERDICT round-3 #8): the
    text-only 1M row skips the north-star regime — 4K-frame video prefill
    (BASELINE.md: 1M-token 4,096-frame multimodal). This drives the REAL
    InferenceEngine end to end on one chip: encode --frames 448px frames
    through the full InternViT (short kernel) + projector, scatter each
    frame's 256 feature rows into the prompt, then chunked KV prefill to
    --seq. Reports frames/s encoded, composite TTFT (encode + scatter +
    prefill), and composite MFU (ViT fwd + LM prefill flops over the
    whole wall)."""
    from long_vita_tpu.config import LongVITAConfig, TextConfig, VisionConfig
    from long_vita_tpu.inference.engine import InferenceEngine
    from long_vita_tpu.models.long_vita import init_long_vita_params

    tok_per_frame = 256
    cfg = LongVITAConfig(
        text=TextConfig(
            vocab_size=152064, hidden_size=5120, intermediate_size=13824,
            num_hidden_layers=args.layers, num_attention_heads=40,
            num_key_value_heads=8, rope_theta=1e6,
        ),
        vision=VisionConfig(),  # full InternViT-300M geometry
    )
    assert args.frames * tok_per_frame <= args.seq
    log(f"mm composite: {args.frames} frames x {tok_per_frame} tok | "
        f"seq {args.seq} | {args.layers}-layer LM slice | full 24-layer ViT")
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    engine = InferenceEngine(
        params, cfg, None, max_seq_len=args.seq, chunk=args.chunk,
        kv_quant=args.kv_quant, vision_chunk=32,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.text.vocab_size, size=(args.seq,))
    # frames back to back from position 0 (the reference's video layout:
    # frame tokens lead, the question trails)
    seq_idx = np.arange(args.frames * tok_per_frame).reshape(
        args.frames, tok_per_frame
    )
    indices = np.stack([np.zeros_like(seq_idx), seq_idx])
    frames = rng.standard_normal(
        (args.frames, 448, 448, 3)
    ).astype(np.float32)

    def once():
        t0 = time.time()
        job = engine.start_prefill(ids, frames, indices)
        t_encode = 0.0
        if job.feats is not None:
            # encode-upfront mode (LVT_INTERLEAVE_ENCODE=0): the feature
            # stack is final before the first prefill chunk — time it
            _ = jax.block_until_ready(job.feats)
            t_encode = time.time() - t0
        while not job.done:
            engine.prefill_step(job)
        cache, last_hidden, _ = engine.finish_prefill(job)
        _ = float(jnp.sum(last_hidden.astype(jnp.float32)))  # device sync
        return time.time() - t0, t_encode, cache

    import os

    interleaved = os.environ.get("LVT_INTERLEAVE_ENCODE", "0") == "1"
    t_cold, _, cache = once()
    log(f"compile+first composite (interleave={interleaved}): {t_cold:.1f}s")
    del cache
    dt, t_encode, cache = once()

    t, v = cfg.text, cfg.vision
    per_tok = 2 * t.hidden_size * (
        t.num_attention_heads * t.head_dim
        + 2 * t.num_key_value_heads * t.head_dim
    ) + 2 * t.num_attention_heads * t.head_dim * t.hidden_size \
        + 6 * t.hidden_size * t.intermediate_size
    attn = 4 * args.seq * args.seq * t.num_attention_heads * t.head_dim * 0.5
    lm = args.layers * (per_tok * args.seq + attn)
    v_mm = 8 * v.hidden_size**2 + 4 * v.hidden_size * v.intermediate_size
    v_attn = 4 * v.seq_len * v.seq_len * v.hidden_size
    vit = v.num_hidden_layers * (v_mm * v.seq_len + v_attn) * args.frames
    proj = 2 * args.frames * tok_per_frame * (
        v.hidden_size * 4 * t.hidden_size + t.hidden_size * t.hidden_size
    )
    tflops = (lm + vit + proj) / dt / 1e12
    mfu = tflops / 197.0
    rec = {
        "mode": "mm_composite", "frames": args.frames, "seq": args.seq,
        "layers": args.layers, "interleaved": interleaved,
        "ttft_s_slice": round(dt, 2),
        "tflops": round(tflops, 1), "mfu": round(mfu, 4),
    }
    if t_encode:
        fps = args.frames / t_encode
        full_ttft = dt + (48 - args.layers) / args.layers * (dt - t_encode)
        rec.update(encode_s=round(t_encode, 2), frames_per_s=round(fps, 1),
                   ttft_48layer_s=round(full_ttft, 1))
        log(f"encode: {t_encode:.2f}s ({fps:.1f} frames/s) | composite "
            f"TTFT {dt:.2f}s slice | {tflops:.1f} TFLOP/s | MFU {mfu:.3f} | "
            f"extrapolated 48-layer composite TTFT {full_ttft:.1f}s/chip")
    else:
        # interleaved mode: encode hides inside prefill — no separate
        # encode wall exists; the slice TTFT is the deliverable
        log(f"composite TTFT {dt:.2f}s slice (encode interleaved) | "
            f"{tflops:.1f} TFLOP/s | MFU {mfu:.3f}")
    print(json.dumps(rec))


def main():
    from long_vita_tpu.utils.compile_cache import enable

    enable()  # 1M prefill compiles are ~10 min through the relay
    parser = argparse.ArgumentParser()
    parser.add_argument("--seq", type=int, default=131072)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--chunk", type=int, default=8192)
    parser.add_argument("--decode-steps", type=int, default=16)
    parser.add_argument("--kv-quant", action="store_true")
    parser.add_argument("--host-init", action="store_true",
                        help="FULL-MODEL: numpy-init + int4-quantize on "
                             "the host; the chip never sees bf16 weights "
                             "(48-layer 14B on one 16 GB v5e)")
    parser.add_argument("--weight-quant", nargs="?", const="int8",
                        default=None, choices=["int8", "int4"],
                        help="weight-only quantized decode "
                             "(models/quantize.py): int8 halves, int4 "
                             "(grouped, Pallas kernel) quarters the "
                             "per-token weight read that floors decode")
    parser.add_argument("--frames", type=int, default=0,
                        help="multimodal composite: encode N video frames "
                             "+ scatter + chunked prefill via the real "
                             "InferenceEngine (single chip)")
    parser.add_argument("--from-ids", action="store_true",
                        help="embed per chunk inside the scan (1M-scale: "
                             "the full [1,S,H] embeds never materialize)")
    parser.add_argument("--split", type=int, default=1,
                        help="dispatch prefill as N separate executions "
                             "(engine-style chunk dispatch; a single fused "
                             "1M execution is ~2 min of device time, which "
                             "kills the relay's TPU worker — see PERF.md)")
    parser.add_argument("--spec", type=int, default=0,
                        help="also time a k-token speculative verify step "
                             "vs a 1-token decode step at this context")
    parser.add_argument("--cp", type=int, default=0,
                        help="cp dryrun: per-device FLOPs on a cp x tp mesh "
                             "vs cp=1 (virtual CPU devices if needed)")
    parser.add_argument("--tp", type=int, default=1)
    args = parser.parse_args()

    from long_vita_tpu.config import TextConfig
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.models.qwen2 import KVCache

    cfg = TextConfig(
        vocab_size=152064, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=args.layers, num_attention_heads=40,
        num_key_value_heads=8, rope_theta=1e6,
    )
    log(f"{args.layers}-layer 14B slice | seq {args.seq} | chunk {args.chunk}"
        f" | device {jax.devices()[0].device_kind}")

    if args.frames:
        mm_composite(args)
        return

    if args.host_init:
        # FULL-MODEL mode: the bf16 48-layer tree (28 GB) can never
        # exist on a 16 GB v5e, so build it with numpy on the host and
        # quantize entry-by-entry BEFORE any device transfer — the chip
        # only ever sees the packed tree (~9.5 GB int4 incl. bf16
        # embed). This is the first non-extrapolated 48-layer number:
        # the bf16 reference needs >=2 accelerators for this model at
        # all (28 GB weights), and 4+ as deployed.
        if args.weight_quant != "int4":
            raise SystemExit("--host-init requires --weight-quant int4")
        params = _host_init_quantized(cfg)
    else:
        params = qwen2.init_qwen2_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16
        )
        if args.weight_quant == "int8":
            from long_vita_tpu.models.quantize import quantize_weights_int8

            params = jax.jit(quantize_weights_int8)(params)
        elif args.weight_quant == "int4":
            from long_vita_tpu.models.quantize import (
                quantize_weights_int4_host,
            )

            params = jax.device_put(
                quantize_weights_int4_host(jax.device_get(params))
            )
    if args.cp:
        cp_dryrun(args, cfg, params)
        return
    rng = np.random.default_rng(0)

    @partial(jax.jit, donate_argnums=(2,))
    def prefill_seg(params, embeds_or_ids, cache, chunk0):
        """One execution: scan over this segment's chunks.

        `chunk0` is the segment's first global chunk index; --split
        dispatches the prompt as several such executions (cache donated
        between them) so no single device program runs for minutes."""
        n_chunks = embeds_or_ids.shape[1] // args.chunk

        def body(cache, chunk_idx):
            chunk = jax.lax.dynamic_slice_in_dim(
                embeds_or_ids, chunk_idx * args.chunk, args.chunk, axis=1
            )
            if args.from_ids:
                chunk = qwen2.embed_tokens(
                    {"embed": {"embedding": params["embed"]["embedding"]}},
                    chunk,
                )
            positions = ((chunk0 + chunk_idx) * args.chunk
                         + jnp.arange(args.chunk)[None])
            hidden, cache = qwen2.qwen2_decoder(
                params, chunk, positions, cfg, kv_cache=cache
            )
            return cache, jnp.sum(hidden.astype(jnp.float32))

        cache, sums = jax.lax.scan(body, cache, jnp.arange(n_chunks))
        return cache, jnp.sum(sums)

    if args.seq % (args.split * args.chunk) != 0:
        raise SystemExit("--seq must be divisible by --split * --chunk")
    seg = args.seq // args.split

    def prefill_all(params, embeds, cache):
        """Dispatch the prompt as --split executions, host-synced between
        segments (the engine's chunk-dispatch pattern)."""
        s_tot = 0.0
        for si in range(args.split):
            cache, s = prefill_seg(
                params, embeds[:, si * seg:(si + 1) * seg], cache,
                jnp.asarray(si * (seg // args.chunk), jnp.int32),
            )
            s_tot += float(jax.device_get(s))
        return cache, s_tot

    @jax.jit
    def decode_n(params, token_embed, start_pos, cache, n_sum):
        def body(carry, i):
            embed, cache = carry
            hidden, cache = qwen2.qwen2_decoder(
                params, embed, (start_pos + i)[None, None], cfg,
                kv_cache=cache,
            )
            return (hidden[:, -1:].astype(embed.dtype), cache), None

        (last, cache), _ = jax.lax.scan(
            body, (token_embed, cache), jnp.arange(args.decode_steps)
        )
        return jnp.sum(last.astype(jnp.float32)) + 0 * n_sum

    if args.from_ids:
        embeds = jnp.asarray(
            rng.integers(0, cfg.vocab_size, size=(1, args.seq)), jnp.int32
        )
    else:
        embeds = jnp.asarray(
            rng.standard_normal((1, args.seq, cfg.hidden_size)) * 0.02,
            jnp.bfloat16,
        )
    # cache slots align to the quant-flash kv block (1024): a misaligned
    # slot count makes the kernel's pad materialize padded COPIES of the
    # whole int8 k AND v caches (2 x 1.0 GB HLO temps at 1M — the "worker
    # crash" of PERF.md round 2 was this pushing buffer assignment 180 MB
    # over HBM)
    slots = -(-(args.seq + 256) // 1024) * 1024
    cache = KVCache.zeros(
        cfg, 1, slots, jnp.bfloat16, quantize=args.kv_quant
    )

    t0 = time.time()
    cache2, s = prefill_all(params, embeds, cache)
    _ = jax.device_get(s)
    t_compile = time.time() - t0
    log(f"prefill compile+first: {t_compile:.1f}s")

    # drop the warm-up run's filled cache BEFORE allocating the timing
    # cache: at 1M x 2 layers the two int8 caches are 4.3 GB each and
    # holding both OOMs a 16 GB v5e
    cache2 = None
    cache = KVCache.zeros(
        cfg, 1, slots, jnp.bfloat16, quantize=args.kv_quant
    )
    t0 = time.time()
    cache2, s = prefill_all(params, embeds, cache)
    _ = jax.device_get(s)
    dt_prefill = time.time() - t0

    h, hq, hkv, d, i = (cfg.hidden_size, cfg.num_attention_heads,
                        cfg.num_key_value_heads, cfg.head_dim,
                        cfg.intermediate_size)
    per_tok = 2 * h * (hq * d + 2 * hkv * d) + 2 * hq * d * h + 6 * h * i
    attn = 4 * args.seq * args.seq * hq * d * 0.5
    flops = args.layers * (per_tok * args.seq + attn)
    tflops = flops / dt_prefill / 1e12
    full_ttft = dt_prefill * 48 / args.layers
    log(f"prefill {args.seq}: {dt_prefill:.2f}s slice | {tflops:.1f} TFLOP/s"
        f" | extrapolated 48-layer TTFT {full_ttft:.1f}s/chip")

    # decode
    tok_embed = jnp.asarray(
        rng.standard_normal((1, 1, cfg.hidden_size)) * 0.02, jnp.bfloat16
    )
    start = jnp.asarray(args.seq, jnp.int32)
    _ = jax.device_get(decode_n(params, tok_embed, start, cache2, 0.0))
    t0 = time.time()
    _ = jax.device_get(decode_n(params, tok_embed, start, cache2, 1.0))
    dt_decode = (time.time() - t0) / args.decode_steps
    full_decode = dt_decode * 48 / args.layers
    log(f"decode @ {args.seq} ctx: {dt_decode*1000:.2f} ms/tok slice | "
        f"extrapolated 48-layer {1.0/full_decode:.1f} tok/s/chip")

    record = {
        "seq": args.seq,
        "layers": args.layers,
        "prefill_s_slice": round(dt_prefill, 3),
        "prefill_tflops": round(tflops, 1),
        "ttft_48layer_s": round(full_ttft, 2),
        "decode_ms_per_tok_slice": round(dt_decode * 1000, 3),
        "decode_tok_s_48layer": round(1.0 / full_decode, 2),
    }

    if args.spec:
        # speculative verify step: k tokens against the full cache in ONE
        # pass (inference/speculative.py). ms(verify)/ms(decode) bounds the
        # speedup at full draft acceptance: k tokens per verify vs k
        # decode steps.
        k = args.spec

        @jax.jit
        def verify_n(params, embeds, start_pos, cache, salt):
            def body(carry, i):
                embeds, cache = carry
                positions = (start_pos + i * 0) + jnp.arange(k)[None]
                hidden, cache = qwen2.qwen2_decoder(
                    params, embeds, positions, cfg, kv_cache=cache
                )
                return (embeds, cache), jnp.sum(hidden[:, -1].astype(jnp.float32))

            (_, cache), sums = jax.lax.scan(
                body, (embeds, cache), jnp.arange(args.decode_steps)
            )
            return jnp.sum(sums) + 0 * salt

        spec_embeds = jnp.asarray(
            rng.standard_normal((1, k, cfg.hidden_size)) * 0.02, jnp.bfloat16
        )
        _ = jax.device_get(verify_n(params, spec_embeds, start, cache2, 0.0))
        t0 = time.time()
        _ = jax.device_get(verify_n(params, spec_embeds, start, cache2, 1.0))
        dt_verify = (time.time() - t0) / args.decode_steps
        ratio = dt_verify / dt_decode
        log(f"verify k={k} @ {args.seq} ctx: {dt_verify*1000:.2f} ms slice | "
            f"{ratio:.2f}x a decode step | full-acceptance speedup {k/ratio:.1f}x")
        record["spec_k"] = k
        record["verify_ms_slice"] = round(dt_verify * 1000, 3)
        record["spec_max_speedup"] = round(k / ratio, 2)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
