"""Pin the XLA GEMM ceiling at the 14B layer shapes (round 5, VERDICT #4).

bench.py's 16K 8-layer slice decomposes (scan-chained timing, no dispatch
overhead) into ~24.6 ms/layer of flash attention (111.7 TF/s — above
splash parity, see fwd_kernel_lab.py) and ~58 ms/layer of GEMMs + glue.
This probe measures what XLA itself achieves on (a) the bare GEMM chain at
the exact layer shapes, (a2) the same chain with qkv / gate+up fused into
single GEMMs, (a3) one big GEMM alone, and (b) the full layer body with
attention replaced by identity — separating "XLA's MXU ceiling at these
shapes" from "glue cost (norms, rope, residuals, casts)". If (a) lands
near the measured 79%, ~0.72 composite MFU is the physical ceiling of
this step on v5e.

All operands are jit ARGUMENTS (closure-captured device arrays get baked
into the program body and the relay rejects it with HTTP 413).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/gemm_ceiling_probe.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

PEAK = 197.0  # v5e bf16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_loop(fn, x, *ws, iters=8, reps=3):
    @jax.jit
    def loop(x, *ws):
        def body(c, _):
            return fn(c, *ws), ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    _ = jax.device_get(loop(x, *ws))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(loop(x, *ws))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main():
    from long_vita_tpu.utils.compile_cache import enable
    enable()

    s, h, i = 16384, 5120, 13824
    hq, hkv, d = 40, 8, 128
    rng = np.random.default_rng(0)

    def w(m, n):
        return jnp.asarray(rng.standard_normal((m, n)) * 0.02, jnp.bfloat16)

    wq, wk, wv = w(h, hq * d), w(h, hkv * d), w(h, hkv * d)
    wo, wg, wu, wd = w(hq * d, h), w(h, i), w(h, i), w(i, h)
    x0 = jnp.asarray(rng.standard_normal((s, h)) * 0.02, jnp.bfloat16)

    results = {}

    def report(name, dt, flops):
        tf = flops / dt / 1e12
        log(f"{name:46s} {dt*1e3:7.2f} ms  {tf:6.1f} TF/s  "
            f"{tf/PEAK*100:5.1f}% of peak")
        results[name] = round(tf / PEAK, 4)

    gemm_flops = 2 * s * (
        h * (hq * d + 2 * hkv * d) + hq * d * h + 3 * h * i
    )

    # (a) bare GEMM chain, exact layer shapes, residual-free
    def bare(x, wq, wk, wv, wo, wg, wu, wd):
        q = x @ wq
        k = x @ wk
        v = x @ wv
        o = q @ wo
        g = x @ wg
        u = x @ wu
        y = (g * u) @ wd  # one elementwise mult (swiglu's shape)
        return (y + o + jnp.pad(k, ((0, 0), (0, h - hkv * d)))
                + jnp.pad(v, ((0, 0), (0, h - hkv * d)))).astype(x.dtype)

    dt = time_loop(bare, x0, wq, wk, wv, wo, wg, wu, wd)
    report("bare GEMM chain (qkv,o,gate,up,down)", dt, gemm_flops)

    # (a2) qkv fused into one GEMM, gate+up fused into one GEMM — is
    # per-GEMM N-width the limiter, or the shapes overall?
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # [h, (hq+2hkv)*d]
    wgu = jnp.concatenate([wg, wu], axis=1)  # [h, 2i]

    def fused(x, wqkv, wo, wgu, wd):
        qkv = x @ wqkv
        o = qkv[:, : hq * d] @ wo
        gu = x @ wgu
        y = (gu[:, :i] * gu[:, i:]) @ wd
        pad = h - hkv * d
        return (y + o
                + jnp.pad(qkv[:, hq * d:hq * d + hkv * d],
                          ((0, 0), (0, pad)))
                + jnp.pad(qkv[:, hq * d + hkv * d:], ((0, 0), (0, pad)))
                ).astype(x.dtype)

    dt = time_loop(fused, x0, wqkv, wo, wgu, wd)
    report("fused GEMM chain (qkv one GEMM, gu one)", dt, gemm_flops)

    # (a3) single biggest GEMM alone — the raw MXU ceiling at M=16K.
    # Both column halves feed the output (a bare [:, :h] slice lets XLA
    # dead-code-eliminate the unused columns and report >100% of peak).
    wbig = w(h, 2 * i)

    def big(x, wbig):
        y = x @ wbig
        return (y[:, :h] + y[:, 2 * i - h:]).astype(x.dtype)

    dt = time_loop(big, x0, wbig)
    report("single GEMM 16384x5120x27648", dt, 2 * s * h * 2 * i)

    # (b) full layer body with attention = identity (glue cost exposed)
    from long_vita_tpu.config import TextConfig
    from long_vita_tpu.models import qwen2

    cfg = TextConfig(
        vocab_size=1024, hidden_size=h, intermediate_size=i,
        num_hidden_layers=1, num_attention_heads=hq,
        num_key_value_heads=hkv, rope_theta=1e6,
    )
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(s), (1, s))

    real_attn = qwen2.dot_product_attention

    def fake_attn(q, k, v, *a, **kw):
        # identity in q: keeps shapes/layout, removes the flash kernel
        return q

    def layer_noattn(x, params):
        hidden, _ = qwen2.qwen2_decoder(params, x, positions, cfg)
        return hidden.astype(x.dtype)

    x1 = x0[None]
    qwen2.dot_product_attention = fake_attn
    try:
        dt = time_loop(layer_noattn, x1, params)
    finally:
        qwen2.dot_product_attention = real_attn
    report("full layer minus attention (glue incl.)", dt, gemm_flops)

    # (b2/b3) itemize the glue: rope identity, then also norm identity —
    # the per-piece cost bounds what a fused-layer megakernel could buy
    real_rope = qwen2.apply_rope
    real_norm = qwen2.rms_norm

    def fake_rope(q, k, cos, sin):
        return q, k

    def fake_norm(x, weight, eps):
        return x

    qwen2.dot_product_attention = fake_attn
    qwen2.apply_rope = fake_rope
    try:
        dt = time_loop(layer_noattn, x1, params)
        report("  minus attention, minus rope", dt, gemm_flops)
        qwen2.rms_norm = fake_norm
        dt = time_loop(layer_noattn, x1, params)
        report("  minus attention, rope and norms", dt, gemm_flops)
    finally:
        qwen2.dot_product_attention = real_attn
        qwen2.apply_rope = real_rope
        qwen2.rms_norm = real_norm

    # (c) the real full layer for the same-timing composite cross-check
    def layer_full(x, params):
        hidden, _ = qwen2.qwen2_decoder(params, x, positions, cfg)
        return hidden.astype(x.dtype)

    attn_flops = 4 * s * s * hq * d * 0.5
    dt = time_loop(layer_full, x1, params)
    report("full layer (GEMMs+glue+flash)", dt, gemm_flops + attn_flops)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
