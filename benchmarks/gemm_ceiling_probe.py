"""Pin the XLA GEMM ceiling at the 14B layer shapes (round 5, VERDICT #4).

bench.py's 16K 8-layer slice decomposes (scan-chained timing, no dispatch
overhead) into ~25.4 ms/layer of flash attention (108 TF/s — splash
parity, see fwd_kernel_lab.py) and ~58 ms/layer of GEMMs + glue. This
probe measures what XLA itself achieves on (a) the bare GEMM chain at the
exact layer shapes and (b) the full layer body with attention replaced by
identity — separating "XLA's MXU ceiling at these shapes" from "glue cost
(norms, rope, residuals, casts)". If (a) lands near the measured 79%,
0.72 composite MFU is the physical ceiling of this step on v5e.

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


def time_loop(fn, x, iters=8, reps=3):
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    _ = jax.device_get(loop(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(loop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main():
    from long_vita_tpu.utils.compile_cache import enable
    enable()

    s, h, i = 16384, 5120, 13824
    hq, hkv, d = 40, 8, 128
    rng = np.random.default_rng(0)

    def w(m, n, key):
        return jnp.asarray(rng.standard_normal((m, n)) * 0.02, jnp.bfloat16)

    wq = w(h, hq * d, 0)
    wk = w(h, hkv * d, 1)
    wv = w(h, hkv * d, 2)
    wo = w(hq * d, h, 3)
    wg = w(h, i, 4)
    wu = w(h, i, 5)
    wd = w(i, h, 6)
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
    def bare(x):
        q = x @ wq
        k = x @ wk
        v = x @ wv
        o = q @ wo
        g = x @ wg
        u = x @ wu
        y = (g * u) @ wd  # one elementwise mult (swiglu's shape)
        return (y + o + jnp.pad(k, ((0, 0), (0, h - hkv * d)))
                + jnp.pad(v, ((0, 0), (0, h - hkv * d)))).astype(x.dtype)

    dt = time_loop(bare, x0)
    report("bare GEMM chain (qkv,o,gate,up,down)", dt, gemm_flops)

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

    def layer_noattn(x):
        qwen2.dot_product_attention = fake_attn
        try:
            hidden, _ = qwen2.qwen2_decoder(params, x, positions, cfg)
        finally:
            qwen2.dot_product_attention = real_attn
        return hidden.astype(x.dtype)

    x1 = x0[None]
    dt = time_loop(layer_noattn, x1)
    report("full layer minus attention (glue incl.)", dt, gemm_flops)

    # (c) the real full layer for the same-timing composite cross-check
    def layer_full(x):
        hidden, _ = qwen2.qwen2_decoder(params, x, positions, cfg)
        return hidden.astype(x.dtype)

    attn_flops = 4 * s * s * hq * d * 0.5
    dt = time_loop(layer_full, x1)
    report("full layer (GEMMs+glue+flash)", dt, gemm_flops + attn_flops)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
