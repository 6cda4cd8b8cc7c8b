"""Fused-backward block sweep on the real chip (fwd+bwd timing).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flash_bwd_tuning.py
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
    from long_vita_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(0)
    B, S, HQ, HKV, D = 1, 16384, 40, 8, 128  # 14B geometry
    q = jnp.asarray(rng.standard_normal((B, S, HQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.bfloat16)
    # fwd 2 + ideal bwd 4 matmul-units (the MFU convention)
    flops = (2 + 4) * 2 * B * HQ * S * S * D * 0.5

    def make(bq, bk, bkM, fused):
        fa.BWD_BLOCK_Q_CAP = bq
        fa.BWD_BLOCK_KV_CAP = bk
        fa.BWD_BLOCK_KV_MAJOR = bkM
        fa._FUSED_BWD = fused

        def f(q):
            def body(o, _):
                o2 = fa.flash_attention(o, k, v, causal=True)
                return o2.astype(q.dtype), None
            o, _ = jax.lax.scan(body, q, None, length=2)
            return jnp.sum(o.astype(jnp.float32))

        return jax.jit(jax.grad(f))

    results = {}
    cases = [
        ("two-pass 1024x512", (1024, 512, 0, False)),
        ("fused 1024x512 M2048", (1024, 512, 2048, True)),
        ("fused 1024x512 M4096", (1024, 512, 4096, True)),
        ("fused 512x512 M4096", (512, 512, 4096, True)),
        ("fused 1024x1024 M4096", (1024, 1024, 4096, True)),
        ("fused 512x1024 M4096", (512, 1024, 4096, True)),
        ("fused 1024x512 M8192", (1024, 512, 8192, True)),
        ("fused 2048x512 M4096", (2048, 512, 4096, True)),
    ]
    for name, (bq, bk, bkM, fused) in cases:
        try:
            run = make(bq, bk, bkM, fused)
            t0 = time.time()
            _ = jax.device_get(jnp.sum(run(q)))
            compile_s = time.time() - t0
            t0 = time.time()
            _ = jax.device_get(jnp.sum(run(q)))
            dt = (time.time() - t0) / 2
            tflops = flops / dt / 1e12
            results[name] = round(tflops, 1)
            log(f"{name}: {dt*1000:.2f} ms | {tflops:.1f} TFLOP/s "
                f"(compile {compile_s:.0f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {str(e)[:150]}")
            results[name] = None

    print(json.dumps(results))


if __name__ == "__main__":
    main()
