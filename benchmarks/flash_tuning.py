"""Flash-attention block-size sweep on the real chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flash_tuning.py
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
    from long_vita_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    B, S, HQ, HKV, D = 1, 16384, 40, 8, 128  # 14B geometry
    q = jnp.asarray(rng.standard_normal((B, S, HQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.bfloat16)
    flops = 4 * B * HQ * S * S * D * 0.5

    results = {}
    for bq, bk in [(256, 512), (512, 512), (512, 1024), (1024, 512),
                   (1024, 1024), (2048, 1024)]:
        @jax.jit
        def run(q, k, v, bq=bq, bk=bk):
            def body(o, _):
                o2 = flash_attention(
                    o, k, v, causal=True, block_q=bq, block_kv=bk
                )
                return o2, None
            o, _ = jax.lax.scan(body, q, None, length=4)
            return jnp.sum(o.astype(jnp.float32))

        try:
            t0 = time.time()
            _ = jax.device_get(run(q, k, v))
            compile_s = time.time() - t0
            t0 = time.time()
            _ = jax.device_get(run(q, k, v))
            dt = (time.time() - t0) / 4
            tflops = flops / dt / 1e12
            results[f"{bq}x{bk}"] = round(tflops, 1)
            log(f"bq={bq} bk={bk}: {dt*1000:.2f} ms | {tflops:.1f} TFLOP/s "
                f"(compile {compile_s:.0f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"bq={bq} bk={bk}: FAILED {str(e)[:120]}")
            results[f"{bq}x{bk}"] = None

    print(json.dumps(results))


if __name__ == "__main__":
    main()
