"""Single-chip prefill benchmark. Prints ONE JSON line.

Measures multimodal-decoder prefill throughput at the released Long-VITA-14B
geometry (Qwen2.5-14B layers: h=5120, 40 q heads / 8 kv heads, d=128,
i=13824) on an 8-layer slice (the full 48-layer bf16 model exceeds one
v5e's HBM; per-layer cost is homogeneous so the slice extrapolates), with
the Pallas flash-attention kernel, seq 16384, bf16.

Reported metric: model FLOPs utilization (MFU) of the prefill step against
peak bf16 FLOPs of the chip. vs_baseline is MFU / 0.40 — the north-star
target from BASELINE.md ("1M multimodal prefill at >=40% MFU").
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


PEAK_BF16_TFLOPS = {
    # per-chip peak dense bf16
    "v5 lite": 197.0,  # v5e
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,  # trillium
}


def chip_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_BF16_TFLOPS.items():
        if key in kind:
            return val
    return 197.0


def _backend_watchdog(seconds: float = 240.0):
    """Exit nonzero (NO json line) if the TPU backend never initializes.

    The axon relay can go down for hours, and jax.devices() then hangs
    forever inside the C extension — unkillable from Python. A daemon
    thread hard-exits so the driver records a clean failure + retry
    instead of a hung round. Disarmed once jax.devices() returns."""
    import os
    import threading

    armed = threading.Event()

    def _fire():
        if not armed.wait(seconds):
            log(f"bench: TPU backend init exceeded {seconds:.0f}s "
                "(relay down?) — aborting without a result line")
            os._exit(3)

    threading.Thread(target=_fire, daemon=True).start()
    return armed


def main():
    watchdog_done = _backend_watchdog()

    from long_vita_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()

    from long_vita_tpu.config import LongVITAConfig, TextConfig
    from long_vita_tpu.models.qwen2 import init_qwen2_params, qwen2_decoder

    layers = 8
    seq = 16384
    cfg = TextConfig(
        vocab_size=152064, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=layers, num_attention_heads=40,
        num_key_value_heads=8, rope_theta=1e6,
    )
    log(f"bench: {layers}-layer Qwen2.5-14B slice, seq {seq}, bf16, "
        f"device {jax.devices()[0].device_kind}")
    watchdog_done.set()  # backend is up; long compiles may follow

    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(
        rng.standard_normal((1, seq, cfg.hidden_size)) * 0.02, jnp.bfloat16
    )
    positions = jnp.broadcast_to(jnp.arange(seq), (1, seq))

    @jax.jit
    def prefill(params, embeds, positions):
        hidden, _ = qwen2_decoder(params, embeds, positions, cfg)
        return jnp.sum(hidden.astype(jnp.float32))

    t0 = time.time()
    _ = jax.device_get(prefill(params, embeds, positions))
    log(f"compile+first: {time.time() - t0:.1f}s")

    times = []
    for _ in range(3):
        t0 = time.time()
        _ = jax.device_get(prefill(params, embeds, positions))
        times.append(time.time() - t0)
    dt = min(times)

    h, hq, hkv, d, i = (
        cfg.hidden_size, cfg.num_attention_heads, cfg.num_key_value_heads,
        cfg.head_dim, cfg.intermediate_size,
    )
    per_tok = (
        2 * h * (hq * d + 2 * hkv * d)  # qkv proj
        + 2 * hq * d * h  # o proj
        + 3 * 2 * h * i  # swiglu mlp
    )
    attn = 4 * seq * seq * hq * d * 0.5  # causal
    flops = layers * (per_tok * seq + attn)

    tflops = flops / dt / 1e12
    mfu = tflops / chip_peak_tflops()
    toks_per_s = seq / dt
    log(f"prefill step {dt*1000:.1f} ms | {tflops:.1f} TFLOP/s | "
        f"MFU {mfu:.3f} | {toks_per_s:.0f} tok/s ({layers}-layer slice)")

    print(json.dumps({
        "metric": "prefill_mfu_16k_14b_slice",
        "value": round(mfu, 4),
        "unit": "fraction_of_peak_bf16",
        "vs_baseline": round(mfu / 0.40, 3),
    }))


if __name__ == "__main__":
    main()
