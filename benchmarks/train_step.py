"""Single-chip training-step benchmark (fwd + bwd + optimizer, remat).

14B-geometry layer slice at 16K tokens with the logits-masked head.
Training MFU accounting: 6 * params_flops + attention (x2 extra causal
passes for bwd, +1 fwd recompute under full remat).
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

    parser = argparse.ArgumentParser()
    parser.add_argument("--remat", default="full", choices=["full", "dots", "flash"])
    # depth-linearity sweeps: a reduced vocab frees the 152k embed/head
    # HBM (params+grads ~12 GB) so deeper LM slices fit one v5e — the
    # head is budget-masked, so its flops share is negligible either way
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--vocab", type=int, default=152064)
    args = parser.parse_args()
    remat = True if args.remat == "full" else args.remat

    from long_vita_tpu.utils.compile_cache import enable

    enable()

    from long_vita_tpu.config import TextConfig
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.training.loss import cross_entropy

    layers, seq, budget = args.layers, 16384, 2048
    cfg = TextConfig(
        vocab_size=args.vocab, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=layers, num_attention_heads=40,
        num_key_value_heads=8, rope_theta=1e6,
    )
    log(f"train-step bench: {layers}-layer slice, seq {seq}, "
        f"remat={args.remat}, device {jax.devices()[0].device_kind}")

    # plain-SGD update: Adam's f32 moments for the 152k-vocab embed+head
    # alone exceed one v5e's HBM; the matmul work measured here is identical
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, seq)))
    positions = jnp.broadcast_to(jnp.arange(seq), (1, seq))
    lp = jnp.asarray(
        np.linspace(0, seq - 2, budget, dtype=np.int32)
    )[None]
    labels = jnp.take_along_axis(tokens, lp + 1, axis=1)

    def loss_fn(params):
        embeds = qwen2.embed_tokens(params, tokens)
        hidden, _ = qwen2.qwen2_decoder(
            params, embeds, positions, cfg, remat=remat
        )
        hidden = jnp.take_along_axis(hidden, lp[:, :, None], axis=1)
        logits = qwen2.lm_head(params, hidden)
        s, c = cross_entropy(logits, labels)
        return s / jnp.maximum(c, 1.0)

    @jax.jit
    def step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree.map(
            lambda p, g: (p - 1e-5 * g).astype(p.dtype), params, grads
        )
        return params, loss

    t0 = time.time()
    params, loss = step(params)
    _ = jax.device_get(loss)
    log(f"compile+first: {time.time() - t0:.1f}s, loss {float(loss):.3f}")

    t0 = time.time()
    for _ in range(3):
        params, loss = step(params)
    _ = jax.device_get(loss)
    dt = (time.time() - t0) / 3

    h, hq, hkv, d, i = (cfg.hidden_size, cfg.num_attention_heads,
                        cfg.num_key_value_heads, cfg.head_dim,
                        cfg.intermediate_size)
    matmul_per_tok = 2 * h * (hq * d + 2 * hkv * d) + 2 * hq * d * h + 6 * h * i
    # fwd + bwd(2x) + remat fwd recompute(1x) = 4x fwd matmul flops.
    # The "flash" remat policy keeps (o, lse) saved, so the attention
    # forward is NOT recomputed — count 3 attention passes, not 4
    # (linears are still fully rematerialized under every policy here).
    attn = 4 * seq * seq * hq * d * 0.5
    attn_passes = 3 if args.remat == "flash" else 4
    flops = layers * (4 * matmul_per_tok * seq + attn_passes * attn)
    tflops = flops / dt / 1e12
    mfu = tflops / 197.0
    log(f"train step: {dt*1000:.0f} ms | {tflops:.1f} TFLOP/s | MFU {mfu:.3f}"
        f" | {seq/dt:.0f} tok/s ({layers}-layer slice)")
    print(json.dumps({
        "metric": "train_step_mfu_16k_14b_slice",
        "value": round(mfu, 4),
        "tflops": round(tflops, 1),
        "tok_s_slice": round(seq / dt, 1),
    }))


if __name__ == "__main__":
    main()
