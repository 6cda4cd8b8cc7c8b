"""Train-step sweep over fused-backward block configs (the microbench and
end-to-end rankings disagree — PERF.md; trust the step)."""
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
    from long_vita_tpu.utils.compile_cache import enable

    enable()
    from long_vita_tpu.config import TextConfig
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.ops import flash_attention as fa
    from long_vita_tpu.training.loss import cross_entropy

    layers, seq, budget = 4, 16384, 2048
    cfg = TextConfig(
        vocab_size=152064, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=layers, num_attention_heads=40,
        num_key_value_heads=8, rope_theta=1e6,
    )
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, seq)))
    positions = jnp.broadcast_to(jnp.arange(seq), (1, seq))
    lp = jnp.asarray(np.linspace(0, seq - 2, budget, dtype=np.int32))[None]
    labels = jnp.take_along_axis(tokens, lp + 1, axis=1)

    def make_step():
        def loss_fn(params):
            embeds = qwen2.embed_tokens(params, tokens)
            hidden, _ = qwen2.qwen2_decoder(
                params, embeds, positions, cfg, remat=True
            )
            hidden = jnp.take_along_axis(hidden, lp[:, :, None], axis=1)
            logits = qwen2.lm_head(params, hidden)
            s, c = cross_entropy(logits, labels)
            return s / jnp.maximum(c, 1.0)

        def step(params):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params = jax.tree.map(
                lambda p, g: (p - 1e-5 * g).astype(p.dtype), params, grads
            )
            return params, loss

        # donate: the old params buffer is re-used for the update — without
        # it the step holds 3 copies of the 5.5 GB 4-layer params (p0 +
        # grads + new) and OOMs a 16 GB v5e at the margin
        return jax.jit(step, donate_argnums=0)

    h, hq, hkv, d, i = (cfg.hidden_size, cfg.num_attention_heads,
                        cfg.num_key_value_heads, cfg.head_dim,
                        cfg.intermediate_size)
    mm = 2 * h * (hq * d + 2 * hkv * d) + 2 * hq * d * h + 6 * h * i
    attn = 4 * seq * seq * hq * d * 0.5
    flops = layers * (4 * mm * seq + 4 * attn)

    cases = [
        ("fused bq1024 bk512 M4096", (1024, 512, 4096, True)),
        ("fused bq2048 bk512 M4096", (2048, 512, 4096, True)),
        ("fused bq512 bk1024 M4096", (512, 1024, 4096, True)),
        ("fused bq1024 bk512 M2048", (1024, 512, 2048, True)),
        # round-5 kv-major sweep (VERDICT #4): fewer dq partials + larger
        # dk/dv accumulation spans; M16384 = write-once dq at 16K (VMEM
        # risk: dk/dv f32 scratch is 1 KB per major row)
        ("fused bq1024 bk512 M8192", (1024, 512, 8192, True)),
        ("fused bq512 bk512 M8192", (512, 512, 8192, True)),
        ("two-pass bq1024 bk512", (1024, 512, 0, False)),
        ("two-pass bq512 bk1024", (512, 1024, 0, False)),
    ]
    results = {}
    for name, (bq, bk, bkM, fused) in cases:
        fa.BWD_BLOCK_Q_CAP = bq
        fa.BWD_BLOCK_KV_CAP = bk
        fa.BWD_BLOCK_KV_MAJOR = bkM
        fa._FUSED_BWD = fused
        p = None
        try:
            # fresh on-device init per case (donated steps consume params)
            p = qwen2.init_qwen2_params(
                jax.random.PRNGKey(0), cfg, jnp.bfloat16
            )
            step = make_step()
            t0 = time.time()
            p, loss = step(p)
            _ = jax.device_get(loss)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                p, loss = step(p)
            _ = jax.device_get(loss)
            dt = (time.time() - t0) / 3
            mfu = flops / dt / 1e12 / 197.0
            results[name] = round(mfu, 4)
            log(f"{name}: {dt*1000:.0f} ms | MFU {mfu:.3f} (compile {compile_s:.0f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {str(e)[:140]}")
            results[name] = None
        finally:
            del p
    print(json.dumps(results))


if __name__ == "__main__":
    main()
