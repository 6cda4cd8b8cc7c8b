"""Capture + decompose a device trace of the 16K train step.

jax.profiler works through the axon relay; the trace's XLA-Ops lane gives
the scan-level split (fwd while / bwd+remat while / head+embed fusions).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/trace_train_step.py
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from long_vita_tpu.config import TextConfig
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.training.loss import cross_entropy
    from long_vita_tpu.utils.compile_cache import enable

    enable()
    layers, seq, budget = 4, 16384, 2048
    cfg = TextConfig(
        vocab_size=152064, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=layers, num_attention_heads=40,
        num_key_value_heads=8, rope_theta=1e6,
    )
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, seq)))
    positions = jnp.broadcast_to(jnp.arange(seq), (1, seq))
    lp = jnp.asarray(np.linspace(0, seq - 2, budget, dtype=np.int32))[None]
    labels = jnp.take_along_axis(tokens, lp + 1, axis=1)

    def loss_fn(params):
        e = qwen2.embed_tokens(params, tokens)
        h, _ = qwen2.qwen2_decoder(params, e, positions, cfg, remat=True)
        h = jnp.take_along_axis(h, lp[:, :, None], axis=1)
        logits = qwen2.lm_head(params, h)
        s, c = cross_entropy(logits, labels)
        return s / jnp.maximum(c, 1.0)

    @jax.jit
    def step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree.map(
            lambda p, g: (p - 1e-5 * g).astype(p.dtype), params, grads
        )
        return params, loss

    params, loss = step(params)
    _ = jax.device_get(loss)
    out = "/tmp/lvt_train_trace"
    with jax.profiler.trace(out):
        params, loss = step(params)
        _ = jax.device_get(loss)

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
    ops_tid = next(
        (t for t, n in tid_names.items() if n == "XLA Ops"), None
    )
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
    log(f"device step: {step_total*1000:.0f} ms; top XLA-Ops-lane rows:")
    rows = {}
    for k, v in names.most_common(10):
        log(f"  {k[:50]:50s} {v*1000:8.1f} ms")
        rows[k[:50]] = round(v * 1000, 1)
    print(json.dumps({"step_ms": round(step_total * 1000, 1), "rows": rows}))


if __name__ == "__main__":
    main()
