"""Weight-only int8 quantization for serving (w8a16).

Decode at small batch is HBM-bandwidth-bound: every generated token
re-reads the full parameter set, so tok/s is capped at
HBM_bytes_per_s / param_bytes (PERF.md measures the bf16 decode path at
~85% of that floor). Halving the weight bytes with per-output-channel
symmetric int8 halves the floor itself — the remaining ~2x that no
schedule tuning can reach. Activations stay bf16 (w8a16): the convert
int8->bf16 fuses into the dot's operand read on TPU, so the MXU sees
the usual bf16 GEMM while HBM moves half the bytes.

Scope: the text decoder's seven projection kernels and the lm_head —
together >99% of a Qwen2-geometry LM's bytes. The embedding stays fp
(decode gathers ONE row per step) and the vision tower stays fp (it
runs once per request and is compute-bound, PERF.md ViT section). MoE
expert stacks are not quantized (EP shards them over dp already; mixed
per-layer trees would also break the decoder's uniform layer scan).

The reference serves strictly bf16 (Megatron inference,
`long_vita_megatron/inference/text_generation_server.py`) — this is a
beyond-parity serving feature, lossless enough for w8 per-channel on
chat models and strictly opt-in (`InferenceEngine(weight_quant="int8")`
/ `--weight-quant int8`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# the seven dense projections of models/qwen2.py::init_qwen2_params
PROJ_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


def quantize_kernel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., in, out] -> (int8 [..., in, out], f32 scale [..., out]).

    Per-output-channel symmetric: scale = max|w|/127 over the contraction
    dim, so x @ dequant(q) == (x @ q) * scale — the scale applies AFTER
    the GEMM as a cheap [out]-vector multiply."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.where(a > 0, a / 127.0, jnp.float32(1.0))
    q = jnp.round(w.astype(jnp.float32) / scale[..., None, :])
    return q.astype(jnp.int8), scale


def dequantize_kernel(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Reference inverse of quantize_kernel (tests / exports)."""
    return q.astype(jnp.float32) * scale[..., None, :]


def _quant_entry(entry: Params) -> Params:
    out = {k: v for k, v in entry.items() if k != "kernel"}
    out["kernel_q"], out["scale"] = quantize_kernel(entry["kernel"])
    return out


def quantize_weights_int8(params: Params, head: bool = True) -> Params:
    """Quantize a long_vita (or bare qwen2) param tree for serving.

    Returns a NEW tree where each text projection entry carries
    {kernel_q: int8, scale: f32[out]} instead of {kernel}; biases, norms,
    LoRA adapters, embed and the vision/projector towers are untouched.
    models/qwen2.py::_proj and ::lm_head dispatch on the presence of
    `kernel_q`. MoE trees are rejected (see module docstring)."""
    text = params.get("text", params)
    layers = text["layers"]
    if "router" in layers:
        raise ValueError("weight_quant does not cover MoE expert stacks")
    new_layers = dict(layers)
    for name in PROJ_NAMES:
        new_layers[name] = _quant_entry(layers[name])
    new_text = dict(text, layers=new_layers)
    if head:
        new_text["lm_head"] = _quant_entry(text["lm_head"])
    if "text" not in params:
        return new_text
    return dict(params, text=new_text)


def _quant_entry_host(entry: Params) -> Params:
    """Numpy quantization of one projection entry, on the HOST.

    The device-side path (quantize_kernel under jit) holds the fp and
    int8 trees together — at 14B that is 28 GB bf16 + 14 GB int8, more
    than the one v5e the int8 model is meant to FIT on. Entry-by-entry
    host quantization peaks at params + one kernel instead."""
    import numpy as np

    w = np.asarray(entry["kernel"], np.float32)
    a = np.max(np.abs(w), axis=-2)
    scale = np.where(a > 0, a / np.float32(127.0), np.float32(1.0))
    q = np.rint(w / scale[..., None, :]).astype(np.int8)
    out = {k: v for k, v in entry.items() if k != "kernel"}
    out["kernel_q"], out["scale"] = q, scale.astype(np.float32)
    return out


def quantize_weights_int8_host(params: Params, head: bool = True) -> Params:
    """quantize_weights_int8 computed with numpy on the host (serving
    init path — see _quant_entry_host for why not on-device)."""
    text = params.get("text", params)
    layers = text["layers"]
    if "router" in layers:
        raise ValueError("weight_quant does not cover MoE expert stacks")
    new_layers = dict(layers)
    for name in PROJ_NAMES:
        new_layers[name] = _quant_entry_host(layers[name])
    new_text = dict(text, layers=new_layers)
    if head:
        new_text["lm_head"] = _quant_entry_host(text["lm_head"])
    if "text" not in params:
        return new_text
    return dict(params, text=new_text)


def _quant_entry_host_int4(entry: Params) -> Params:
    """Host int4 group-quantization of one projection entry.

    {kernel} -> {kernel_p4: packed int8 [..., in/2, out],
    scale4: f32 [..., in/128, out]} (split-half nibble packing +
    per-group scales, ops/quant_matmul.py)."""
    from long_vita_tpu.ops.quant_matmul import quantize_int4_grouped

    packed, scales = quantize_int4_grouped(entry["kernel"])
    out = {k: v for k, v in entry.items() if k != "kernel"}
    out["kernel_p4"], out["scale4"] = packed, scales
    return out


def quantize_weights_int4_host(params: Params, head: bool = True) -> Params:
    """w4a16 serving tree (numpy, host): the seven projections +
    lm_head as packed int4 with 128-row group scales. int4 quarters the
    per-token weight read vs bf16 — what fits the FULL 48-layer 14B
    geometry (7.4 GB packed vs 28 GB bf16) on one 16 GB v5e. The
    matmuls run the ops/quant_matmul.py Pallas kernel (packed bytes
    read once). Same scope rules as int8 (module docstring)."""
    text = params.get("text", params)
    layers = text["layers"]
    if "router" in layers:
        raise ValueError("weight_quant does not cover MoE expert stacks")
    new_layers = dict(layers)
    for name in PROJ_NAMES:
        new_layers[name] = _quant_entry_host_int4(layers[name])
    new_text = dict(text, layers=new_layers)
    if head:
        new_text["lm_head"] = _quant_entry_host_int4(text["lm_head"])
    if "text" not in params:
        return new_text
    return dict(params, text=new_text)


def quantized_param_specs(params: Params, specs: Params) -> Params:
    """Adapt a PartitionSpec tree to a quantized param tree.

    kernel_q keeps the kernel's spec (same dims); scale [..., out] takes
    the kernel spec's leading + trailing axes (the contraction dim
    disappears). int4: kernel_p4 [..., in/2, out] and scale4
    [..., in/128, out] shard on the OUT dim only — the packed-row and
    scale-group dims are not generally divisible by the tp degree
    (down_proj has 13824/128 = 108 groups, not divisible by tp8), and a
    replicated packed weight is already 4x smaller than the bf16 kernel
    the fp spec was sized for. Leaves every non-quantized entry alone,
    so the adapted tree zips with the params for device_put."""
    from jax.sharding import PartitionSpec as P

    def adapt(p_sub: Params, s_sub: Params) -> Params:
        if not isinstance(s_sub, dict):
            return s_sub
        if "kernel_q" in p_sub and "kernel" in s_sub:
            k = s_sub["kernel"]
            scale = P(*k[:-2], k[-1]) if len(k) >= 2 else P()
            out = {n: s for n, s in s_sub.items() if n != "kernel"}
            out["kernel_q"], out["scale"] = k, scale
            return out
        if "kernel_p4" in p_sub and "kernel" in s_sub:
            k = s_sub["kernel"]
            p4 = P(*k[:-2], None, k[-1]) if len(k) >= 2 else P()
            out = {n: s for n, s in s_sub.items() if n != "kernel"}
            out["kernel_p4"], out["scale4"] = p4, p4
            return out
        return {
            n: adapt(p_sub.get(n, {}), s) if isinstance(s, dict) else s
            for n, s in s_sub.items()
        }

    return adapt(params, specs)
