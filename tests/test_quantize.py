"""Weight-only int8 serving (models/quantize.py + qwen2._proj / lm_head).

The reference serves strictly bf16 (Megatron inference,
long_vita_megatron/inference/text_generation_server.py); w8a16 is a
beyond-parity serving mode, so the tests pin its MECHANISM exactly
(the quant path must equal running the explicitly dequantized weights)
and bound its quantization error, rather than chasing bit-parity with
the fp model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.models.long_vita import (
    init_long_vita_params,
    long_vita_forward,
)
from long_vita_tpu.models.quantize import (
    PROJ_NAMES,
    dequantize_kernel,
    quantize_kernel,
    quantize_weights_int8,
)


def _dequantized_tree(qparams):
    """The quantized tree with every int8 kernel folded back to float —
    the f32 oracle the fused (x @ q) * scale path must reproduce."""

    def deq(entry):
        if not isinstance(entry, dict) or "kernel_q" not in entry:
            return entry
        out = {k: v for k, v in entry.items()
               if k not in ("kernel_q", "scale")}
        out["kernel"] = dequantize_kernel(entry["kernel_q"], entry["scale"])
        return out

    text = qparams["text"]
    layers = {n: deq(e) for n, e in text["layers"].items()}
    return dict(qparams, text=dict(
        text, layers=layers, lm_head=deq(text["lm_head"])
    ))


def test_quantize_kernel_error_bound():
    """Symmetric per-out-channel: dequant error <= scale/2 elementwise,
    and an all-zero channel round-trips without dividing by zero."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 16, 8)).astype(np.float32)
    w[..., 3] = 0.0
    q, scale = quantize_kernel(jnp.asarray(w))
    assert q.dtype == jnp.int8 and scale.shape == (3, 8)
    err = np.abs(np.asarray(dequantize_kernel(q, scale)) - w)
    assert (err <= np.asarray(scale)[:, None, :] / 2 + 1e-7).all()


def test_forward_matches_dequantized_oracle():
    """(x @ q) * scale must equal x @ (q * scale) through the whole
    model — same ints, same scales, only the scale's position in the
    GEMM differs (f32; tolerance is fp reassociation only)."""
    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_weights_int8(params)
    for name in PROJ_NAMES:
        entry = qparams["text"]["layers"][name]
        assert "kernel_q" in entry and "kernel" not in entry
    oracle = _dequantized_tree(qparams)

    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 500, size=(1, 32)), jnp.int32
    )
    pos = jnp.arange(32, dtype=jnp.int32)[None]
    got, _ = long_vita_forward(qparams, ids, pos, cfg, attn_impl="xla")
    want, _ = long_vita_forward(oracle, ids, pos, cfg, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_generate_weight_quant_runs_and_is_deterministic():
    import os

    from long_vita_tpu.data.multimodal import MultimodalTokenizer
    from long_vita_tpu.inference.engine import InferenceEngine
    from long_vita_tpu.inference.sampler import SamplingParams
    from long_vita_tpu.tokenizer import QWEN_CHATML_TEMPLATE

    transformers = pytest.importorskip("transformers")
    ref = "/root/reference/long_vita/models/long_vita_qwen2_intern"
    if not os.path.isdir(ref):
        pytest.skip("tokenizer assets unavailable")
    tok = transformers.Qwen2Tokenizer(
        vocab_file=f"{ref}/vocab.json", merges_file=f"{ref}/merges.txt"
    )
    tok.chat_template = QWEN_CHATML_TEMPLATE
    mm = MultimodalTokenizer(tok)

    cfg = tiny_test_config(vocab_size=-(-(len(tok) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    eng = InferenceEngine(
        params, cfg, mm, max_seq_len=128, chunk=32,
        cache_dtype=jnp.float32, weight_quant="int8",
    )
    ids = np.random.default_rng(2).integers(0, 500, size=24).tolist()
    sp = SamplingParams(greedy=True, max_new_tokens=8)
    a = eng.generate(input_ids=ids, sampling=sp)
    b = eng.generate(input_ids=ids, sampling=sp)
    assert a.token_ids == b.token_ids and len(a.token_ids) >= 1
    with pytest.raises(ValueError):
        InferenceEngine(params, cfg, mm, weight_quant="int3")


def test_int4_forward_matches_w4_oracle():
    """The int4 tree routes every projection + head through
    ops/quant_matmul.w4_matmul; on CPU that is w4_matmul_xla, whose math
    equals unpack->group-scale->GEMM (pinned in test_quant_matmul.py).
    Here: the full-model int4 forward must equal a forward over a tree
    whose kernels were explicitly dequantized from the SAME int4s."""
    from long_vita_tpu.models.quantize import quantize_weights_int4_host
    from long_vita_tpu.ops.quant_matmul import GROUP, unpack_int4

    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_weights_int4_host(params)

    def deq4(entry):
        if not isinstance(entry, dict) or "kernel_p4" not in entry:
            return entry
        q = unpack_int4(entry["kernel_p4"]).astype(np.float32)
        s = np.asarray(entry["scale4"])
        n_in, n_out = q.shape[-2], q.shape[-1]
        group = n_in // s.shape[-2]  # adaptive on tiny dims
        lead = q.shape[:-2]
        w = (
            q.reshape(*lead, n_in // group, group, n_out)
            * s[..., None, :]
        ).reshape(*lead, n_in, n_out)
        out = {k: v for k, v in entry.items()
               if k not in ("kernel_p4", "scale4")}
        out["kernel"] = jnp.asarray(w)
        return out

    text = qparams["text"]
    oracle = dict(qparams, text=dict(
        text,
        layers={n: deq4(e) for n, e in text["layers"].items()},
        lm_head=deq4(text["lm_head"]),
    ))
    ids = jnp.asarray(
        np.random.default_rng(5).integers(0, 500, size=(1, 32)), jnp.int32
    )
    pos = jnp.arange(32, dtype=jnp.int32)[None]
    got, _ = long_vita_forward(qparams, ids, pos, cfg, attn_impl="xla")
    want, _ = long_vita_forward(oracle, ids, pos, cfg, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_generate_int4_runs_and_is_deterministic():
    from long_vita_tpu.inference.engine import InferenceEngine
    from long_vita_tpu.inference.sampler import SamplingParams

    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    eng = InferenceEngine(
        params, cfg, None, max_seq_len=64, chunk=32,
        cache_dtype=jnp.float32, weight_quant="int4",
    )
    ids = np.random.default_rng(6).integers(0, 500, size=20).tolist()
    a = eng.prefill(ids, None, None)
    b = eng.prefill(ids, None, None)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_quantized_tree_shards_and_matches_single_device():
    """shard_params derives specs for the {kernel_q, scale} layout
    (sharding.py -> quantized_param_specs); a tp-sharded quantized
    forward must reproduce the unsharded quantized forward."""
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
    from long_vita_tpu.parallel.sharding import shard_params

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_weights_int8(params)
    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, 500, size=(1, 32)), jnp.int32
    )
    pos = jnp.arange(32, dtype=jnp.int32)[None]
    want, _ = long_vita_forward(qparams, ids, pos, cfg, attn_impl="xla")

    mesh = make_mesh(MeshConfig(tp=4), devices=jax.devices()[:4])
    sharded = shard_params(qparams, mesh)
    got, _ = jax.jit(
        lambda p, i, po: long_vita_forward(p, i, po, cfg, attn_impl="xla")
    )(sharded, ids, pos)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_int4_tree_shards_and_matches_single_device():
    """quantized_param_specs adapts the {kernel_p4, scale4} layout too
    (packed-row dim shards like the kernel's contraction dim: split-half
    packing keeps each shard contiguous in both halves); a tp-sharded
    int4 forward must reproduce the unsharded int4 forward."""
    from long_vita_tpu.models.quantize import quantize_weights_int4_host
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
    from long_vita_tpu.parallel.sharding import shard_params

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_weights_int4_host(params)
    ids = jnp.asarray(
        np.random.default_rng(7).integers(0, 500, size=(1, 32)), jnp.int32
    )
    pos = jnp.arange(32, dtype=jnp.int32)[None]
    want, _ = long_vita_forward(qparams, ids, pos, cfg, attn_impl="xla")

    mesh = make_mesh(MeshConfig(tp=4), devices=jax.devices()[:4])
    sharded = shard_params(qparams, mesh)
    got, _ = jax.jit(
        lambda p, i, po: long_vita_forward(p, i, po, cfg, attn_impl="xla")
    )(sharded, ids, pos)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
