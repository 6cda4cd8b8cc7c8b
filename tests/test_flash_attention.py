"""Flash attention kernel vs XLA reference — forward and gradients.

Runs in Pallas interpreter mode on CPU (same kernel code path as TPU).
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.ops.attention import xla_attention
from long_vita_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, b, sq, skv, hq, hkv, d):
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2)])
def test_flash_forward_matches_xla(causal, hq, hkv):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, 2, 256, 256, hq, hkv, 64)
    got = flash_attention(q, k, v, causal=causal, block_q=128, block_kv=128)
    want = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_forward_unaligned_seq():
    """Sq=Skv=200 (not a block multiple): padding must not change results."""
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, 1, 200, 200, 2, 2, 64)
    got = flash_attention(q, k, v, causal=True, block_q=128, block_kv=128)
    want = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_offsets_match_decode_semantics():
    """q chunk at offset 128 attending to kv [0, 256) == causal full slice."""
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, 1, 256, 256, 2, 2, 64)
    full = xla_attention(q, k, v, causal=True)

    q2 = q[:, 128:]
    got = flash_attention(
        q2, k, v, causal=True, q_offset=128, kv_offset=0,
        block_q=128, block_kv=128,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(full[:, 128:]), rtol=2e-5, atol=2e-5
    )


def test_flash_segment_ids():
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 256, 2, 64
    q, k, v = _rand_qkv(rng, b, s, s, h, h, d)
    seg = jnp.asarray(
        np.concatenate([np.zeros(100), np.ones(156)])[None], jnp.int32
    )
    got = flash_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
        block_q=128, block_kv=128,
    )
    want = xla_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.slow
def test_flash_gradients_match_xla(causal):
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, 1, 256, 256, 4, 2, 64)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, block_q=128, block_kv=128)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v, causal=causal)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.slow
def test_flash_gradients_with_segments():
    rng = np.random.default_rng(5)
    q, k, v = _rand_qkv(rng, 1, 256, 256, 2, 2, 64)
    seg = jnp.asarray(
        np.concatenate([np.zeros(128), np.ones(128)])[None], jnp.int32
    )

    def loss(fn):
        def inner(q, k, v):
            o = fn(q, k, v)
            return jnp.sum(o**2)
        return inner

    f = loss(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
            block_q=128, block_kv=128,
        )
    )
    x = loss(
        lambda q, k, v: xla_attention(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
        )
    )
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(x, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("causal,sq", [(False, 1025), (True, 1537)])
@pytest.mark.slow
def test_flash_gradients_ragged_default_blocks(causal, sq):
    """Ragged seqs at DEFAULT blocks: the fwd pads to 576 multiples but the
    bwd caps block_kv at 512, which doesn't divide the fwd padding — the
    tail kv block must still be visited (regression: unwritten dk/dv tail
    rows / dropped dq contribution at the ViT 1025-token shape)."""
    rng = np.random.default_rng(7)
    q, k, v = _rand_qkv(rng, 1, sq, sq, 2, 2, 64)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return inner

    gf = jax.grad(loss(lambda q, k, v: flash_attention(q, k, v, causal=causal)),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss(lambda q, k, v: xla_attention(q, k, v, causal=causal)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gx, "qkv"):
        assert np.isfinite(np.asarray(a)).all(), f"d{name} has non-finite values"
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_flash_lse_output():
    """LSE must match log(sum(exp(logits))) from the XLA path."""
    rng = np.random.default_rng(6)
    q, k, v = _rand_qkv(rng, 1, 128, 128, 2, 2, 64)
    o, lse = flash_attention(
        q, k, v, causal=True, block_q=128, block_kv=128, return_lse=True
    )
    # manual reference
    scale = 1.0 / np.sqrt(64)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    mask = np.tril(np.ones((128, 128), bool))
    logits = np.where(mask[None, None], logits, -np.inf)
    want_lse = np.log(np.sum(np.exp(logits), axis=-1))  # [B,H,S]
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=1e-5, atol=1e-5)


def test_flash_quant_lse_output():
    """The int8-fused kernel's LSE must match the dequantized reference —
    including NEG_INF rows when kv_valid_len masks the whole shard (the cp
    merge weights partials by exp(lse - max); a shard that saw nothing must
    weigh zero). VERDICT #3 plumbing."""
    from long_vita_tpu.models.qwen2 import quantize_kv
    from long_vita_tpu.ops.flash_attention import (
        NEG_INF,
        flash_attention_quant,
    )

    rng = np.random.default_rng(12)
    q, k, v = _rand_qkv(rng, 1, 128, 256, 4, 2, 64)
    k_q, k_sc = quantize_kv(k)
    v_q, v_sc = quantize_kv(v)
    o, lse = flash_attention_quant(
        q, k_q, k_sc, v_q, v_sc, q_offset=128, kv_offset=0,
        kv_valid_len=200, block_q=128, block_kv=128, return_lse=True,
    )
    k_dq = np.asarray(k_q, np.float32) * np.asarray(k_sc)
    scale = 1.0 / np.sqrt(64)
    g = 2  # hq // hkv
    kk = np.repeat(k_dq, g, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), kk) * scale
    q_pos = 128 + np.arange(128)
    kv_pos = np.arange(256)
    mask = (kv_pos[None, :] <= q_pos[:, None]) & (kv_pos < 200)[None, :]
    logits = np.where(mask[None, None], logits, -np.inf)
    want_lse = np.log(np.sum(np.exp(logits), axis=-1))
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=1e-4, atol=1e-4)

    # fully-masked shard: lse pins to NEG_INF
    _, lse0 = flash_attention_quant(
        q, k_q, k_sc, v_q, v_sc, q_offset=128, kv_offset=1024,
        kv_valid_len=0, block_q=128, block_kv=128, return_lse=True,
    )
    assert np.all(np.asarray(lse0) <= NEG_INF / 2)


@pytest.mark.slow
@pytest.mark.parametrize("causal", [True, False])
def test_fused_backward_matches_two_pass(causal):
    """The fused one-pass backward (dq partials per kv-major block) must
    reproduce the two-pass dkv+dq kernels exactly (same math, f32 accum)."""
    from long_vita_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(11)
    b, sq, hq, hkv, d = 2, 512, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sq, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sq, hkv, d)), jnp.float32)
    segs = jnp.asarray(rng.integers(0, 3, (b, sq)), jnp.int32)
    segs = jnp.sort(segs, axis=1)

    def run(fused):
        old = fa._FUSED_BWD
        fa._FUSED_BWD = fused
        try:
            def f(q, k, v):
                o = fa.flash_attention(
                    q, k, v, causal=causal, block_q=128, block_kv=128,
                    q_segment_ids=segs, kv_segment_ids=segs,
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        finally:
            fa._FUSED_BWD = old

    g_fused = run(True)
    g_two = run(False)
    for a, b_ in zip(g_fused, g_two):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5
        )


def test_backward_major_zero_routes_two_pass():
    """BWD_BLOCK_KV_MAJOR=0 (sweep knob for 'no fused kernel') must fall
    back to the two-pass kernels, not divide by zero."""
    from long_vita_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 256, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 256, 1, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 256, 1, 64)), jnp.float32)

    def f(q):
        o = fa.flash_attention(q, k, v, causal=True, block_q=128,
                               block_kv=128)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    ref = jax.grad(f)(q)
    old_major, old_fused = fa.BWD_BLOCK_KV_MAJOR, fa._FUSED_BWD
    fa.BWD_BLOCK_KV_MAJOR, fa._FUSED_BWD = 0, True
    try:
        got = jax.grad(f)(q)
    finally:
        fa.BWD_BLOCK_KV_MAJOR, fa._FUSED_BWD = old_major, old_fused
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_flash_quant_matches_dequantized_reference():
    """Int8-fused flash forward == dequantize + XLA attention."""
    from long_vita_tpu.ops.attention import xla_attention
    from long_vita_tpu.ops.flash_attention import flash_attention_quant

    rng = np.random.default_rng(21)
    b, sq, skv, hq, hkv, d = 1, 256, 512, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    kf = rng.standard_normal((b, skv, hkv, d)).astype(np.float32)
    vf = rng.standard_normal((b, skv, hkv, d)).astype(np.float32)

    def quantize(x):
        amax = np.abs(x).max(axis=-1, keepdims=True)
        scale = np.maximum(amax, 1e-8) / 127.0
        qx = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
        return jnp.asarray(qx), jnp.asarray(scale, jnp.float32)

    k_q, k_s = quantize(kf)
    v_q, v_s = quantize(vf)
    k_deq = np.asarray(k_q, np.float32) * np.asarray(k_s)
    v_deq = np.asarray(v_q, np.float32) * np.asarray(v_s)

    valid = 400  # cache only partially filled
    q_off = valid - sq  # chunk positions [144, 400)
    want = xla_attention(
        q, jnp.asarray(k_deq, jnp.float32), jnp.asarray(v_deq, jnp.float32),
        causal=True,
        q_positions=jnp.broadcast_to(q_off + jnp.arange(sq), (b, sq)),
        kv_positions=jnp.broadcast_to(jnp.arange(skv), (b, skv)),
        kv_valid_len=jnp.asarray([valid]),
    )
    got = flash_attention_quant(
        q, k_q, k_s, v_q, v_s,
        q_offset=q_off, kv_valid_len=jnp.asarray(valid),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_short_attention_matches_xla():
    """Single-pass non-causal short-seq kernel (ViT path) vs XLA, at the
    ragged 1025-token ViT shape (padding rows/lanes must not leak)."""
    from long_vita_tpu.ops.flash_attention import short_attention

    rng = np.random.default_rng(13)
    q, k, v = _rand_qkv(rng, 2, 260, 260, 4, 4, 64)
    got = short_attention(q, k, v)
    want = xla_attention(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # GQA grouping
    q2, k2, v2 = _rand_qkv(rng, 1, 130, 130, 4, 2, 64)
    got = short_attention(q2, k2, v2)
    want = xla_attention(q2, k2, v2, causal=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_short_attention_gradients():
    """short_attention's custom VJP (flash-kernel backward) vs XLA."""
    from long_vita_tpu.ops.flash_attention import short_attention

    rng = np.random.default_rng(14)
    q, k, v = _rand_qkv(rng, 1, 256, 256, 4, 2, 64)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    gf = jax.grad(loss(short_attention), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(
        loss(lambda q, k, v: xla_attention(q, k, v, causal=False)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )
