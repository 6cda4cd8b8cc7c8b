"""Golden parity: our JAX Qwen2 decoder vs HF transformers' Qwen2 (torch CPU).

The released Long-VITA-*_HF checkpoints run through transformers' Qwen2Model,
so transformers is the numerics oracle (SURVEY.md §7 "parity across three
semantics variants": we pin to the HF path).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.models import qwen2

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = tiny_test_config().text
    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg)
    model.eval()
    return model


def hf_to_jax_params(model, cfg):
    """Convert an HF torch Qwen2ForCausalLM state dict to our stacked pytree."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    l = cfg.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = [sd[fmt.format(i)] for i in range(l)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats))

    p = "model.layers.{}."
    return {
        "embed": {"embedding": jnp.asarray(sd["model.embed_tokens.weight"])},
        "layers": {
            "input_norm": stack(p + "input_layernorm.weight"),
            "post_attn_norm": stack(p + "post_attention_layernorm.weight"),
            "q_proj": {
                "kernel": stack(p + "self_attn.q_proj.weight", transpose=True),
                "bias": stack(p + "self_attn.q_proj.bias"),
            },
            "k_proj": {
                "kernel": stack(p + "self_attn.k_proj.weight", transpose=True),
                "bias": stack(p + "self_attn.k_proj.bias"),
            },
            "v_proj": {
                "kernel": stack(p + "self_attn.v_proj.weight", transpose=True),
                "bias": stack(p + "self_attn.v_proj.bias"),
            },
            "o_proj": {"kernel": stack(p + "self_attn.o_proj.weight", transpose=True)},
            "gate_proj": {"kernel": stack(p + "mlp.gate_proj.weight", transpose=True)},
            "up_proj": {"kernel": stack(p + "mlp.up_proj.weight", transpose=True)},
            "down_proj": {"kernel": stack(p + "mlp.down_proj.weight", transpose=True)},
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"]),
        "lm_head": {"kernel": jnp.asarray(sd["lm_head.weight"].T)},
    }


def test_logits_match_hf(hf_model):
    cfg = tiny_test_config().text
    params = hf_to_jax_params(hf_model, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 17))

    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()

    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    hidden, _ = qwen2.qwen2_decoder(params, embeds, pos, cfg, attn_impl="xla")
    logits = np.asarray(qwen2.lm_head(params, hidden))

    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_kv_cache_decode_matches_full_forward(hf_model):
    cfg = tiny_test_config().text
    params = hf_to_jax_params(hf_model, cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 12)))

    # Full forward (no cache)
    pos = jnp.broadcast_to(jnp.arange(12), (1, 12))
    embeds = qwen2.embed_tokens(params, ids)
    hidden_full, _ = qwen2.qwen2_decoder(params, embeds, pos, cfg, attn_impl="xla")

    # Prefill 8 then decode 4 one at a time
    cache = qwen2.KVCache.zeros(cfg, batch=1, max_len=16, dtype=jnp.float32)
    pre_pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    hidden_pre, cache = qwen2.qwen2_decoder(
        params, embeds[:, :8], pre_pos, cfg, kv_cache=cache, attn_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(hidden_pre), np.asarray(hidden_full[:, :8]), rtol=1e-5, atol=1e-5
    )

    for t in range(8, 12):
        step_pos = jnp.full((1, 1), t)
        hidden_t, cache = qwen2.qwen2_decoder(
            params, embeds[:, t : t + 1], step_pos, cfg,
            kv_cache=cache, attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(hidden_t[:, 0]),
            np.asarray(hidden_full[:, t]),
            rtol=1e-5,
            atol=1e-5,
        )
    assert int(cache.length) == 12


@pytest.mark.parametrize("quant", [False, True])
def test_decode_alt_formulation_matches(monkeypatch, quant):
    """LVT_DECODE_ATT=alt (batched-dot decode attention) is numerically
    equivalent to the default grouped einsum, bf16 and int8 caches."""
    cfg = tiny_test_config().text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 9)))
    embeds = qwen2.embed_tokens(params, ids)
    dtype = jnp.float32

    def run():
        cache = qwen2.KVCache.zeros(
            cfg, batch=2, max_len=16, dtype=dtype, quantize=quant
        )
        pre_pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
        _, cache = qwen2.qwen2_decoder(
            params, embeds[:, :8], pre_pos, cfg, kv_cache=cache,
            attn_impl="xla",
        )
        h, _ = qwen2.qwen2_decoder(
            params, embeds[:, 8:9], jnp.full((2, 1), 8), cfg,
            kv_cache=cache, attn_impl="xla",
        )
        return np.asarray(h[:, 0])

    monkeypatch.delenv("LVT_DECODE_ATT", raising=False)
    base = run()
    monkeypatch.setenv("LVT_DECODE_ATT", "alt")
    alt = run()
    # int8 path: both formulations bf16-round the dequantized operands at
    # slightly different points; bound the drift at bf16 epsilon scale
    tol = 2e-2 if quant else 2e-5
    np.testing.assert_allclose(alt, base, rtol=0, atol=tol)


@pytest.mark.slow
def test_packed_segment_isolation():
    """Two sequences packed with segment ids == the same run separately."""
    cfg = tiny_test_config().text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 6)))
    b = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 10)))

    def run(ids, pos, seg=None):
        embeds = qwen2.embed_tokens(params, ids)
        h, _ = qwen2.qwen2_decoder(
            params, embeds, pos, cfg, segment_ids=seg, attn_impl="xla"
        )
        return np.asarray(h)

    packed = jnp.concatenate([a, b], axis=1)
    pos = jnp.concatenate(
        [jnp.arange(6)[None], jnp.arange(10)[None]], axis=1
    )
    seg = jnp.concatenate(
        [jnp.zeros((1, 6), jnp.int32), jnp.ones((1, 10), jnp.int32)], axis=1
    )
    h_packed = run(packed, pos, seg)
    h_a = run(a, jnp.arange(6)[None])
    h_b = run(b, jnp.arange(10)[None])
    np.testing.assert_allclose(h_packed[:, :6], h_a, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(h_packed[:, 6:], h_b, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_flash_remat_policy_matches_full_remat():
    """remat="flash" (save only the kernel's o/lse) must give identical
    gradients to full rematerialization."""
    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.models import qwen2

    cfg = tiny_test_config().text
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 256), 0, 500)
    pos = jnp.broadcast_to(jnp.arange(256), (1, 256))

    def loss(params, remat):
        embeds = qwen2.embed_tokens(params, ids)
        hidden, _ = qwen2.qwen2_decoder(
            params, embeds, pos, cfg, remat=remat, attn_impl="flash"
        )
        return jnp.sum(hidden.astype(jnp.float32) ** 2)

    g_full = jax.grad(lambda p: loss(p, True))(params)
    g_flash = jax.grad(lambda p: loss(p, "flash"))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        g_full, g_flash,
    )
