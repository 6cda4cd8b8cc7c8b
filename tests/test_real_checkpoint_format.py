"""Released-checkpoint FORMAT fidelity: the Long-VITA-*_HF checkpoints are
bf16, sharded across multiple safetensors files with an index json, and
carry a config.json (reference README.md:66-70). No real weights ship in
this container (zero egress — see PERF.md), so this drives the loader
through an artifact with the SAME on-disk format: the reference torch
model's own save_pretrained output in bf16 with forced sharding.

Covers the three loader features VERDICT r1 flagged as unexercised:
bf16 "V2"-dtype decode, sharded-index resolution, tied-embedding fallback.
"""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig, tiny_test_config
from long_vita_tpu.models.long_vita import long_vita_forward
from long_vita_tpu.utils.checkpoint_io import load_long_vita_checkpoint

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def sharded_ckpt(tmp_path_factory):
    if not os.path.isdir("/root/reference/long_vita/models"):
        pytest.skip("reference checkout unavailable")
    from tests.ref_oracle import make_tiny_reference

    cfg = tiny_test_config()
    ref = make_tiny_reference(cfg).to(torch.bfloat16)
    tmp = tmp_path_factory.mktemp("hf_sharded")
    # force the multi-shard layout the released 14B checkpoints use
    ref.save_pretrained(str(tmp), max_shard_size="200KB")
    return ref, cfg, str(tmp)


def test_save_pretrained_layout_is_sharded(sharded_ckpt):
    _, _, path = sharded_ckpt
    idx_file = os.path.join(path, "model.safetensors.index.json")
    assert os.path.exists(idx_file), "expected a sharded index json"
    with open(idx_file) as f:
        weight_map = json.load(f)["weight_map"]
    shards = set(weight_map.values())
    assert len(shards) > 1, f"expected multiple shards, got {shards}"
    assert os.path.exists(os.path.join(path, "config.json"))


def test_config_json_roundtrip(sharded_ckpt):
    _, cfg, path = sharded_ckpt
    loaded = LongVITAConfig.from_json(os.path.join(path, "config.json"))
    t, lt = cfg.text, loaded.text
    assert (lt.vocab_size, lt.hidden_size, lt.num_hidden_layers,
            lt.num_attention_heads, lt.num_key_value_heads) == (
        t.vocab_size, t.hidden_size, t.num_hidden_layers,
        t.num_attention_heads, t.num_key_value_heads)
    assert loaded.vision is not None
    assert loaded.vision.num_hidden_layers == cfg.vision.num_hidden_layers


@pytest.mark.slow
def test_sharded_bf16_multimodal_logits_match(sharded_ckpt):
    """Full pipeline on disk artifacts: sharded bf16 files -> pytree ->
    multimodal forward, vs the torch reference on the same weights."""
    ref, cfg, path = sharded_ckpt
    params, _ = load_long_vita_checkpoint(path, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    b, s, t = 1, 24, cfg.image_token_length
    ids = rng.integers(0, cfg.text.vocab_size, size=(b, s))
    images = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    starts = [1, 1 + t + 1]
    idx_s = np.stack([st + np.arange(t) for st in starts])
    indices = np.stack([np.zeros_like(idx_s), idx_s])

    with torch.no_grad():
        want = ref(
            input_ids=torch.tensor(ids),
            images=torch.tensor(images, dtype=torch.bfloat16),
            image_indices=torch.tensor(indices),
            use_cache=False,
        ).logits.float().numpy()

    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    got, _ = long_vita_forward(
        params, jnp.asarray(ids), pos, cfg,
        images=jnp.asarray(images.transpose(0, 2, 3, 1)),
        image_indices=jnp.asarray(indices),
        attn_impl="xla",
    )
    # the torch side computes in bf16 end to end while we load bf16 weights
    # and compute in f32, so tolerances reflect bf16 activation noise
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.1, atol=0.15)
    # and the argmax rows (what generation consumes) must agree
    assert np.mean(
        np.argmax(np.asarray(got), -1) == np.argmax(want, -1)
    ) >= 0.9


def test_tied_embeddings_fallback(tmp_path):
    """Checkpoints without lm_head.weight tie to embed_tokens (the loader's
    fallback path, untested in r1)."""
    from safetensors.numpy import save_file

    cfg = tiny_test_config()
    t = cfg.text
    rng = np.random.default_rng(3)

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    hd = t.num_attention_heads * t.head_dim
    kvd = t.num_key_value_heads * t.head_dim
    sd = {
        "model.embed_tokens.weight": r(t.vocab_size, t.hidden_size),
        "model.norm.weight": np.ones(t.hidden_size, np.float32),
    }
    for i in range(t.num_hidden_layers):
        p = f"model.layers.{i}."
        sd |= {
            p + "input_layernorm.weight": np.ones(t.hidden_size, np.float32),
            p + "post_attention_layernorm.weight": np.ones(t.hidden_size, np.float32),
            p + "self_attn.q_proj.weight": r(hd, t.hidden_size),
            p + "self_attn.q_proj.bias": r(hd),
            p + "self_attn.k_proj.weight": r(kvd, t.hidden_size),
            p + "self_attn.k_proj.bias": r(kvd),
            p + "self_attn.v_proj.weight": r(kvd, t.hidden_size),
            p + "self_attn.v_proj.bias": r(kvd),
            p + "self_attn.o_proj.weight": r(t.hidden_size, hd),
            p + "mlp.gate_proj.weight": r(t.intermediate_size, t.hidden_size),
            p + "mlp.up_proj.weight": r(t.intermediate_size, t.hidden_size),
            p + "mlp.down_proj.weight": r(t.hidden_size, t.intermediate_size),
        }
    save_file(sd, str(tmp_path / "model.safetensors"))

    cfg_text_only = LongVITAConfig(text=t, vision=None)
    params, _ = load_long_vita_checkpoint(
        str(tmp_path), cfg_text_only, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(params["text"]["lm_head"]["kernel"]),
        sd["model.embed_tokens.weight"].T,
        rtol=1e-6,
    )
