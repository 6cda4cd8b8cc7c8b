"""Safetensors loader round-trip: tiny torch HF state dict -> our pytree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.models import qwen2
from long_vita_tpu.utils.checkpoint_io import (
    SafetensorsIndex,
    load_long_vita_checkpoint,
)

torch = pytest.importorskip("torch")


def _make_checkpoint(tmp_path):
    """Write a tiny HF-schema LongVITA checkpoint with random weights."""
    from safetensors.numpy import save_file

    cfg = tiny_test_config()
    t, v = cfg.text, cfg.vision
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {
        "model.embed_tokens.weight": r(t.vocab_size, t.hidden_size),
        "model.norm.weight": np.ones(t.hidden_size, np.float32),
        "lm_head.weight": r(t.vocab_size, t.hidden_size),
    }
    hd, kvd = t.num_attention_heads * t.head_dim, t.num_key_value_heads * t.head_dim
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
    sd |= {
        "model.vision_model.embeddings.class_embedding": r(1, 1, v.hidden_size),
        "model.vision_model.embeddings.position_embedding": r(
            1, v.num_patches + 1, v.hidden_size
        ),
        "model.vision_model.embeddings.patch_embedding.weight": r(
            v.hidden_size, 3, v.patch_size, v.patch_size
        ),
        "model.vision_model.embeddings.patch_embedding.bias": r(v.hidden_size),
    }
    for i in range(v.num_hidden_layers):
        p = f"model.vision_model.encoder.layers.{i}."
        sd |= {
            p + "ls1": r(v.hidden_size),
            p + "ls2": r(v.hidden_size),
            p + "attn.qkv.weight": r(3 * v.hidden_size, v.hidden_size),
            p + "attn.qkv.bias": r(3 * v.hidden_size),
            p + "attn.proj.weight": r(v.hidden_size, v.hidden_size),
            p + "attn.proj.bias": r(v.hidden_size),
            p + "mlp.fc1.weight": r(v.intermediate_size, v.hidden_size),
            p + "mlp.fc1.bias": r(v.intermediate_size),
            p + "mlp.fc2.weight": r(v.hidden_size, v.intermediate_size),
            p + "mlp.fc2.bias": r(v.hidden_size),
            p + "norm1.weight": np.ones(v.hidden_size, np.float32),
            p + "norm1.bias": np.zeros(v.hidden_size, np.float32),
            p + "norm2.weight": np.ones(v.hidden_size, np.float32),
            p + "norm2.bias": np.zeros(v.hidden_size, np.float32),
        }
    in_dim = v.hidden_size * 4
    sd |= {
        "model.vision_projection.pre_proj_layernorm.weight": np.ones(in_dim, np.float32),
        "model.vision_projection.pre_proj_layernorm.bias": np.zeros(in_dim, np.float32),
        "model.vision_projection.mlp.0.weight": r(v.hidden_size, in_dim),
        "model.vision_projection.mlp.2.weight": r(t.hidden_size, v.hidden_size),
    }
    save_file(sd, str(tmp_path / "model.safetensors"))
    return cfg, sd


def test_load_checkpoint_shapes_and_values(tmp_path):
    cfg, sd = _make_checkpoint(tmp_path)
    params, _ = load_long_vita_checkpoint(str(tmp_path), cfg, dtype=jnp.float32)

    # text: q kernel layer 1 must equal transposed torch weight
    want = sd["model.layers.1.self_attn.q_proj.weight"].T
    got = np.asarray(params["text"]["layers"]["q_proj"]["kernel"][1])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # vision: patch embed kernel reorders conv weight to (kh, kw, c, out)
    conv = sd["model.vision_model.embeddings.patch_embedding.weight"]
    want = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    got = np.asarray(params["vision"]["embeddings"]["patch_embed"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # projector fc1
    want = sd["model.vision_projection.mlp.0.weight"].T
    np.testing.assert_allclose(
        np.asarray(params["projector"]["fc1"]["kernel"]), want, rtol=1e-6
    )

    # the loaded pytree must run end to end
    from long_vita_tpu.models.long_vita import long_vita_forward

    ids = jnp.ones((1, 8), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    logits, _ = long_vita_forward(params, ids, pos, cfg, attn_impl="xla")
    assert logits.shape == (1, 8, cfg.text.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_bf16_safetensors_roundtrip(tmp_path):
    """bf16-on-disk tensors load correctly (the released ckpts are bf16)."""
    from safetensors.torch import save_file as save_torch

    x = torch.arange(16, dtype=torch.bfloat16).reshape(4, 4) * 0.5
    save_torch({"w": x}, str(tmp_path / "model.safetensors"))
    idx = SafetensorsIndex(str(tmp_path))
    got = idx.get("w")
    arr = jnp.asarray(got).view(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(arr), x.float().numpy(), rtol=0, atol=0
    )


def test_graft_checkpoints(tmp_path):
    """Stock Qwen2 + stock InternViT dirs -> combined Long-VITA params."""
    import json

    from safetensors.numpy import save_file

    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.models.long_vita import long_vita_forward
    from long_vita_tpu.utils.graft import graft_checkpoints

    cfg = tiny_test_config()
    t, v = cfg.text, cfg.vision
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    # --- stock Qwen2 checkpoint dir
    llm = tmp_path / "qwen"
    llm.mkdir()
    hd, kvd = t.num_attention_heads * t.head_dim, t.num_key_value_heads * t.head_dim
    sd = {
        "model.embed_tokens.weight": r(t.vocab_size, t.hidden_size),
        "model.norm.weight": np.ones(t.hidden_size, np.float32),
        "lm_head.weight": r(t.vocab_size, t.hidden_size),
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
    save_file(sd, str(llm / "model.safetensors"))
    json.dump({
        "vocab_size": t.vocab_size, "hidden_size": t.hidden_size,
        "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_hidden_layers,
        "num_attention_heads": t.num_attention_heads,
        "num_key_value_heads": t.num_key_value_heads,
        "rope_theta": t.rope_theta,
    }, open(llm / "config.json", "w"))

    # --- stock InternViT checkpoint dir (NO model.vision_model. prefix)
    vit = tmp_path / "vit"
    vit.mkdir()
    sd = {
        "embeddings.class_embedding": r(1, 1, v.hidden_size),
        "embeddings.position_embedding": r(1, v.num_patches + 1, v.hidden_size),
        "embeddings.patch_embedding.weight": r(v.hidden_size, 3, v.patch_size, v.patch_size),
        "embeddings.patch_embedding.bias": r(v.hidden_size),
    }
    for i in range(v.num_hidden_layers):
        p = f"encoder.layers.{i}."
        sd |= {
            p + "ls1": r(v.hidden_size), p + "ls2": r(v.hidden_size),
            p + "attn.qkv.weight": r(3 * v.hidden_size, v.hidden_size),
            p + "attn.qkv.bias": r(3 * v.hidden_size),
            p + "attn.proj.weight": r(v.hidden_size, v.hidden_size),
            p + "attn.proj.bias": r(v.hidden_size),
            p + "mlp.fc1.weight": r(v.intermediate_size, v.hidden_size),
            p + "mlp.fc1.bias": r(v.intermediate_size),
            p + "mlp.fc2.weight": r(v.hidden_size, v.intermediate_size),
            p + "mlp.fc2.bias": r(v.hidden_size),
            p + "norm1.weight": np.ones(v.hidden_size, np.float32),
            p + "norm1.bias": np.zeros(v.hidden_size, np.float32),
            p + "norm2.weight": np.ones(v.hidden_size, np.float32),
            p + "norm2.bias": np.zeros(v.hidden_size, np.float32),
        }
    save_file(sd, str(vit / "model.safetensors"))
    json.dump({
        "hidden_size": v.hidden_size, "intermediate_size": v.intermediate_size,
        "num_hidden_layers": v.num_hidden_layers,
        "num_attention_heads": v.num_attention_heads,
        "image_size": v.image_size, "patch_size": v.patch_size,
    }, open(vit / "config.json", "w"))

    params, gcfg = graft_checkpoints(str(llm), str(vit), dtype=jnp.float32)
    assert "projector" in params
    ids = jnp.ones((1, 8), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    images = jnp.ones((1, v.image_size, v.image_size, 3))
    t_len = gcfg.image_token_length
    indices = jnp.stack([
        jnp.zeros((1, t_len), jnp.int32),
        jnp.arange(1, 1 + t_len)[None],
    ])
    logits, _ = long_vita_forward(
        params, ids, pos, gcfg, images=images, image_indices=indices,
        attn_impl="xla",
    )
    assert np.isfinite(np.asarray(logits)).all()
