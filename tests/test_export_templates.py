"""HF export round trip + prompt template registry."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.data.templates import available_templates, render
from long_vita_tpu.models.long_vita import init_long_vita_params, long_vita_forward
from long_vita_tpu.utils.checkpoint_io import load_long_vita_checkpoint
from long_vita_tpu.utils.export_hf import save_hf_checkpoint


def test_export_load_roundtrip(tmp_path):
    cfg = tiny_test_config(vocab_size=512)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    save_hf_checkpoint(params, cfg, str(tmp_path))

    params2, cfg2 = load_long_vita_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg2.text.hidden_size == cfg.text.hidden_size
    assert cfg2.vision.image_size == cfg.vision.image_size

    # numerically identical round trip (same tree paths)
    paths1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(params2)[0])
    assert len(paths1) == len(flat2)
    for path, a in paths1:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat2[path]), rtol=0, atol=0,
            err_msg=str(path),
        )

    # identical logits
    ids = jnp.ones((1, 8), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    l1, _ = long_vita_forward(params, ids, pos, cfg, attn_impl="xla")
    l2, _ = long_vita_forward(params2, ids, pos, cfg2, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=0, atol=0)


def test_templates():
    msgs = [
        {"role": "user", "content": "Hi"},
        {"role": "assistant", "content": "Hello!"},
        {"role": "user", "content": "How are you?"},
    ]
    assert {"chatml", "qwen", "llama2", "llama3", "vicuna", "mistral"} <= set(
        available_templates()
    )
    chatml = render("chatml", msgs)
    assert chatml.endswith("<|im_start|>assistant\n")
    assert "<|im_start|>user\nHi<|im_end|>" in chatml
    assert "You are Qwen" in chatml  # default system

    l3 = render("llama3", msgs)
    assert l3.startswith("<|begin_of_text|>")
    assert l3.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    v = render("vicuna", msgs)
    assert "USER: Hi" in v and v.endswith("ASSISTANT:")

    l2 = render("llama2", msgs)
    assert "[INST]" in l2 and l2.endswith("[/INST]")
