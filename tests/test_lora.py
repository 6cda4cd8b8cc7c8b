"""LoRA adapters: init identity, training isolation, merge parity, io."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.models.long_vita import init_long_vita_params
from long_vita_tpu.models import qwen2
from long_vita_tpu.training.lora import (
    ALL_TARGETS,
    LoraConfig,
    add_lora_params,
    load_lora,
    merge_lora,
    save_lora,
)


def _setup(targets=("q_proj", "o_proj", "down_proj"), r=4):
    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    base = jax.tree.map(np.asarray, params)  # host copy
    lcfg = LoraConfig(r=r, alpha=8, targets=targets)
    params, text_cfg = add_lora_params(
        params, cfg.text, lcfg, jax.random.PRNGKey(1)
    )
    import dataclasses

    cfg = dataclasses.replace(cfg, text=text_cfg)
    return base, params, cfg, lcfg


def _fwd(params, cfg, ids):
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    embeds = qwen2.embed_tokens(params["text"], ids)
    h, _ = qwen2.qwen2_decoder(
        params["text"], embeds, pos, cfg.text, attn_impl="xla"
    )
    return h


@pytest.mark.slow
def test_lora_init_is_identity():
    """B = 0 at init: adapted forward == base forward exactly."""
    base, params, cfg, _ = _setup()
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 32), 0, 500)
    base_cfg = tiny_test_config()
    h0 = _fwd(jax.tree.map(jnp.asarray, base), base_cfg, ids)
    h1 = _fwd(params, cfg, ids)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)


@pytest.mark.slow
def test_lora_only_training_moves_only_adapters():
    from long_vita_tpu.training.optimizer import (
        OptimizerConfig, make_optimizer,
    )
    from long_vita_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    base, params, cfg, _ = _setup()
    tx = make_optimizer(
        params, OptimizerConfig(lr=1e-2, total_steps=4, lora_only=True)
    )
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, remat=False)
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng.integers(0, 500, (1, 64)), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(64), (1, 64)).astype(jnp.int32),
        "segment_ids": jnp.zeros((1, 64), jnp.int32),
        "logit_positions": jnp.broadcast_to(jnp.arange(32), (1, 32)).astype(jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 500, (1, 32)), jnp.int32),
    }
    new_state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    layers = new_state.params["text"]["layers"]
    # base kernels untouched
    np.testing.assert_array_equal(
        np.asarray(layers["q_proj"]["kernel"]),
        base["text"]["layers"]["q_proj"]["kernel"],
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.params["text"]["embed"]["embedding"]),
        base["text"]["embed"]["embedding"],
    )
    # adapters moved (B leaves get gradients from step 1)
    assert float(jnp.max(jnp.abs(layers["q_proj"]["lora"]["b"]))) > 0


@pytest.mark.slow
def test_merge_lora_matches_adapted_forward():
    base, params, cfg, lcfg = _setup()
    # give the adapters nonzero B so the merge is nontrivial
    for t in lcfg.targets:
        entry = params["text"]["layers"][t]["lora"]
        entry["b"] = jax.random.normal(
            jax.random.PRNGKey(3), entry["b"].shape
        ) * 0.05
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 24), 0, 500)
    h_adapted = _fwd(params, cfg, ids)
    merged = merge_lora(params, cfg.text)
    assert "lora" not in merged["text"]["layers"]["q_proj"]
    import dataclasses

    merged_cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, lora_r=0)
    )
    h_merged = _fwd(merged, merged_cfg, ids)
    np.testing.assert_allclose(
        np.asarray(h_adapted), np.asarray(h_merged), rtol=2e-5, atol=2e-5
    )


def test_lora_save_load_roundtrip(tmp_path):
    base, params, cfg, lcfg = _setup()
    for t in lcfg.targets:
        entry = params["text"]["layers"][t]["lora"]
        entry["b"] = jax.random.normal(
            jax.random.PRNGKey(5), entry["b"].shape
        ) * 0.1
    save_lora(str(tmp_path / "adapter"), params, cfg.text, lcfg)

    fresh = init_long_vita_params(
        jax.random.PRNGKey(0), tiny_test_config(), jnp.float32
    )
    loaded, text_cfg = load_lora(
        str(tmp_path / "adapter"), fresh, tiny_test_config().text
    )
    assert text_cfg.lora_r == lcfg.r
    for t in lcfg.targets:
        np.testing.assert_array_equal(
            np.asarray(loaded["text"]["layers"][t]["lora"]["b"]),
            np.asarray(params["text"]["layers"][t]["lora"]["b"]),
        )


@pytest.mark.slow
def test_lora_sharded_train_step():
    """Adapters ride the mesh (fsdp ldim) without spec mismatches."""
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
    from long_vita_tpu.training.optimizer import (
        OptimizerConfig, make_optimizer,
    )
    from long_vita_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    base, params, cfg, _ = _setup(targets=ALL_TARGETS)
    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    tx = make_optimizer(
        params, OptimizerConfig(lr=1e-2, total_steps=2, lora_only=True)
    )
    state = init_train_state(params, tx, mesh, fsdp=True)
    step = make_train_step(cfg, tx, mesh, remat=False)
    rng = np.random.default_rng(1)
    batch = {
        "tokens": jnp.asarray(rng.integers(0, 500, (2, 64)), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(64), (2, 64)).astype(jnp.int32),
        "segment_ids": jnp.zeros((2, 64), jnp.int32),
        "logit_positions": jnp.broadcast_to(jnp.arange(32), (2, 32)).astype(jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 500, (2, 32)), jnp.int32),
    }
    _, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
