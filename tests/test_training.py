"""End-to-end training: data pipeline -> sharded train loop -> checkpoint."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.data.image_processor import ImageProcessor
from long_vita_tpu.data.multimodal import MultimodalTokenizer
from long_vita_tpu.models.long_vita import init_long_vita_params
from long_vita_tpu.parallel.mesh import MeshConfig
from long_vita_tpu.training.optimizer import OptimizerConfig
from long_vita_tpu.training.trainer import (
    Trainer,
    TrainerConfig,
    batch_iterator,
)

REF_TOK = "/root/reference/long_vita/models/long_vita_qwen2_intern"


@pytest.fixture(scope="module")
def mm():
    transformers = pytest.importorskip("transformers")
    if not os.path.isdir(REF_TOK):
        pytest.skip("tokenizer assets unavailable")
    tok = transformers.Qwen2Tokenizer(
        vocab_file=f"{REF_TOK}/vocab.json", merges_file=f"{REF_TOK}/merges.txt"
    )
    return MultimodalTokenizer(
        tok, image_processor=ImageProcessor(image_size=56),
        image_token_length=4,
    )


def _samples(n):
    return [
        {
            "source": "unit",
            "messages": [
                {"role": "user", "content": f"say the number {i}"},
                {"role": "assistant", "content": f"the number is {i}"},
            ],
        }
        for i in range(n)
    ]


def _pipeline(mm, tcfg):
    from long_vita_tpu.data.dataset import ChatMLSupervision, PackedDataset

    sup = ChatMLSupervision(mm)
    packs = PackedDataset(_samples(64), sup, tcfg.seq_len, pad_token_id=0)
    return batch_iterator(
        iter(packs), tcfg.global_batch, tcfg.logit_budget, tcfg.mesh.cp
    )


@pytest.mark.slow
def test_train_loop_single_device_loss_decreases(mm):
    cfg = tiny_test_config(vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tcfg = TrainerConfig(
        seq_len=128, logit_budget=64, global_batch=1, steps=8,
        mesh=MeshConfig(), optim=OptimizerConfig(lr=3e-3, total_steps=8),
        remat=False,
    )
    trainer = Trainer(params, cfg, tcfg)

    # repeat the same batches so the loss must drop
    batches = list(_pipeline(mm, tcfg))[:2]
    result = trainer.train(iter(batches * 8))
    losses = result["losses"]
    assert len(losses) == 8
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_train_loop_sharded_with_ring(mm):
    cfg = tiny_test_config(vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tcfg = TrainerConfig(
        seq_len=128, logit_budget=64, global_batch=2, steps=2,
        mesh=MeshConfig(dp=2, cp=2, tp=2),
        optim=OptimizerConfig(lr=1e-3, total_steps=2, freeze_vision=True),
        remat=True,
    )
    trainer = Trainer(params, cfg, tcfg)
    result = trainer.train(_pipeline(mm, tcfg))
    assert all(np.isfinite(result["losses"]))


def test_zigzag_batch_consistency(mm):
    """cp=1 and cp=2 pipelines must supervise identical (token, label) pairs."""
    tcfg1 = TrainerConfig(seq_len=128, logit_budget=64, global_batch=1,
                          mesh=MeshConfig())
    tcfg2 = TrainerConfig(seq_len=128, logit_budget=64, global_batch=1,
                          mesh=MeshConfig(cp=2, dp=1, tp=1))
    b1 = next(_pipeline(mm, tcfg1))
    b2 = next(_pipeline(mm, tcfg2))
    # same labels
    np.testing.assert_array_equal(b1["labels"], b2["labels"])
    # tokens at logit positions agree after permutation
    t1 = b1["tokens"][0][b1["logit_positions"][0]]
    t2 = b2["tokens"][0][b2["logit_positions"][0]]
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, mm):
    cfg = tiny_test_config(vocab_size=512)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    from long_vita_tpu.training.checkpoint import (
        latest_step,
        load_checkpoint,
        restore_params_only,
        save_checkpoint,
    )
    from long_vita_tpu.training.optimizer import make_optimizer
    from long_vita_tpu.training.train_step import init_train_state

    tx = make_optimizer(params, OptimizerConfig(lr=1e-3, total_steps=4))
    state = init_train_state(params, tx)
    state = state.__class__(state.params, state.opt_state,
                            jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path / "ckpt"), state)
    assert latest_step(str(tmp_path / "ckpt")) == 7

    fresh = init_train_state(params, tx)
    restored = load_checkpoint(str(tmp_path / "ckpt"), fresh)
    np.testing.assert_allclose(
        np.asarray(restored.params["text"]["final_norm"]),
        np.asarray(state.params["text"]["final_norm"]),
    )
    assert int(restored.step) == 7

    # stage handoff: params only
    p2 = restore_params_only(str(tmp_path / "ckpt"), params)
    np.testing.assert_allclose(
        np.asarray(p2["text"]["embed"]["embedding"]),
        np.asarray(state.params["text"]["embed"]["embedding"]),
    )


@pytest.mark.slow
def test_fsdp_matches_replicated(mm):
    """FSDP-sharded params give the same first-step loss as replicated."""
    cfg = tiny_test_config(vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    def one_step(fsdp):
        tcfg = TrainerConfig(
            seq_len=128, logit_budget=64, global_batch=2, steps=1,
            mesh=MeshConfig(dp=2, cp=2, tp=2),
            optim=OptimizerConfig(lr=1e-3, total_steps=1), remat=False,
            fsdp=fsdp,
        )
        fresh = jax.tree.map(lambda x: np.array(x), params)
        trainer = Trainer(fresh, cfg, tcfg)
        return trainer.train(_pipeline(mm, tcfg))["losses"][0]

    a = one_step(False)
    b = one_step(True)
    assert abs(a - b) < 1e-4, (a, b)


@pytest.mark.slow
def test_train_step_with_pipeline_parallel(mm):
    """One train step on a pp=4 x tp=2 mesh (72B-recipe shape, tiny model)."""
    import dataclasses as dc

    base = tiny_test_config(vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128)
    cfg = dc.replace(base, text=dc.replace(base.text, num_hidden_layers=4))
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tcfg = TrainerConfig(
        seq_len=128, logit_budget=64, global_batch=4, steps=1,
        mesh=MeshConfig(dp=1, pp=4, cp=1, tp=2),
        optim=OptimizerConfig(lr=1e-3, total_steps=1, freeze_vision=True),
        remat=False,
    )
    trainer = Trainer(params, cfg, tcfg)
    result = trainer.train(_pipeline(mm, tcfg))
    assert np.isfinite(result["losses"][0])


@pytest.mark.slow
def test_evaluate_loop(mm):
    cfg = tiny_test_config(vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tcfg = TrainerConfig(seq_len=128, logit_budget=64, global_batch=1,
                         steps=1, mesh=MeshConfig(), remat=False)
    trainer = Trainer(params, cfg, tcfg)
    out = trainer.evaluate(_pipeline(mm, tcfg), max_steps=2)
    assert np.isfinite(out["loss"]) and out["tokens"] > 0


@pytest.mark.slow
def test_sharded_checkpoint_roundtrip(tmp_path, mm):
    """orbax save/restore of a dp2cp2tp2-sharded train state."""
    from long_vita_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    from long_vita_tpu.training.optimizer import make_optimizer
    from long_vita_tpu.parallel.mesh import make_mesh
    from long_vita_tpu.training.train_step import init_train_state

    cfg = tiny_test_config(vocab_size=512)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    mesh = make_mesh(MeshConfig(dp=2, cp=2, tp=2))
    tx = make_optimizer(params, OptimizerConfig(lr=1e-3, total_steps=2))
    state = init_train_state(params, tx, mesh)
    save_checkpoint(str(tmp_path / "ck"), state, step=3)

    fresh = init_train_state(
        jax.tree.map(lambda x: np.zeros_like(x), params), tx, mesh
    )
    restored = load_checkpoint(str(tmp_path / "ck"), fresh)
    np.testing.assert_allclose(
        np.asarray(restored.params["text"]["final_norm"]),
        np.asarray(state.params["text"]["final_norm"]),
    )
