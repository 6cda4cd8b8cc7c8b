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


def _image_samples(n, mm):
    from PIL import Image

    return [
        {
            "source": "unit",
            "messages": [
                {"role": "user", "content": f"<image>\nname the number {i}"},
                {"role": "assistant", "content": f"the number is {i}"},
            ],
            "images": [Image.new("RGB", (64, 64), (i * 8 % 256, 64, 128))],
        }
        for i in range(n)
    ]


def _mm_pipeline(mm, tcfg):
    from long_vita_tpu.data.dataset import ChatMLSupervision, PackedDataset

    sup = ChatMLSupervision(mm)
    packs = PackedDataset(
        _image_samples(16, mm), sup, tcfg.seq_len, pad_token_id=0
    )
    return batch_iterator(
        iter(packs), tcfg.global_batch, tcfg.logit_budget, tcfg.mesh.cp
    )


def test_freeze_vision_trains_projector(mm):
    """Stage-1 semantics: --vision-model-freeze wraps ONLY the tower in
    no_grad (reference pretrain_long_vita.py:486-502); the projector is the
    ONLY trainable module in stage 1. The freeze_vision stop_gradient must
    therefore sit on the tower FEATURES, not the projector output —
    a post-projector stop silently turns stage-1 training into a no-op.
    Checks the unsharded path AND the cp tile-shard_map path (whose AD
    must psum the replicated projector-param grads over cp)."""
    from long_vita_tpu.models.qwen2 import ParallelConfig
    from long_vita_tpu.parallel.mesh import make_mesh
    from long_vita_tpu.training.train_step import loss_fn

    cfg = tiny_test_config(
        vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128
    )
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    def grads(batch, parallel, freeze_vision):
        batch = {
            k: (jnp.asarray(v) if v is not None else None)
            for k, v in batch.items()
        }
        return jax.grad(
            lambda p: loss_fn(
                p, batch, cfg, parallel, False, 0, freeze_vision
            )[0]
        )(params)

    tcfg1 = TrainerConfig(seq_len=128, logit_budget=64, global_batch=1,
                          mesh=MeshConfig())
    b1 = next(_mm_pipeline(mm, tcfg1))
    g_open = grads(b1, None, False)
    g_frozen = grads(b1, None, True)

    # projector grads survive the freeze, identical to the open path
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        g_open["projector"], g_frozen["projector"],
    )
    assert any(
        float(jnp.abs(g).max()) > 0.0
        for g in jax.tree.leaves(g_frozen["projector"])
    ), "projector grads are zero — stage-1 training would be a no-op"
    # tower grads are pruned
    assert all(
        float(jnp.abs(g).max()) == 0.0
        for g in jax.tree.leaves(g_frozen["vision"])
    )

    # cp mesh: the frozen tower runs tile-parallel inside a shard_map;
    # projector grads must come back psum'd (== unsharded values)
    tcfg2 = TrainerConfig(seq_len=128, logit_budget=64, global_batch=1,
                          mesh=MeshConfig(cp=2, dp=1, tp=1))
    b2 = next(_mm_pipeline(mm, tcfg2))
    mesh = make_mesh(MeshConfig(dp=1, cp=2, tp=1),
                     devices=jax.devices()[:2])
    g_cp = grads(b2, ParallelConfig(mesh), True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        g_frozen["projector"], g_cp["projector"],
    )


def test_freeze_text_stop_gradient_matches_masked(mm):
    """freeze_text prunes the frozen dW computation (the reference's
    requires_grad=False semantics; at 72B the lm_head dW alone is a ~10 GB
    all-gather per step) — the surviving PROJECTOR grads must be identical
    to the mask-only path, and the text grads must come back zero."""
    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.training.train_step import loss_fn

    cfg = tiny_test_config(
        vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128
    )
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    n_img = 1
    t = cfg.image_token_length
    batch = {
        "tokens": jnp.asarray(
            rng.integers(0, cfg.text.vocab_size, size=(1, 64))
        ),
        "positions": jnp.broadcast_to(jnp.arange(64), (1, 64)),
        "segment_ids": jnp.zeros((1, 64), jnp.int32),
        "logit_positions": jnp.arange(32)[None] + 16,
        "labels": jnp.asarray(rng.integers(0, 100, size=(1, 32))),
        "images": jnp.asarray(
            rng.standard_normal(
                (n_img, cfg.vision.image_size, cfg.vision.image_size, 3)
            ), jnp.float32,
        ),
        "image_indices": jnp.asarray(
            np.stack([np.zeros((n_img, t), np.int32),
                      np.arange(n_img * t, dtype=np.int32).reshape(n_img, t)])
        ),
    }

    def grads(freeze_text):
        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, cfg, None, False, 0, False, freeze_text
        )
        return g

    g_masked, g_frozen = grads(False), grads(True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        g_masked["projector"], g_frozen["projector"],
    )
    assert all(
        float(jnp.abs(g).max()) == 0.0
        for g in jax.tree.leaves(g_frozen["text"])
    )
    # and the masked path's text grads were NOT all zero (the pruning is real)
    assert any(
        float(jnp.abs(g).max()) > 0.0
        for g in jax.tree.leaves(g_masked["text"])
    )


def test_flash_remat_matches_full_on_cp_mesh():
    """remat="flash" must give identical grads to full remat THROUGH the
    ring path: the policy's saved (o, lse) are tagged inside
    ring_attention's custom-vjp fwd (without the tags the policy silently
    degraded to full recompute on cp meshes — the backward re-ran the
    whole forward ring pass per layer)."""
    from long_vita_tpu.models.qwen2 import ParallelConfig
    from long_vita_tpu.parallel.mesh import make_mesh
    from long_vita_tpu.parallel.zigzag import zigzag_permute
    from long_vita_tpu.training.train_step import loss_fn

    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    rng = np.random.default_rng(5)
    seq, budget, cp = 128, 32, 2
    tokens = rng.integers(0, cfg.text.vocab_size, size=(1, seq))
    logit_positions = np.linspace(4, seq - 2, budget).astype(np.int32)[None]
    batch = {
        "tokens": zigzag_permute(jnp.asarray(tokens), cp),
        "positions": zigzag_permute(
            jnp.broadcast_to(jnp.arange(seq), (1, seq)), cp
        ),
        "segment_ids": jnp.zeros((1, seq), jnp.int32),
        "logit_positions": jnp.asarray(logit_positions),
        "labels": jnp.asarray(
            tokens[0][logit_positions + 1].astype(np.int32)
        ),
        "images": None, "image_indices": None,
    }
    mesh = make_mesh(MeshConfig(dp=1, cp=cp, tp=2), devices=jax.devices()[:4])
    par = ParallelConfig(mesh)

    def grads(remat):
        return jax.jit(
            jax.grad(lambda p, b: loss_fn(p, b, cfg, par, remat)[0])
        )(params, batch)

    g_full, g_flash = grads(True), grads("flash")
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_flash)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5
        )


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


@pytest.mark.slow
def test_grad_accumulation_on_dp_tp_mesh(mm):
    """Accumulation micro-steps on a dp/tp-only MULTI-DEVICE mesh: the
    grad path must thread the mesh context (make_parallel_config) exactly
    like the fused step — a stale `use_ring or pp > 1` condition left
    parallel=None here, which on real TPUs means Pallas kernels outside a
    shard_map (a trace-time crash) and no SP activation pinning. This is
    the 72B stage-2 recipe's shape (dp8xtp8, GBS 512 @ mbs 8);
    dp4xtp2 here (the 8 virtual devices)."""
    cfg = tiny_test_config(vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    host = jax.tree.map(np.asarray, params)

    def run(micro_batch):
        tcfg = TrainerConfig(
            seq_len=128, logit_budget=64, global_batch=8, steps=1,
            micro_batch=micro_batch, mesh=MeshConfig(dp=4, tp=2),
            optim=OptimizerConfig(lr=3e-3, total_steps=8), remat=False,
        )
        trainer = Trainer(jax.tree.map(jnp.asarray, host), cfg, tcfg)
        from long_vita_tpu.training.train_step import make_parallel_config

        if micro_batch:  # the accum grad path must see the mesh context
            assert make_parallel_config(trainer.mesh) is not None
        rows = micro_batch or 8
        src = TrainerConfig(seq_len=128, logit_budget=64,
                            global_batch=rows, mesh=MeshConfig())
        batches = list(_pipeline(mm, src))[: 8 // rows]
        result = trainer.train(iter(batches))
        return result["losses"]

    losses_f, losses_a = run(0), run(4)
    assert len(losses_f) == len(losses_a) == 1
    np.testing.assert_allclose(losses_f, losses_a, rtol=2e-3)


@pytest.mark.slow
def test_grad_accumulation_matches_fused(mm):
    """GBS 4 @ mbs 2 (2 accumulation micro-steps) must match the fused
    GBS-4 step when the micro-batches' token counts are equal (the
    reference's Megatron accumulation loop; stage-4 runs GBS 8 @ mbs 1 —
    one fused 8x1M-row step would hold 8x the activations)."""
    cfg = tiny_test_config(vocab_size=-(-(len(mm.tokenizer) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    host = jax.tree.map(np.asarray, params)

    def run(micro_batch):
        tcfg = TrainerConfig(
            seq_len=128, logit_budget=64, global_batch=4, steps=2,
            micro_batch=micro_batch, mesh=MeshConfig(),
            optim=OptimizerConfig(lr=3e-3, total_steps=8), remat=False,
        )
        trainer = Trainer(
            jax.tree.map(jnp.asarray, host), cfg, tcfg
        )
        rows = micro_batch or 4
        src = TrainerConfig(
            seq_len=128, logit_budget=64, global_batch=rows,
            mesh=MeshConfig(),
        )
        batches = list(_pipeline(mm, src))[: 2 * (4 // rows)]
        result = trainer.train(iter(batches))
        return result["losses"], trainer.state

    losses_f, state_f = run(0)        # fused GBS 4
    losses_a, state_a = run(2)        # 2 micro-steps of 2 rows
    assert len(losses_f) == len(losses_a) == 2
    # identical pack stream and rows per optimizer step — but accumulation
    # averages PER-MICRO means (the reference's loss/num_micro reduction)
    # while the fused step takes one global token mean, so packs with
    # unequal supervised-token counts differ at O(count skew), not exactly
    np.testing.assert_allclose(losses_f, losses_a, rtol=2e-3)
    # adam normalizes grads, so the tiny weighting difference can flip the
    # update sign on near-zero-grad elements: bound |diff| by ~2 steps of
    # lr (gross errors like double-applied grads are 100x larger). The
    # EXACT check lives in test_grad_accumulation_exact_with_equal_counts.
    for a, b in zip(
        jax.tree.leaves(state_f.params), jax.tree.leaves(state_a.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-2
        )


def test_grad_accumulation_exact_with_equal_counts():
    """With EQUAL supervised-token counts per micro-batch, accumulation is
    exactly the fused step (mean of means == global mean)."""
    import __graft_entry__ as g
    from long_vita_tpu.training.train_step import (
        init_train_state,
        make_grad_accum_steps,
        make_train_step,
    )
    from long_vita_tpu.training.optimizer import make_optimizer

    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, np.float32)
    host = jax.tree.map(np.asarray, params)
    tx = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup_steps=1, total_steps=10),
        num_vit_layers=cfg.vision.num_hidden_layers,
    )
    rng = np.random.default_rng(0)
    full = g._tiny_batch(cfg, rng, batch=2, seq=64, n_tiles=2, budget=16)
    full = {
        k: (np.asarray(v) if v is not None else None)
        for k, v in full.items()
    }
    row_keys = ("tokens", "positions", "segment_ids", "logit_positions",
                "labels")

    state = init_train_state(jax.tree.map(jnp.asarray, host), tx)
    step = make_train_step(cfg, tx)
    state_f, m_f = step(
        state,
        {k: (jnp.asarray(v) if v is not None else None)
         for k, v in full.items()},
    )

    state = init_train_state(jax.tree.map(jnp.asarray, host), tx)
    grad_fn, accum_fn, apply_fn = make_grad_accum_steps(cfg, tx)
    grads = loss_sum = count_sum = None
    for r in range(2):
        mb = {
            k: (v[r : r + 1] if k in row_keys else None)
            for k, v in full.items() if k in row_keys
        }
        # the tiles sit in batch row 0 (tiny-batch construction)
        mb["images"] = full["images"] if r == 0 else None
        mb["image_indices"] = full["image_indices"] if r == 0 else None
        mb = {k: (jnp.asarray(v) if v is not None else None)
              for k, v in mb.items()}
        gr, loss_mb, count_mb = grad_fn(state.params, mb)
        if grads is None:
            grads, loss_sum, count_sum = gr, loss_mb, count_mb
        else:
            grads = accum_fn(grads, gr)
            loss_sum, count_sum = loss_sum + loss_mb, count_sum + count_mb
    state_a, m_a = apply_fn(
        state, grads, loss_sum, count_sum, jnp.asarray(2.0)
    )
    assert float(m_f["loss"]) == pytest.approx(float(m_a["loss"]), abs=1e-6)
    for a, b in zip(
        jax.tree.leaves(state_f.params), jax.tree.leaves(state_a.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-6
        )


def test_cp_sharded_grads_match_unsharded():
    """cp-sharded train grads == unsharded grads (exercises _cp_dense's
    cp-local weight-grad VJP against the default all-token contraction)."""
    from long_vita_tpu.models.qwen2 import ParallelConfig
    from long_vita_tpu.parallel.mesh import make_mesh
    from long_vita_tpu.parallel.zigzag import (
        inverse_zigzag_permutation,
        zigzag_permute,
    )
    from long_vita_tpu.training.train_step import loss_fn

    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    seq, budget, cp = 128, 32, 2
    tokens = rng.integers(0, cfg.text.vocab_size, size=(1, seq))
    pos = np.broadcast_to(np.arange(seq), (1, seq)).copy()
    logit_positions = np.linspace(4, seq - 2, budget).astype(np.int32)[None]
    labels = tokens[0][logit_positions + 1].astype(np.int32)
    base = {
        "tokens": jnp.asarray(tokens), "positions": jnp.asarray(pos),
        "segment_ids": jnp.zeros((1, seq), jnp.int32),
        "logit_positions": jnp.asarray(logit_positions),
        "labels": jnp.asarray(labels),
        "images": None, "image_indices": None,
    }
    def gfn(par):
        return jax.jit(
            jax.grad(lambda p, b: loss_fn(p, b, cfg, par, True)[0])
        )
    g_ref = gfn(None)(params, base)

    mesh = make_mesh(MeshConfig(dp=1, cp=cp, tp=2), devices=jax.devices()[:4])
    inv = inverse_zigzag_permutation(seq, cp)
    permuted = dict(base)
    for key in ("tokens", "positions", "segment_ids"):
        permuted[key] = zigzag_permute(base[key], cp)
    permuted["logit_positions"] = jnp.asarray(inv)[base["logit_positions"]]
    g_cp = gfn(ParallelConfig(mesh))(params, permuted)

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_cp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-4
        )


def test_tp2d_grads_match_unsharded():
    """2-D TP (tq axis: weights sharded over BOTH matrix dims, hidden@tq
    activations — the reference's vestigial tp_x/tp_y,
    parallel_state.py:1010-1060) is a pure layout: loss and grads on a
    dp2 x tp2 x tq2 mesh must match the unsharded single-config run."""
    from long_vita_tpu.models.qwen2 import ParallelConfig
    from long_vita_tpu.parallel.mesh import make_mesh, validate_geometry
    from long_vita_tpu.parallel.sharding import shard_params
    from long_vita_tpu.training.train_step import loss_fn

    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    seq, budget = 128, 32
    tokens = rng.integers(0, cfg.text.vocab_size, size=(2, seq))
    pos = np.broadcast_to(np.arange(seq), (2, seq)).copy()
    logit_positions = np.broadcast_to(
        np.linspace(4, seq - 2, budget).astype(np.int32), (2, budget)
    ).copy()
    labels = np.take_along_axis(
        tokens, logit_positions + 1, axis=1
    ).astype(np.int32)
    base = {
        "tokens": jnp.asarray(tokens), "positions": jnp.asarray(pos),
        "segment_ids": jnp.zeros((2, seq), jnp.int32),
        "logit_positions": jnp.asarray(logit_positions),
        "labels": jnp.asarray(labels),
        "images": None, "image_indices": None,
    }

    def run(par, p):
        return jax.jit(jax.value_and_grad(
            lambda p_, b: loss_fn(p_, b, cfg, par, True)[0]
        ))(p, base)

    loss_ref, g_ref = run(None, params)

    mc = MeshConfig(dp=2, tp=2, tq=2)
    validate_geometry(cfg.text, mc, seq_len=seq)
    mesh = make_mesh(mc)
    sharded = shard_params(params, mesh)
    # both matrix dims really shard
    qk = sharded["text"]["layers"]["q_proj"]["kernel"].sharding.spec
    assert tuple(qk) == (None, "tq", "tp"), qk
    loss_2d, g_2d = run(ParallelConfig(mesh), sharded)
    np.testing.assert_allclose(
        np.asarray(loss_2d), np.asarray(loss_ref), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_2d)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-4
        )


def test_vit_chunk_remat_grads_match():
    """remat='vit' (chunk-level vision-tower remat: save only each tile
    chunk's pixels, replay tower+projector in backward) is a pure memory
    policy — grads must be bit-compatible with remat=True. Guards the
    stage-2 depth-sweep path (benchmarks/train_step_mm.py --vit-remat)."""
    from long_vita_tpu.models.long_vita import long_vita_forward
    from long_vita_tpu.training.loss import cross_entropy

    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    seq, n_tiles = 64, 4
    t = (cfg.vision.image_size // cfg.vision.patch_size // 2) ** 2
    tokens = jnp.asarray(rng.integers(0, cfg.text.vocab_size, size=(1, seq)))
    pos = jnp.broadcast_to(jnp.arange(seq), (1, seq))
    images = jnp.asarray(rng.standard_normal(
        (n_tiles, cfg.vision.image_size, cfg.vision.image_size, 3)
    ), jnp.float32)
    seq_idx = np.arange(n_tiles * t).reshape(n_tiles, t)
    idx = jnp.asarray(np.stack([np.zeros_like(seq_idx), seq_idx]))
    labels = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, size=(1, seq))
    )

    def loss(p, remat):
        logits, _ = long_vita_forward(
            p, tokens, pos, cfg, images=images, image_indices=idx,
            vision_chunk=2, remat=remat,
        )
        s, c = cross_entropy(logits, labels)
        return s / c

    g_full = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    g_vit = jax.jit(jax.grad(lambda p: loss(p, "vit")))(params)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_vit)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
        )


def test_vocab_parallel_loss_matches_plain_head():
    """vocab_parallel_ce (tp-sharded budget-row logits GEMM + CE, no
    lm_head all-gather — VERDICT round-3 #6) reproduces the plain
    gather-then-lm_head loss AND its grads on the same mesh."""
    from long_vita_tpu.models.qwen2 import ParallelConfig
    from long_vita_tpu.parallel.mesh import make_mesh
    from long_vita_tpu.parallel.zigzag import (
        inverse_zigzag_permutation,
        zigzag_permute,
    )
    from long_vita_tpu.training.train_step import loss_fn

    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    rng = np.random.default_rng(4)
    seq, budget, cp = 128, 32, 2
    tokens = rng.integers(0, cfg.text.vocab_size, size=(1, seq))
    pos = np.broadcast_to(np.arange(seq), (1, seq)).copy()
    logit_positions = np.linspace(4, seq - 2, budget).astype(np.int32)[None]
    labels = tokens[0][logit_positions + 1].astype(np.int32)
    # mask some rows: IGNORE_INDEX handling must agree between the paths
    labels[0, ::5] = -100
    mesh = make_mesh(MeshConfig(dp=1, cp=cp, tp=2), devices=jax.devices()[:4])
    inv = inverse_zigzag_permutation(seq, cp)
    batch = {
        "tokens": zigzag_permute(jnp.asarray(tokens), cp),
        "positions": zigzag_permute(jnp.asarray(pos), cp),
        "segment_ids": zigzag_permute(jnp.zeros((1, seq), jnp.int32), cp),
        "logit_positions": jnp.asarray(inv)[jnp.asarray(logit_positions)],
        "labels": jnp.asarray(labels),
        "images": None, "image_indices": None,
    }
    par = ParallelConfig(mesh)

    def run(vp):
        return jax.jit(jax.value_and_grad(
            lambda p, b: loss_fn(
                p, b, cfg, par, True, 0, False, False, vp
            )[0]
        ))(params, batch)

    loss_plain, g_plain = run(False)
    loss_vp, g_vp = run(True)
    np.testing.assert_allclose(
        np.asarray(loss_vp), np.asarray(loss_plain), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_vp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-5
        )


def test_checkpoint_layer_layout_guard(tmp_path):
    """Interleaved-pp checkpoints record their chunk-major layer layout:
    same-geometry resume restores directly, a mismatched-geometry
    load_checkpoint fails loudly, and restore_params_only (stage handoff)
    returns CANONICAL layer order regardless of the source layout."""
    import optax

    from long_vita_tpu.parallel.pipeline import permute_layer_stack
    from long_vita_tpu.training.checkpoint import (
        load_checkpoint,
        restore_params_only,
        save_checkpoint,
    )
    from long_vita_tpu.training.train_step import init_train_state

    import dataclasses as dc

    base = tiny_test_config(vocab_size=512)
    cfg = dc.replace(base, text=dc.replace(base.text, num_hidden_layers=4))
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tx = optax.sgd(1e-2)
    # simulate a (pp=2, v=2) run's state: chunk-major layer stacks
    permuted = {
        **params,
        "text": {
            **params["text"],
            "layers": permute_layer_stack(params["text"]["layers"], 2, 2),
        },
    }
    state = init_train_state(jax.tree.map(np.array, permuted), tx, None)
    save_checkpoint(str(tmp_path / "ck"), state, step=1, layer_layout=(2, 2))

    # same-layout resume: fine
    restored = load_checkpoint(
        str(tmp_path / "ck"), state, layer_layout=(2, 2)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.params["text"]["layers"]["input_norm"]),
        np.asarray(permuted["text"]["layers"]["input_norm"]),
    )

    # different-layout resume: loud failure, not silent layer scramble
    with pytest.raises(ValueError, match="interleave layout"):
        load_checkpoint(str(tmp_path / "ck"), state, layer_layout=(1, 1))

    # stage handoff: canonical order comes back
    handoff = restore_params_only(str(tmp_path / "ck"), state.params)
    np.testing.assert_array_equal(
        np.asarray(handoff["text"]["layers"]["input_norm"]),
        np.asarray(params["text"]["layers"]["input_norm"]),
    )
