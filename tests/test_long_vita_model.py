"""Full-VLM glue tests: image-feature scatter, logits-masked head, KV cache."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.models.long_vita import (
    init_long_vita_params,
    long_vita_forward,
    merge_image_embeddings,
)
from long_vita_tpu.models.qwen2 import KVCache


def test_merge_image_embeddings_scatter():
    embeds = jnp.zeros((2, 10, 4))
    feats = jnp.ones((1, 3, 4))  # one "tile", 3 tokens
    indices = jnp.array([[[1, 1, 1]], [[4, 5, 6]]])  # batch 1, seq 4..6
    out = merge_image_embeddings(embeds, feats, indices)
    assert float(out[1, 4, 0]) == 1.0
    assert float(out[1, 6, 3]) == 1.0
    assert float(out[0, 4, 0]) == 0.0
    assert float(out[1, 3, 0]) == 0.0


def test_merge_image_embeddings_chunked_parity():
    """Chunked scan merge == one-shot scatter — incl. a non-divisible
    tile count (OOB padding rows must drop). Indices are collision-free,
    matching the data pipeline's contract (each <IMG_CONTEXT> position
    belongs to exactly one tile); duplicate-index ordering is
    implementation-defined in XLA scatter and deliberately untested."""
    from long_vita_tpu.models.long_vita import merge_image_embeddings_chunked

    rng = np.random.default_rng(0)
    b, s, h, t, n = 2, 64, 8, 4, 7  # 7 tiles, chunk 3 -> pad 2
    embeds = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((n, t, h)), jnp.float32)
    # collision-free (b, s) cells: one distinct flat cell per tile token
    cells = rng.choice(b * s, size=n * t, replace=False)
    indices = jnp.asarray(
        np.stack([(cells // s).reshape(n, t), (cells % s).reshape(n, t)])
    )

    ref = merge_image_embeddings(embeds, feats, indices)
    for chunk in (1, 2, 3, 7, 16):
        out = merge_image_embeddings_chunked(embeds, feats, indices, chunk)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_vlm_forward_with_images_and_logit_mask():
    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg)
    b, s = 1, 24
    t = cfg.image_token_length
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, size=(b, s)))
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    images = jnp.asarray(
        rng.standard_normal((2, cfg.vision.image_size, cfg.vision.image_size, 3)),
        dtype=jnp.float32,
    )
    # two tiles at seq positions [3..3+t) and [3+t+1...)
    starts = [3, 3 + t + 1]
    idx_s = jnp.asarray([[st + i for i in range(t)] for st in starts])
    indices = jnp.stack([jnp.zeros_like(idx_s), idx_s], axis=0)

    logits_full, _ = long_vita_forward(
        params, ids, pos, cfg, images=images, image_indices=indices,
        attn_impl="xla",
    )
    assert logits_full.shape == (b, s, cfg.text.vocab_size)
    assert logits_full.dtype == jnp.float32
    assert not np.any(np.isnan(np.asarray(logits_full)))

    # logits-masked head: gather rows then project == project then gather
    keep = jnp.asarray([[0, 5, 23]])
    logits_masked, _ = long_vita_forward(
        params, ids, pos, cfg, images=images, image_indices=indices,
        logit_positions=keep, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits_masked),
        np.asarray(logits_full)[:, np.asarray(keep)[0]],
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_vlm_prefill_then_decode_consistency():
    cfg = tiny_test_config()
    params = init_long_vita_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    s = 16
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, size=(1, s)))
    pos = jnp.broadcast_to(jnp.arange(s), (1, s))

    logits_full, _ = long_vita_forward(params, ids, pos, cfg, attn_impl="xla")

    cache = KVCache.zeros(cfg.text, batch=1, max_len=32, dtype=jnp.float32)
    logits_pre, cache = long_vita_forward(
        params, ids[:, :12], pos[:, :12], cfg, kv_cache=cache, attn_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, :12]), rtol=1e-4, atol=1e-4
    )
    for t in range(12, s):
        logits_t, cache = long_vita_forward(
            params, ids[:, t : t + 1], jnp.full((1, 1), t), cfg,
            kv_cache=cache, attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(logits_t[0, 0]),
            np.asarray(logits_full[0, t]),
            rtol=1e-4, atol=1e-4,
        )
