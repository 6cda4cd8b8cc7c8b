"""END-TO-END golden parity: the reference LongVITAForCausalLM (torch)
vs our full VLM on identical weights, including the multimodal scatter.

This is the parity oracle SURVEY.md §7 names: the HF path the released
checkpoints run through.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.models.long_vita import long_vita_forward
from long_vita_tpu.utils.checkpoint_io import load_long_vita_checkpoint

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    import os

    if not os.path.isdir("/root/reference/long_vita/models"):
        pytest.skip("reference checkout unavailable")
    from tests.ref_oracle import make_tiny_reference

    cfg = tiny_test_config()
    ref = make_tiny_reference(cfg)

    # round-trip the reference weights through safetensors into our pytree
    from safetensors.torch import save_file

    tmp = tmp_path_factory.mktemp("ref_ckpt")
    sd = {k: v.contiguous() for k, v in ref.state_dict().items()}
    save_file(sd, str(tmp / "model.safetensors"))
    params, _ = load_long_vita_checkpoint(str(tmp), cfg, dtype=jnp.float32)
    return ref, params, cfg


def test_full_vlm_logits_match(pair):
    ref, params, cfg = pair
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
            images=torch.tensor(images),
            image_indices=torch.tensor(indices),
            use_cache=False,
        ).logits.numpy()

    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    got, _ = long_vita_forward(
        params, jnp.asarray(ids), pos, cfg,
        images=jnp.asarray(images.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
        image_indices=jnp.asarray(indices),
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_text_only_logits_match(pair):
    ref, params, cfg = pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.text.vocab_size, size=(1, 16))
    with torch.no_grad():
        want = ref(input_ids=torch.tensor(ids), use_cache=False).logits.numpy()
    pos = jnp.broadcast_to(jnp.arange(16), (1, 16))
    got, _ = long_vita_forward(
        params, jnp.asarray(ids), pos, cfg, attn_impl="xla"
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
