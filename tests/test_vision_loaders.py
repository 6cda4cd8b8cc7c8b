"""Golden parity: HF CLIPVisionModel / SiglipVisionModel checkpoints loaded
into generic_vit must reproduce the HF encoder features (pre-post-LN hidden
state — the reference converters drop ln_post/post_layernorm:
ckpt_converter_clip.py:39, ckpt_converter_siglip.py:85)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from long_vita_tpu.models.generic_vit import generic_vit
from long_vita_tpu.utils.vision_loaders import (
    load_clip_vit_params,
    load_siglip_vit_params,
    vit_config_from_hf,
)


def _save_hf(model, hf_cfg, out_dir):
    from safetensors.torch import save_file

    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(sd, str(out_dir / "model.safetensors"))
    json.dump(hf_cfg.to_dict(), open(out_dir / "config.json", "w"))


@pytest.mark.parametrize("family", ["clip", "siglip"])
def test_hf_tower_parity(tmp_path, family):
    torch.manual_seed(0)
    if family == "clip":
        hf_cfg = transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=28, patch_size=14,
            hidden_act="quick_gelu",
        )
        model = transformers.CLIPVisionModel(hf_cfg).eval()
    else:
        hf_cfg = transformers.SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=28, patch_size=14,
            hidden_act="gelu_pytorch_tanh",
        )
        model = transformers.SiglipVisionModel(hf_cfg).eval()
    out = tmp_path / family
    out.mkdir()
    _save_hf(model, hf_cfg, out)

    cfg = vit_config_from_hf(str(out), family)
    load = load_clip_vit_params if family == "clip" else load_siglip_vit_params
    params = load(str(out), cfg, dtype=jnp.float32)

    pix = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        hf = model(pix, output_hidden_states=True)
    want = hf.hidden_states[-1].numpy()  # encoder output, before post-LN

    got = generic_vit(
        params, jnp.asarray(pix.permute(0, 2, 3, 1).numpy()), cfg
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_eva_post_norm_structure():
    """EVA preset: post-norm residual stream stays un-normalized between
    layers (eva_vit_model.py:46-60); un-normed vs pre-LN towers must differ."""
    import dataclasses

    import jax

    from long_vita_tpu.models.generic_vit import (
        GenericViTConfig, init_generic_vit_params,
    )

    cfg = GenericViTConfig(32, 64, 2, 4, 28, post_norm=True)
    params = init_generic_vit_params(jax.random.PRNGKey(0), cfg)
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 3))
    out_post = generic_vit(params, pix, cfg)
    assert np.isfinite(np.asarray(out_post)).all()

    pre_cfg = dataclasses.replace(cfg, post_norm=False)
    out_pre = generic_vit(params, pix, pre_cfg)
    assert float(np.abs(np.asarray(out_post - out_pre)).max()) > 1e-4
