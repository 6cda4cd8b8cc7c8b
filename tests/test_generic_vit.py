"""Generic ViT variants (CLIP/SigLIP/EVA geometries, small versions)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.models.generic_vit import (
    GenericViTConfig,
    generic_vit,
    init_generic_vit_params,
)


@pytest.mark.parametrize("add_cls,ls,final_ln", [
    (True, False, False),   # CLIP-style
    (False, False, True),   # SigLIP-style
    (True, True, False),    # InternViT-style switches
])
def test_generic_vit_variants(add_cls, ls, final_ln):
    cfg = GenericViTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
        add_class_token=add_cls, use_layer_scale=ls, final_layernorm=final_ln,
    )
    params = init_generic_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 56, 56, 3)), jnp.float32
    )
    out = generic_vit(params, pixels, cfg)
    assert out.shape == (2, cfg.seq_len, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_presets():
    from long_vita_tpu.models.generic_vit import clip_vit_300m, eva_4b, siglip_so400m

    assert clip_vit_300m().num_hidden_layers == 24
    assert siglip_so400m().add_class_token is False
    assert siglip_so400m().seq_len == (384 // 14) ** 2
    assert eva_4b().hidden_size == 1792
