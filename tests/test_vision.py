"""Vision tower + projector tests.

InternViT parity uses the reference torch module (mounted read-only at
/root/reference) as a golden oracle when available; the pixel-shuffle test
uses an independent einops formulation as oracle.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig, VisionConfig, tiny_test_config
from long_vita_tpu.models.intern_vit import init_vit_params, intern_vit
from long_vita_tpu.models.projector import (
    init_projector_params,
    pixel_shuffle,
    project_features,
)

REFERENCE = "/root/reference/long_vita/models/long_vita_qwen2_intern"


def test_pixel_shuffle_matches_space_to_depth():
    """pixel_shuffle(0.5) == rearrange 'n (w2 a) (h2 b) c -> n w2 h2 (a b c)'."""
    from einops import rearrange

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 0.5))
    want = rearrange(x, "n (w2 a) (h2 b) c -> n w2 h2 (a b c)", a=2, b=2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_projector_shapes():
    cfg = tiny_test_config()
    params = init_projector_params(jax.random.PRNGKey(0), cfg)
    grid = cfg.vision.grid
    feats = jnp.ones((3, grid * grid, cfg.vision.hidden_size))
    out = project_features(params, feats, cfg)
    assert out.shape == (3, cfg.image_token_length, cfg.text.hidden_size)


def test_vit_output_shape():
    cfg = tiny_test_config().vision
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.ones((2, cfg.image_size, cfg.image_size, 3))
    out = intern_vit(params, pixels, cfg)
    assert out.shape == (2, cfg.seq_len, cfg.hidden_size)


# ---------------------------------------------------------------------------
# Golden parity vs reference torch InternViT
# ---------------------------------------------------------------------------

def _load_reference_vit():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    # DropPath at rate 0 is identity; stub timm so the module imports.
    if "timm" not in sys.modules:
        import importlib.machinery

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        for mod_ in (timm, models, layers):
            mod_.__spec__ = importlib.machinery.ModuleSpec(mod_.__name__, None)
        layers.DropPath = torch.nn.Identity
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    import importlib.util

    def _import(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkg = types.ModuleType("ref_vit_pkg")
    pkg.__path__ = [REFERENCE]
    sys.modules["ref_vit_pkg"] = pkg
    _import("ref_vit_pkg.configuration_intern_vit", f"{REFERENCE}/configuration_intern_vit.py")
    return _import("ref_vit_pkg.modeling_intern_vit", f"{REFERENCE}/modeling_intern_vit.py")


def _torch_vit_to_jax(model, cfg: VisionConfig):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    l = cfg.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = [sd[fmt.format(i)] for i in range(l)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats))

    conv_w = sd["embeddings.patch_embedding.weight"]  # [H, C, p, p]
    patch_kernel = jnp.asarray(
        conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
    )
    p = "encoder.layers.{}."
    return {
        "embeddings": {
            "patch_embed": {
                "kernel": patch_kernel,
                "bias": jnp.asarray(sd["embeddings.patch_embedding.bias"]),
            },
            "cls_token": jnp.asarray(sd["embeddings.class_embedding"]),
            "pos_embed": jnp.asarray(sd["embeddings.position_embedding"][0]),
        },
        "layers": {
            "norm1": {
                "scale": stack(p + "norm1.weight"),
                "bias": stack(p + "norm1.bias"),
            },
            "norm2": {
                "scale": stack(p + "norm2.weight"),
                "bias": stack(p + "norm2.bias"),
            },
            "qkv": {
                "kernel": stack(p + "attn.qkv.weight", transpose=True),
                "bias": stack(p + "attn.qkv.bias"),
            },
            "proj": {
                "kernel": stack(p + "attn.proj.weight", transpose=True),
                "bias": stack(p + "attn.proj.bias"),
            },
            "fc1": {
                "kernel": stack(p + "mlp.fc1.weight", transpose=True),
                "bias": stack(p + "mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": stack(p + "mlp.fc2.weight", transpose=True),
                "bias": stack(p + "mlp.fc2.bias"),
            },
            "ls1": stack(p + "ls1"),
            "ls2": stack(p + "ls2"),
        },
    }


def test_vit_parity_vs_reference():
    torch = pytest.importorskip("torch")
    mod = _load_reference_vit()
    from ref_vit_pkg.configuration_intern_vit import InternVisionConfig

    cfg = VisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=56,
        patch_size=14,
    )
    ref_cfg = InternVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        use_flash_attn=False,
        drop_path_rate=0.0,
        qk_normalization=False,
        qkv_bias=True,
        norm_type="layer_norm",
    )
    torch.manual_seed(0)
    ref = mod.InternVisionModel(ref_cfg)
    ref.eval()

    params = _torch_vit_to_jax(ref, cfg)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32
    )
    with torch.no_grad():
        want = ref(torch.tensor(pixels)).last_hidden_state.numpy()

    # ours takes NHWC
    got = np.asarray(
        intern_vit(params, jnp.asarray(pixels.transpose(0, 2, 3, 1)), cfg)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
