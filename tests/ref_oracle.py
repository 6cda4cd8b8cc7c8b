"""Load the reference LongVITAForCausalLM (torch) as a golden test oracle.

The reference modeling files target transformers ~4.48; the installed 4.57
removed three things they rely on, shimmed here WITHOUT altering behavior:
  - timm.models.layers.DropPath (rate 0 == Identity in these configs)
  - transformers.utils.LossKwargs (an empty TypedDict mix-in)
  - Qwen2Model._update_causal_mask (rebuilt from cache_position: standard
    additive causal mask, which is exactly what 4.48 produced for eager)
"""
from __future__ import annotations

import importlib.machinery
import sys
import types

REF_MODELS = "/root/reference/long_vita/models"


def load_reference_vlm():
    import torch

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        for m in (timm, models, layers):
            m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, None)
        layers.DropPath = torch.nn.Identity
        timm.models = models
        models.layers = layers
        sys.modules.update(
            {"timm": timm, "timm.models": models, "timm.models.layers": layers}
        )

    import transformers.utils as tu
    from transformers.modeling_flash_attention_utils import FlashAttentionKwargs

    if not hasattr(tu, "LossKwargs"):
        base = type(FlashAttentionKwargs)
        tu.LossKwargs = base(
            "LossKwargs", (),
            {"__annotations__": {}, "__total__": False,
             "__module__": "transformers.utils"},
        )

    if REF_MODELS not in sys.path:
        sys.path.insert(0, REF_MODELS)
    import long_vita_qwen2_intern.modeling_long_vita as M

    if not hasattr(M.LongVITAModel, "_update_causal_mask"):
        def _update_causal_mask(self, attention_mask, input_tensor,
                                cache_position, past_key_values,
                                output_attentions=False):
            b, s = input_tensor.shape[:2]
            total = int(cache_position[-1]) + 1
            kv_idx = torch.arange(total)
            allowed = kv_idx[None, :] <= cache_position[:, None]  # [S, total]
            mask = torch.where(
                allowed, 0.0, torch.finfo(input_tensor.dtype).min
            ).to(input_tensor.dtype)
            return mask[None, None].expand(b, 1, s, total)

        M.LongVITAModel._update_causal_mask = _update_causal_mask
    return M


def make_tiny_reference(cfg):
    """Instantiate the reference VLM at our tiny_test_config geometry."""
    import torch

    M = load_reference_vlm()
    from long_vita_qwen2_intern.configuration_long_vita import (
        LongVITAConfig as RefCfg,
    )

    t, v = cfg.text, cfg.vision
    ref_cfg = RefCfg(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads,
        head_dim=t.head_dim,  # 4.57 reads config.head_dim (absent in 4.48)
        rms_norm_eps=t.rms_norm_eps, rope_theta=t.rope_theta,
        max_position_embeddings=t.max_position_embeddings,
        tie_word_embeddings=False, attn_implementation="eager",
        visual=dict(
            hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
            num_hidden_layers=v.num_hidden_layers,
            num_attention_heads=v.num_attention_heads,
            image_size=v.image_size, patch_size=v.patch_size,
            use_flash_attn=False, qkv_bias=True, qk_normalization=False,
            norm_type="layer_norm", drop_path_rate=0.0,
        ),
    )
    torch.manual_seed(0)
    model = M.LongVITAForCausalLM(ref_cfg)
    model.eval()

    # 4.48 decoder layers returned tuples; 4.57 returns a tensor, but the
    # reference's own forward loop indexes layer_outputs[0]. Wrap to tuple.
    for layer in model.model.layers:
        orig_forward = layer.forward

        def tupled(*a, _orig=orig_forward, **kw):
            out = _orig(*a, **kw)
            return out if isinstance(out, tuple) else (out,)

        layer.forward = tupled
    return model
