"""Tokenizer extension: register the multimodal special tokens.

Behavioral parity target: reference long_vita/tokenizer.py:22-31 — the same
17 tokens, added as special tokens, so token ids line up with the released
checkpoints' resized embedding tables.
"""
from __future__ import annotations

from long_vita_tpu.constants import (
    BOX_END_TOKEN,
    BOX_START_TOKEN,
    IMG_CONTEXT_TOKEN,
    IMG_END_TOKEN,
    IMG_START_TOKEN,
    IMG_TAG_TOKEN,
    PATCH_CONTEXT_TOKEN,
    PATCH_END_TOKEN,
    PATCH_START_TOKEN,
    QUAD_END_TOKEN,
    QUAD_START_TOKEN,
    REF_END_TOKEN,
    REF_START_TOKEN,
    VID_CONTEXT_TOKEN,
    VID_END_TOKEN,
    VID_START_TOKEN,
    VID_TAG_TOKEN,
)

SPECIAL_TOKENS = [
    IMG_START_TOKEN, IMG_END_TOKEN, IMG_CONTEXT_TOKEN,
    VID_START_TOKEN, VID_END_TOKEN, VID_CONTEXT_TOKEN,
    PATCH_START_TOKEN, PATCH_END_TOKEN, PATCH_CONTEXT_TOKEN,
    QUAD_START_TOKEN, QUAD_END_TOKEN, REF_START_TOKEN, REF_END_TOKEN,
    BOX_START_TOKEN, BOX_END_TOKEN, IMG_TAG_TOKEN, VID_TAG_TOKEN,
]


def update_tokenizer(tokenizer):
    """Add the 17 multimodal special tokens (idempotent)."""
    tokenizer.add_tokens(SPECIAL_TOKENS, special_tokens=True)
    return tokenizer


# Qwen2.5 ChatML (the released checkpoints' tokenizer_config carries the
# full tool-aware template; this is the no-tools core, same rendering).
QWEN_CHATML_TEMPLATE = (
    "{%- if messages[0]['role'] != 'system' %}"
    "{{- '<|im_start|>system\\nYou are Qwen, created by Alibaba Cloud. "
    "You are a helpful assistant.<|im_end|>\\n' }}{%- endif %}"
    "{%- for message in messages %}"
    "{{- '<|im_start|>' + message['role'] + '\\n' + message['content'] "
    "+ '<|im_end|>' + '\\n' }}{%- endfor %}"
    "{%- if add_generation_prompt %}{{- '<|im_start|>assistant\\n' }}"
    "{%- endif %}"
)

# The reference SERVER renders with the "long_vita" template
# (configs/finetune/templates.json via --prompt-type long_vita,
# inference_..._server.sh:174): plain ChatML with NO default system message,
# stop word <|im_end|>. Serving/eval must use this for answer parity.
LONG_VITA_CHAT_TEMPLATE = (
    "{%- for message in messages %}"
    "{{- '<|im_start|>' + message['role'] + '\\n' + message['content'] "
    "+ '<|im_end|>' + '\\n' }}{%- endfor %}"
    "{%- if add_generation_prompt %}{{- '<|im_start|>assistant\\n' }}"
    "{%- endif %}"
)


def load_tokenizer(path: str, template: str = "long_vita"):
    """Load an HF tokenizer dir, add special tokens, set the chat template.

    template "long_vita" (default) matches the reference server's rendering
    (no default system message); "checkpoint" keeps the tokenizer_config's
    own template (Qwen default-system behavior); "qwen" forces ChatML with
    the Qwen system default.
    """
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(path, trust_remote_code=False)
    tokenizer = update_tokenizer(tokenizer)
    if template == "long_vita":
        tokenizer.chat_template = LONG_VITA_CHAT_TEMPLATE
    elif template == "qwen" or tokenizer.chat_template is None:
        tokenizer.chat_template = QWEN_CHATML_TEMPLATE
    return tokenizer
