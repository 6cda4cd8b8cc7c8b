"""Token sampling: greedy / temperature / top-k / top-p.

Reference semantics: _sample_strategy + top_k_logits
(long_vita_megatron/inference/text_generation/generation.py:474-514) —
temperature scaling, then top-k truncation, then nucleus (top-p) truncation,
then categorical sampling; greedy when top_k == 1 or do_sample is False.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 0.0  # 0 = disabled
    greedy: bool = True
    max_new_tokens: int = 256
    stop_token_ids: tuple = ()  # extra stop tokens (stop_on_eol etc.)
    return_logprobs: bool = False


def sample(
    logits: jnp.ndarray,  # [B, V] f32
    rng: jax.Array,
    params: SamplingParams,
) -> jnp.ndarray:
    """-> [B] int32 next tokens."""
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if params.temperature != 1.0:
        logits = logits / params.temperature

    if params.top_k:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if params.top_p:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always >= 1 token)
        cutoff_mask = cum - probs > params.top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)

    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
