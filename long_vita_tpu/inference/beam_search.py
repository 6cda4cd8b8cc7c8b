"""Beam search decoding.

Reference semantics: beam_search_and_post_process
(long_vita_megatron/inference/text_generation/generation.py:283-452 +
beam_utils.py:17): length-penalized log-prob scores, beams that emit the
stop token are frozen, search ends when the worst kept finished beam
outscores any possible continuation.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from long_vita_tpu.models import qwen2
from long_vita_tpu.models.qwen2 import KVCache


@dataclasses.dataclass
class BeamHypothesis:
    token_ids: list[int]
    score: float


def _length_penalty_score(logprob_sum: float, length: int, alpha: float) -> float:
    return logprob_sum / (max(length, 1) ** alpha)


def beam_search(
    engine,
    input_ids,
    *,
    images=None,
    image_indices=None,
    beam_size: int = 4,
    max_new_tokens: int = 64,
    length_penalty: float = 1.0,
    num_return: int = 1,
) -> list[BeamHypothesis]:
    """Run beam search from a prompt. Returns hypotheses best-first."""
    cfg = engine.cfg
    eos = engine.eos_id

    cache, last_hidden, true_len = engine.prefill(
        input_ids, images, image_indices
    )
    logits = np.asarray(
        qwen2.lm_head(engine.params["text"], last_hidden)[0], np.float32
    )
    logprobs = logits - (np.log(np.sum(np.exp(logits - logits.max())))
                         + logits.max())

    top = np.argsort(logprobs)[::-1][:beam_size]
    beams = [([int(t)], float(logprobs[t])) for t in top]
    finished: list[BeamHypothesis] = []

    # replicate the cache across beams, keeping the engine's mesh layout
    # (cp-sharded slots / tp-sharded kv heads survive the beam expansion)
    cache = engine.shard_cache(KVCache(
        jnp.repeat(cache.k, beam_size, axis=1),
        jnp.repeat(cache.v, beam_size, axis=1),
        cache.length,
        k_scale=(jnp.repeat(cache.k_scale, beam_size, axis=1)
                 if cache.k_scale is not None else None),
        v_scale=(jnp.repeat(cache.v_scale, beam_size, axis=1)
                 if cache.v_scale is not None else None),
    ))

    @jax.jit
    def step(params, tokens, pos, cache):
        embeds = qwen2.embed_tokens(params["text"], tokens)
        hidden, cache = qwen2.qwen2_decoder(
            params["text"], embeds, pos, cfg.text, kv_cache=cache,
            parallel=engine.parallel,
        )
        logits = qwen2.lm_head(params["text"], hidden[:, -1])
        return jax.nn.log_softmax(logits, axis=-1), cache

    pos = true_len
    for _ in range(max_new_tokens - 1):
        tokens = jnp.asarray([[b[0][-1]] for b in beams], jnp.int32)
        lp, cache = step(
            engine.params, tokens, jnp.full((beam_size, 1), pos), cache
        )
        lp = np.asarray(lp, np.float32)  # [beams, V]
        pos += 1

        # expand: all (beam, token) continuations
        totals = np.asarray([b[1] for b in beams])[:, None] + lp
        flat = totals.reshape(-1)
        top = np.argsort(flat)[::-1][: beam_size * 2]

        new_beams = []
        reorder = []
        for idx in top:
            b_idx, tok = divmod(int(idx), lp.shape[1])
            seq = beams[b_idx][0] + [tok]
            score = float(flat[idx])
            if tok == eos:
                finished.append(
                    BeamHypothesis(
                        seq[:-1],
                        _length_penalty_score(score, len(seq), length_penalty),
                    )
                )
            elif len(new_beams) < beam_size:
                new_beams.append((seq, score))
                reorder.append(b_idx)
        if not new_beams:
            break
        beams = new_beams
        order = jnp.asarray(reorder)
        cache = engine.shard_cache(KVCache(
            cache.k[:, order], cache.v[:, order], cache.length,
            k_scale=(cache.k_scale[:, order]
                     if cache.k_scale is not None else None),
            v_scale=(cache.v_scale[:, order]
                     if cache.v_scale is not None else None),
        ))

        if len(finished) >= beam_size:
            best_possible = _length_penalty_score(
                max(b[1] for b in beams), pos - true_len + 1, length_penalty
            )
            worst_kept = sorted(
                (h.score for h in finished), reverse=True
            )[beam_size - 1]
            if worst_kept >= best_possible:
                break

    for seq, score in beams:
        finished.append(
            BeamHypothesis(
                seq, _length_penalty_score(score, len(seq), length_penalty)
            )
        )
    finished.sort(key=lambda h: h.score, reverse=True)
    return finished[:num_return]
