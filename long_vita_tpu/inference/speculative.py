"""Prompt-lookup speculative decoding (lossless, greedy).

Decode on TPU is HBM-bound: every emitted token re-reads the whole KV
cache once (PERF.md decode rows). A verify step that feeds k tokens at
once reads the cache ~once too, so accepting m>0 draft tokens per step
multiplies decode throughput by ~(m+1) at roughly the cost of one plain
step. Drafts come from the prompt itself (prompt-lookup / n-gram
speculation): Long-VITA's headline workloads — long-video QA, document
QA at 128K-1M — answer by quoting the context, exactly where n-gram
continuation hits.

Losslessness: greedy acceptance keeps only drafts that equal the
model's own argmax at that position, plus the model's next token at the
first mismatch ("bonus"). The emitted stream is bit-identical to plain
greedy decode (parity-tested in tests/test_speculative.py), so this is
a pure speed feature — it never changes outputs. The reference has no
analogue (one token per forward, its server emits one token per full
recompute).

Cache discipline: the verify step writes k rows at the current
frontier; rejected rows become masked garbage (the engine's standard
valid-length masking) and are overwritten by the next verify at the
advanced frontier. No rollback copies. The emitted-token kv accounting
matches engine.generate's frontier rule: every emitted token except the
final bonus has a valid kv row, so the prefix-cache put needs no
special casing.

Sampled (non-greedy) requests use the normal decode path — rejection-
sampling speculation is out of scope.
"""
from __future__ import annotations

import numpy as np

from numpy.lib.stride_tricks import sliding_window_view


def draft_tokens(
    history: np.ndarray, k: int, ngram_max: int = 3
) -> np.ndarray:
    """Propose up to k continuation tokens by longest-suffix n-gram lookup.

    Finds the most recent earlier occurrence of the history's trailing
    n-gram (n = ngram_max..1) and returns the tokens that followed it.
    Vectorized O(len(history) * n); ~1 ms at 1M tokens."""
    h = np.asarray(history, np.int32).reshape(-1)
    for n in range(min(ngram_max, len(h) - 1), 0, -1):
        pat = h[-n:]
        windows = sliding_window_view(h[:-1], n)
        hits = np.nonzero((windows == pat).all(axis=1))[0]
        if hits.size:
            start = int(hits[-1]) + n
            cont = h[start:start + k]
            if cont.size:
                return cont.astype(np.int32)
    return np.empty(0, np.int32)


def speculative_decode(
    engine,
    history: np.ndarray,
    token: int,
    pos: int,
    cache,
    budget: int,
    stop_set: set,
    k: int,
):
    """Greedy-decode up to `budget` tokens with k-token verify steps.

    history: prompt ids + `token` (the lookup corpus). token: last
    emitted, not yet fed. pos: its position (== current cache length).
    -> (tokens, logprobs, cache) — same contract as the plain decode
    path: tokens may include a stop token for the caller to truncate."""
    import jax
    import jax.numpy as jnp

    from long_vita_tpu.models.qwen2 import KVCache

    slots = cache.k.shape[2]
    hist = np.asarray(history, np.int32).reshape(-1)
    out: list[int] = []
    lps: list[float] = []
    hit_stop = False
    while budget > 0 and pos + k <= slots and not hit_stop:
        drafts = draft_tokens(hist, k - 1)
        step = np.zeros(k, np.int32)
        step[0] = token
        step[1:1 + len(drafts)] = drafts
        outs, olps, cache = engine._verify_step(
            engine.params, jnp.asarray(step[None]),
            jnp.asarray(pos, jnp.int32), cache,
        )
        engine._spec_steps += 1
        outs = np.asarray(outs[0])
        olps = np.asarray(olps[0])
        # accept drafts while they equal the model's own argmax
        j = 0
        while j < len(drafts) and step[j + 1] == outs[j]:
            j += 1
        # kv rows written and valid: step[0..j] (token + accepted drafts)
        pos += j + 1
        cache = KVCache(
            cache.k, cache.v, jnp.asarray(pos, jnp.int32),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
        emitted = [int(t) for t in outs[:j + 1]]  # j accepted + 1 bonus
        emit_lps = [float(x) for x in olps[:j + 1]]
        stop_at = next(
            (i for i, t in enumerate(emitted) if t in stop_set), None
        )
        if stop_at is not None:
            # keep the stop itself — generate()'s truncation expects it
            emitted, emit_lps = emitted[:stop_at + 1], emit_lps[:stop_at + 1]
            hit_stop = True
        take = min(len(emitted), budget)
        out += emitted[:take]
        lps += emit_lps[:take]
        budget -= take
        token = int(outs[j])  # bonus: emitted, kv not yet written
        hist = np.concatenate([hist, outs[:j + 1]])
    if budget > 0 and not hit_stop:
        # tail: not enough free cache slots for a full verify step
        toks, tlps, cache, _ = engine._decode_run(
            jnp.asarray([[token]], jnp.int32),
            jnp.full((1,), pos, jnp.int32), cache,
            jax.random.PRNGKey(0), _greedy_sp(engine, stop_set), budget,
            jnp.zeros((1,), bool),
        )
        out += [int(t) for t in np.asarray(toks[0])]
        lps += [float(x) for x in np.asarray(tlps[0])]
    return out, lps, cache


def _greedy_sp(engine, stop_set):
    from long_vita_tpu.inference.sampler import SamplingParams

    extra = tuple(stop_set - {engine.eos_id})
    return SamplingParams(greedy=True, stop_token_ids=extra)
