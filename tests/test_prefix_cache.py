"""Cross-request prefix KV cache: matching semantics + engine reuse parity.

The reference server recomputes the full prompt per request
(/root/reference/long_vita/serve/text_generation_server.py — no state is
kept between requests); the prefix cache is a beats-the-reference feature,
so parity here is against OUR OWN no-cache engine, token-for-token.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.data.multimodal import MultimodalTokenizer
from long_vita_tpu.inference.engine import InferenceEngine
from long_vita_tpu.inference.prefix_cache import (
    PrefixCache,
    copy_cache,
    media_fingerprint,
)
from long_vita_tpu.inference.sampler import SamplingParams
from long_vita_tpu.models.long_vita import init_long_vita_params
from long_vita_tpu.models.qwen2 import KVCache
from long_vita_tpu.tokenizer import QWEN_CHATML_TEMPLATE

REF_TOK = "/root/reference/long_vita/models/long_vita_qwen2_intern"
CHUNK = 16


def _tiny_cache(fill: float = 0.0, slots: int = 96) -> KVCache:
    cfg = tiny_test_config().text
    c = KVCache.zeros(cfg, 1, slots, jnp.float32)
    if fill:
        return KVCache(c.k + fill, c.v + fill, c.length)
    return c


# ---- unit: matching / eviction semantics ---------------------------------


def test_match_alignment_and_final_row_cap():
    pc = PrefixCache(max_entries=2, chunk=CHUNK)
    ids = np.arange(100, dtype=np.int32)
    pc.put(ids, _tiny_cache(1.0, 128), frontier=100)

    # exact repeat: capped at len-1=99 then aligned down -> 96
    cache, start = pc.match(ids)
    assert start == 96
    assert int(cache.length) == 96
    assert pc.hits == 1 and pc.tokens_saved == 96

    # longer query diverging at 50 -> aligned down to 48
    q = np.concatenate([ids[:50], 400 + np.arange(60, dtype=np.int32)])
    _, start = pc.match(q)
    assert start == 48

    # divergence before one chunk -> miss
    q = np.concatenate([ids[:10], [999] * 50]).astype(np.int32)
    assert pc.match(q) is None
    assert pc.misses == 1


def test_match_is_a_copy_not_an_alias():
    pc = PrefixCache(max_entries=1, chunk=CHUNK)
    ids = np.arange(64, dtype=np.int32)
    pc.put(ids, _tiny_cache(2.0), frontier=64)
    c1, _ = pc.match(ids)
    c2, _ = pc.match(ids)
    # engine donates restored caches into jitted steps; entries must survive
    assert c1.k.unsafe_buffer_pointer() != c2.k.unsafe_buffer_pointer()
    np.testing.assert_array_equal(np.asarray(c1.k), np.asarray(c2.k))


def test_put_replaces_shorter_snapshot_of_same_session():
    pc = PrefixCache(max_entries=4, chunk=CHUNK)
    ids = np.arange(80, dtype=np.int32)
    pc.put(ids[:48], _tiny_cache(1.0), frontier=48)
    pc.put(ids, _tiny_cache(2.0), frontier=80)  # same session, longer
    assert len(pc) == 1
    cache, start = pc.match(ids)
    assert start == 64  # from the longer snapshot (79 -> 64)
    assert float(np.asarray(cache.k).max()) == 2.0
    # shorter re-put of the same prefix keeps the longer entry
    pc.put(ids[:48], _tiny_cache(3.0), frontier=48)
    assert len(pc) == 1
    _, start = pc.match(ids)
    assert start == 64


def test_lru_eviction():
    pc = PrefixCache(max_entries=2, chunk=CHUNK)
    a = np.arange(32, dtype=np.int32)
    b = 1000 + np.arange(32, dtype=np.int32)
    c = 2000 + np.arange(32, dtype=np.int32)
    pc.put(a, _tiny_cache(), 32)
    pc.put(b, _tiny_cache(), 32)
    assert pc.match(a) is not None  # refresh a
    pc.put(c, _tiny_cache(), 32)  # evicts b (oldest tick)
    assert len(pc) == 2
    assert pc.match(b) is None
    assert pc.match(a) is not None and pc.match(c) is not None


def test_media_fingerprint_distinguishes_tiles():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 3, 8, 8)).astype(np.float32)
    b = a.copy()
    b[1, 0, 4, 4] += 1.0
    assert media_fingerprint(a) == media_fingerprint(a.copy())
    assert media_fingerprint(a) != media_fingerprint(b)
    assert media_fingerprint(None) == "" == media_fingerprint(a[:0])

    pc = PrefixCache(max_entries=2, chunk=CHUNK)
    ids = np.arange(64, dtype=np.int32)
    pc.put(ids, _tiny_cache(), 64, media_key=media_fingerprint(a))
    # same placeholder ids, different pixels -> MUST miss
    assert pc.match(ids, media_fingerprint(b)) is None
    assert pc.match(ids, media_fingerprint(a)) is not None


def test_copy_cache_preserves_quant_scales():
    cfg = tiny_test_config().text
    c = KVCache.zeros(cfg, 1, 64, quantize=True)
    c = KVCache(c.k + 3, c.v, c.length, k_scale=c.k_scale + 0.5,
                v_scale=c.v_scale)
    snap = copy_cache(c)
    assert snap.k_scale.unsafe_buffer_pointer() != c.k_scale.unsafe_buffer_pointer()
    np.testing.assert_array_equal(np.asarray(snap.k_scale), np.asarray(c.k_scale))
    np.testing.assert_array_equal(np.asarray(snap.k), np.asarray(c.k))


# ---- engine integration ---------------------------------------------------


@pytest.fixture(scope="module")
def engines():
    transformers = pytest.importorskip("transformers")
    import os

    if not os.path.isdir(REF_TOK):
        pytest.skip("tokenizer assets unavailable")
    tok = transformers.Qwen2Tokenizer(
        vocab_file=f"{REF_TOK}/vocab.json", merges_file=f"{REF_TOK}/merges.txt"
    )
    tok.chat_template = QWEN_CHATML_TEMPLATE
    from long_vita_tpu.data.image_processor import ImageProcessor

    mm = MultimodalTokenizer(
        tok, image_processor=ImageProcessor(image_size=56),
        image_token_length=4,
    )
    cfg = tiny_test_config(vocab_size=-(-(len(tok) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    plain = InferenceEngine(
        params, cfg, mm, max_seq_len=512, chunk=CHUNK,
        cache_dtype=jnp.float32,
    )
    cached = InferenceEngine(
        params, cfg, mm, max_seq_len=512, chunk=CHUNK,
        cache_dtype=jnp.float32, prefix_cache_entries=2,
    )
    return plain, cached


def _greedy(n=8):
    return SamplingParams(greedy=True, max_new_tokens=n)


def test_multiturn_reuse_matches_no_cache_engine(engines):
    plain, cached = engines
    turn1 = [{"role": "user", "content": "tell me about the long video"}]
    r_plain = plain.generate(turn1, sampling=_greedy())
    r_cached = cached.generate(turn1, sampling=_greedy())
    assert r_plain.token_ids == r_cached.token_ids
    assert len(cached.prefix_cache) >= 1  # module fixture: order-independent

    turn2 = turn1 + [
        {"role": "assistant", "content": r_cached.text},
        {"role": "user", "content": "and then what happened?"},
    ]
    r_plain2 = plain.generate(turn2, sampling=_greedy())
    # the turn-2 prompt prefix-matches turn 1's snapshot -> resumed prefill
    ids2 = cached.mm.encode_chat(turn2)
    job = cached.start_prefill(ids2)
    assert job.resumed_from >= CHUNK
    r_cached2 = cached.generate(turn2, sampling=_greedy())
    assert r_plain2.token_ids == r_cached2.token_ids
    assert cached.prefix_cache.hits >= 2
    assert cached.prefix_cache.tokens_saved >= 2 * CHUNK


def test_exact_repeat_hits_and_matches(engines):
    plain, cached = engines
    msgs = [{"role": "user", "content": "repeat this exact prompt please"}]
    first = cached.generate(msgs, sampling=_greedy())
    hits0 = cached.prefix_cache.hits
    again = cached.generate(msgs, sampling=_greedy())
    assert again.token_ids == first.token_ids
    assert cached.prefix_cache.hits > hits0
    assert plain.generate(msgs, sampling=_greedy()).token_ids == first.token_ids


def test_image_prompts_keyed_by_pixels(engines):
    from PIL import Image

    plain, cached = engines
    rng = np.random.default_rng(7)
    img_a = Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8))
    img_b = Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8))
    msgs = [{"role": "user", "content": "<image>\nwhat do you see in it?"}]

    r_a = cached.generate(msgs, images=[img_a], sampling=_greedy())
    assert plain.generate(
        msgs, images=[img_a], sampling=_greedy()
    ).token_ids == r_a.token_ids

    # same ids, different image: resume MUST NOT trigger
    exp_b = cached.mm.expand(
        cached.mm.encode_chat(msgs), images=[img_b], videos=()
    )
    job_b = cached.start_prefill(
        exp_b.input_ids, exp_b.images, exp_b.image_indices
    )
    assert job_b.resumed_from == 0

    # same image again: resume fires and output is unchanged
    exp_a = cached.mm.expand(
        cached.mm.encode_chat(msgs), images=[img_a], videos=()
    )
    job_a = cached.start_prefill(
        exp_a.input_ids, exp_a.images, exp_a.image_indices
    )
    assert job_a.resumed_from >= CHUNK
    r_a2 = cached.generate(msgs, images=[img_a], sampling=_greedy())
    assert r_a2.token_ids == r_a.token_ids


def test_continuous_putback_and_resume(engines):
    """Finished slot-pool requests snapshot into the prefix cache; a
    follow-up admission resumes, and outputs match the no-cache engine."""
    from long_vita_tpu.inference.continuous import ContinuousEngine

    plain, cached = engines
    rng = np.random.default_rng(11)
    sp = SamplingParams(greedy=True, max_new_tokens=8)
    prompt1 = rng.integers(0, 1000, size=40).tolist()
    ce = ContinuousEngine(cached, sp, max_slots=2, tick=4)
    rid = ce.add_request(prompt1)
    r1 = dict(ce.run_to_completion())[rid]
    saved0 = cached.prefix_cache.tokens_saved

    # follow-up turn: cached prompt+reply is this prompt's prefix
    prompt2 = prompt1 + r1.token_ids + rng.integers(0, 1000, size=9).tolist()
    rid2 = ce.start_admission(prompt2)
    assert ce._admission[2].resumed_from >= CHUNK
    while ce.admission_step() is None:
        pass
    r2 = dict(ce.run_to_completion())[rid2]
    assert r2.token_ids == plain.generate(
        input_ids=prompt2, sampling=sp
    ).token_ids
    assert cached.prefix_cache.tokens_saved > saved0
