"""Beam search, data observability, metrics utilities."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.data.multimodal import MultimodalTokenizer
from long_vita_tpu.data.image_processor import ImageProcessor
from long_vita_tpu.inference.beam_search import beam_search
from long_vita_tpu.inference.engine import InferenceEngine
from long_vita_tpu.models.long_vita import init_long_vita_params
from long_vita_tpu.tokenizer import QWEN_CHATML_TEMPLATE

REF_TOK = "/root/reference/long_vita/models/long_vita_qwen2_intern"


@pytest.fixture(scope="module")
def engine():
    transformers = pytest.importorskip("transformers")
    if not os.path.isdir(REF_TOK):
        pytest.skip("tokenizer assets unavailable")
    tok = transformers.Qwen2Tokenizer(
        vocab_file=f"{REF_TOK}/vocab.json", merges_file=f"{REF_TOK}/merges.txt"
    )
    tok.chat_template = QWEN_CHATML_TEMPLATE
    mm = MultimodalTokenizer(
        tok, image_processor=ImageProcessor(image_size=56),
        image_token_length=4,
    )
    cfg = tiny_test_config(vocab_size=-(-(len(tok) + 64) // 128) * 128)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return InferenceEngine(
        params, cfg, mm, max_seq_len=256, chunk=64, cache_dtype=jnp.float32
    )


@pytest.mark.slow
def test_beam_search_beats_greedy_score(engine):
    ids = engine.mm.tokenizer("tell me a story", add_special_tokens=False).input_ids
    hyps = beam_search(engine, ids, beam_size=3, max_new_tokens=6, num_return=3)
    assert len(hyps) >= 1
    assert all(len(h.token_ids) >= 1 for h in hyps)
    # best-first ordering
    scores = [h.score for h in hyps]
    assert scores == sorted(scores, reverse=True)
    # beam-1 equals greedy continuation
    hyps1 = beam_search(engine, ids, beam_size=1, max_new_tokens=6)
    from long_vita_tpu.inference.sampler import SamplingParams

    greedy = engine.generate(
        input_ids=ids, sampling=SamplingParams(greedy=True, max_new_tokens=6)
    )
    assert hyps1[0].token_ids == greedy.token_ids[: len(hyps1[0].token_ids)]


def test_data_report(tmp_path, engine):
    from long_vita_tpu.data.observability import DataReport, dump_first_batch

    report = DataReport(str(tmp_path), tokenizer=engine.mm.tokenizer)
    report.record("src_a", [1, 2, 3], [-100, 2, 3], num_images=1)
    report.record("src_a", [4, 5], [-100, -100])
    report.record_error("src_b", "boom", {"messages": []})
    report.flush()

    stats = json.load(open(tmp_path / "data_report.json"))
    assert stats["src_a"]["samples"] == 2
    assert stats["src_a"]["supervised_tokens"] == 2
    assert stats["src_a"]["images"] == 1
    assert (tmp_path / "data_error.log").exists()
    assert (tmp_path / "data_samples.json").exists()

    batch = {
        "tokens": np.asarray([[1, 2, 3, 4]]),
        "labels": np.asarray([[-100, 2, 3, -100]]),
    }
    dump_first_batch(str(tmp_path), batch, engine.mm.tokenizer)
    assert (tmp_path / "print_batch.log").exists()


def test_metrics_logger(tmp_path):
    from long_vita_tpu.utils.metrics import MetricsLogger, mfu

    logger = MetricsLogger(str(tmp_path))
    logger.log(0, loss=1.5, tokens=128)
    logger.log(1, loss=1.2, tokens=128)
    logger.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 1.2

    # 14B at 1000 tok/s/chip on v5p ~ 6*14e9*1000/4.59e14 = 18% MFU
    assert 0.15 < mfu(1000, 14e9, 4.59e14) < 0.2


def test_simple_eval(tmp_path, engine):
    import json as _json

    from long_vita_tpu.eval.simple_eval import run_eval, score

    assert score("Answer: Yes", "yes") == {"exact": True, "contains": True}
    assert score("The answer is yes.", "yes")["contains"]

    data = tmp_path / "qa.jsonl"
    data.write_text(
        _json.dumps({"prompt": "say hi", "answer": "whatever"}) + "\n"
    )
    out = run_eval(
        str(data), engine=engine, max_new_tokens=4,
        out_path=str(tmp_path / "res.jsonl"),
    )
    assert out["summary"]["n"] == 1
    assert (tmp_path / "res.jsonl").exists()
