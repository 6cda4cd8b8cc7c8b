"""Continuous (iteration-level) batching: slot pool + server scheduler."""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.data.image_processor import ImageProcessor
from long_vita_tpu.data.multimodal import MultimodalTokenizer
from long_vita_tpu.inference.continuous import ContinuousEngine
from long_vita_tpu.inference.engine import InferenceEngine
from long_vita_tpu.inference.sampler import SamplingParams
from long_vita_tpu.models.long_vita import init_long_vita_params
from long_vita_tpu.tokenizer import QWEN_CHATML_TEMPLATE

REF_TOK = "/root/reference/long_vita/models/long_vita_qwen2_intern"


@pytest.fixture(scope="module")
def engine():
    transformers = pytest.importorskip("transformers")
    import os

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
        params, cfg, mm, max_seq_len=512, chunk=64, cache_dtype=jnp.float32
    )


@pytest.mark.slow
def test_mid_flight_join_matches_solo(engine):
    """Requests joining at different ticks reproduce their solo outputs."""
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 1000, size=n).tolist() for n in (30, 55, 41)]
    sp = SamplingParams(greedy=True, max_new_tokens=10)

    solo = [engine.generate(input_ids=p, sampling=sp) for p in prompts]

    ce = ContinuousEngine(engine, sp, max_slots=4, tick=3)
    r0 = ce.add_request(prompts[0])
    r1 = ce.add_request(prompts[1])
    done = dict(ce.step())  # tick 1 with two rows
    r2 = ce.add_request(prompts[2])  # joins mid-flight
    for rid, res in ce.run_to_completion():
        done[rid] = res
    assert set(done) == {r0, r1, r2}
    for rid, want in zip((r0, r1, r2), solo):
        assert done[rid].token_ids == want.token_ids, rid


@pytest.mark.slow
def test_slot_reuse_more_requests_than_slots(engine):
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 1000, size=20 + i).tolist() for i in range(5)]
    sp = SamplingParams(greedy=True, max_new_tokens=6)
    solo = [engine.generate(input_ids=p, sampling=sp) for p in prompts]

    ce = ContinuousEngine(engine, sp, max_slots=2, tick=4)
    results = {}
    queue = list(enumerate(prompts))
    rid_to_idx = {}
    while queue or ce.active:
        while queue and ce.free_slots:
            idx, p = queue.pop(0)
            rid_to_idx[ce.add_request(p)] = idx
        for rid, res in ce.step():
            results[rid_to_idx[rid]] = res
    assert len(results) == 5
    for idx, want in enumerate(solo):
        assert results[idx].token_ids == want.token_ids, idx


@pytest.mark.slow
def test_continuous_on_cp_mesh(engine):
    """The slot-pool decode composes with cp-sharded caches (VERDICT #4:
    continuous batching must be available on the 1M pod deployment)."""
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(dp=1, cp=2, tp=2), devices=jax.devices()[:4])
    sharded = InferenceEngine(
        jax.tree.map(lambda x: np.asarray(x), engine.params),
        engine.cfg, engine.mm, max_seq_len=512, chunk=128,
        cache_dtype=jnp.float32, mesh=mesh,
    )
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 1000, size=n).tolist() for n in (30, 55)]
    sp = SamplingParams(greedy=True, max_new_tokens=8)
    solo = [engine.generate(input_ids=p, sampling=sp) for p in prompts]

    ce = ContinuousEngine(sharded, sp, max_slots=2, tick=3)
    r0 = ce.add_request(prompts[0])
    done = dict(ce.step())
    r1 = ce.add_request(prompts[1])  # joins mid-flight on the cp mesh
    for rid, res in ce.run_to_completion():
        done[rid] = res
    for rid, want in zip((r0, r1), solo):
        assert done[rid].token_ids == want.token_ids, rid


@pytest.mark.slow
def test_admission_interleaves_with_decode(engine):
    """While a LONG prompt is admitted, in-flight requests keep decoding:
    every admission chunk is followed by a decode tick before the next
    chunk (VERDICT #5 — the round-2 batcher ran the whole prefill under
    the lock, stalling all in-flight requests for ~90 s·chip at 128K)."""
    from long_vita_tpu.inference.server import ContinuousBatcher

    batcher = ContinuousBatcher(
        engine, max_slots=2, tick=2, start_thread=False
    )
    short_req = {"prompts": ["hi"], "tokens_to_generate": 24}
    # ~4 chunks at the fixture's chunk=64 (stays under max_seq_len=512)
    long_text = " ".join(["test"] * 220)
    long_req = {"prompts": [long_text], "tokens_to_generate": 24}

    box_a = batcher.submit_async(short_req)
    for _ in range(3):  # admit A and decode a few ticks
        batcher.iteration()
    assert batcher.ce.active == 1
    box_b = batcher.submit_async(long_req)
    guard = 0
    while not (box_a["event"].is_set() and box_b["event"].is_set()):
        assert batcher.iteration(), "scheduler idle with work pending"
        guard += 1
        assert guard < 200
    assert "error" not in box_a and "error" not in box_b

    # inter-token gap bound: no two admission chunks without a decode tick
    # in between (A was active throughout B's admission)
    trace = batcher.trace
    assert trace.count("chunk") >= 3, trace  # B's prompt really was chunked
    for i, action in enumerate(trace[:-1]):
        if action == "chunk":
            assert trace[i + 1] == "tick", (i, trace)

    # outputs match solo runs (greedy: top_k=0, top_p=0)
    sp = SamplingParams(greedy=True, max_new_tokens=24)
    want_a = engine.generate(
        [{"role": "user", "content": "hi"}], sampling=sp
    )
    want_b = engine.generate(
        [{"role": "user", "content": long_text}], sampling=sp
    )
    assert box_a["rows"][0].text == want_a.text
    assert box_b["rows"][0].text == want_b.text


@pytest.mark.slow
def test_submit_stream_deltas_concatenate_to_result(engine):
    """Streaming submit yields >1 delta whose concatenation is exactly the
    final text, while a second (non-streaming) request shares the pool."""
    from long_vita_tpu.inference.server import ContinuousBatcher

    batcher = ContinuousBatcher(engine, max_slots=2, tick=2)
    stream_req = {"prompts": ["stream me a story"], "tokens_to_generate": 16}
    other_req = {"prompts": ["poolmate"], "tokens_to_generate": 8}
    other_box = batcher.submit_async(other_req)

    deltas, payload = [], None
    for ev in batcher.submit_stream(stream_req):
        if isinstance(ev, str):
            deltas.append(ev)
        else:
            payload = ev[1]
    assert payload is not None and len(deltas) > 1, deltas
    assert "".join(deltas) == payload["text"][0]

    other_box["event"].wait(timeout=60)
    assert other_box["rows"][0] is not None

    sp = SamplingParams(greedy=True, max_new_tokens=16)
    want = engine.generate(
        [{"role": "user", "content": "stream me a story"}], sampling=sp
    )
    assert payload["text"][0] == want.text


@pytest.mark.slow
def test_server_streaming_ndjson(engine):
    """"stream": true over the wire: chunked NDJSON deltas, final done
    payload matching the non-streaming response."""
    from long_vita_tpu.inference.server import make_server

    server = make_server(engine, host="127.0.0.1", port=0, continuous=True)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/api"
    try:
        req = urllib.request.Request(
            url, data=json.dumps({
                "prompts": ["stream over http"],
                "tokens_to_generate": 16, "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"}, method="PUT",
        )
        events = []
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "application/x-ndjson"
            for line in resp:
                events.append(json.loads(line))
        assert events[-1].get("done") is True
        deltas = [e["delta"] for e in events[:-1]]
        assert len(deltas) > 1
        assert "".join(deltas) == events[-1]["text"][0]

        # matches the non-streaming path
        code, body = _put(url, {
            "prompts": ["stream over http"], "tokens_to_generate": 16,
        })
        assert code == 200
        assert json.loads(body)["text"] == events[-1]["text"]

        # guardrails: stream needs a single prompt
        code, body = _put(url, {
            "prompts": ["a", "b"], "tokens_to_generate": 4, "stream": True,
        })
        assert code == 400 and "single prompt" in body
    finally:
        server.shutdown()


@pytest.mark.slow
def test_lockstep_replay_matches_primary(engine):
    """The multi-host serving contract, single-process: a primary
    ContinuousBatcher publishes its action stream (admit/chunk/tick), and a
    FollowerReplayer replaying that stream on a second ContinuousEngine
    reproduces the primary's outputs row-for-row (VERDICT #1 — lockstep
    scheduler replication; the real 2-process run is
    test_multicontroller.py::test_two_process_continuous_serving)."""
    from long_vita_tpu.inference.server import (
        ContinuousBatcher,
        FollowerReplayer,
    )

    actions = []
    batcher = ContinuousBatcher(
        engine, max_slots=2, tick=3, start_thread=False,
        publish=lambda msg, arrs=(): actions.append(
            (msg, [np.array(a, copy=True) for a in arrs])
        ),
    )
    import base64
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (64, 64), (0, 128, 255)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    reqs = [
        {"prompts": ["lockstep a"], "tokens_to_generate": 8},
        {"prompts": ["<image>\nwhat color?"], "image_list": [b64],
         "tokens_to_generate": 8},
    ]
    boxes = [batcher.submit_async(r) for r in reqs]
    guard = 0
    while not all(b["event"].is_set() for b in boxes):
        batcher.iteration()
        guard += 1
        assert guard < 300
    ops = [m["op"] for m, _ in actions]
    assert ops.count("admit") == 2 and "tick" in ops
    # the first admit carries the sampling switch; the second (same key)
    # does not. The image request's tile stack rode the channel as arrays.
    admits = [m for m, _ in actions if m["op"] == "admit"]
    assert admits[0]["sampling"] is not None
    assert admits[1]["sampling"] is None
    assert [m["has_images"] for m in admits] == [False, True]

    replayer = FollowerReplayer(engine, continuous=True, max_slots=2, tick=3)
    for msg, arrs in actions:
        replayer.handle(msg, arrs)
    assert set(replayer.finished) == {0, 1}  # rids in admission order
    for rid, box in zip((0, 1), boxes):
        assert replayer.finished[rid].token_ids == box["rows"][0].token_ids


def test_make_server_pod_starts_continuous_batcher(engine, monkeypatch):
    """On a multi-process pod make_server now starts the batchers with the
    lockstep channel wired (round-3 gap: server.py disabled BOTH batchers
    whenever the mesh spanned processes, degrading 1M pod serving to the
    reference's one-request-at-a-time loop)."""
    import jax as _jax

    from long_vita_tpu.inference import server as srv

    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    s = srv.make_server(engine, host="127.0.0.1", port=0, continuous=True)
    try:
        assert isinstance(s.batcher, srv.ContinuousBatcher)
        from long_vita_tpu.inference import multihost

        assert s.batcher._publish is multihost.publish_blob
    finally:
        s.server_close()


def test_set_sampling_requires_drained_pool(engine):
    sp = SamplingParams(greedy=True, max_new_tokens=4)
    ce = ContinuousEngine(engine, sp, max_slots=2, tick=2)
    ce.add_request(list(range(1, 20)))
    with pytest.raises(RuntimeError, match="in flight"):
        ce.set_sampling(SamplingParams(greedy=True, max_new_tokens=8))
    ce.run_to_completion()
    ce.set_sampling(SamplingParams(greedy=True, max_new_tokens=8))


def _put(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="PUT",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_server_continuous_mode(engine):
    from long_vita_tpu.inference.server import make_server

    server = make_server(
        engine, host="127.0.0.1", port=0, continuous=True
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/api"
    try:
        results = {}

        def worker(i, delay):
            time.sleep(delay)
            results[i] = _put(url, {
                "prompts": [f"staggered prompt {i}"],
                "tokens_to_generate": 8,
            })

        threads = [
            threading.Thread(target=worker, args=(i, 0.1 * i))
            for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(code == 200 for code, _ in results.values()), results
        # serial-reference check: same prompt through the serial path
        from long_vita_tpu.inference.server import execute_request

        want = execute_request(engine, {
            "prompts": ["staggered prompt 0"], "tokens_to_generate": 8,
        })
        assert json.loads(results[0][1])["text"] == want["text"]
    finally:
        server.shutdown()


@pytest.mark.slow
def test_continuous_with_int4_matches_int4_solo(engine):
    """Serving composition: a w4a16 engine (weight_quant="int4") under
    continuous batching reproduces its own solo generates. The pool tick
    batches rows, so the quantized projections see rows=slots — still
    the decode regime the Pallas kernel covers (ops/quant_matmul.py)."""
    q_eng = InferenceEngine(
        engine.params, engine.cfg, engine.mm, max_seq_len=512, chunk=64,
        cache_dtype=jnp.float32, weight_quant="int4",
    )
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 1000, size=n).tolist() for n in (26, 49)]
    sp = SamplingParams(greedy=True, max_new_tokens=8)
    solo = [q_eng.generate(input_ids=p, sampling=sp) for p in prompts]

    ce = ContinuousEngine(q_eng, sp, max_slots=2, tick=3)
    rids = [ce.add_request(p) for p in prompts]
    done = {}
    for rid, res in ce.run_to_completion():
        done[rid] = res
    for rid, want in zip(rids, solo):
        assert done[rid].token_ids == want.token_ids, rid
