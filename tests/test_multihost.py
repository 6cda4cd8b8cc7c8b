"""Multi-host serving orchestration (reference broadcasts each request from
rank 0 to all ranks: text_generation_server.py:25-32). Single-process tests
cover the payload codec, the degenerate one-host broadcast, and the
follower-loop control flow with an injected publish."""
import numpy as np

from long_vita_tpu.inference import multihost


def test_payload_roundtrip():
    req = {"prompts": ["hello <image>"], "top_k": 5,
           "image_list": ["aGk=" * 100]}
    buf = multihost.encode_payload(req, slot_bytes=4096)
    assert buf.shape == (4096,) and buf.dtype == np.uint8
    assert multihost.decode_payload(buf) == req


def test_payload_too_large_is_loud():
    import pytest

    with pytest.raises(ValueError, match="exceeds"):
        multihost.encode_payload({"x": "a" * 100}, slot_bytes=64)


def test_publish_single_host_identity():
    """With process_count()==1 broadcast_one_to_all is the identity."""
    req = {"prompts": ["hi"], "tokens_to_generate": 4}
    assert multihost.publish(req, slot_bytes=2048) == req


def test_follower_loop_runs_until_shutdown():
    reqs = [{"prompts": ["a"]}, {"prompts": ["b"]}, multihost.SHUTDOWN]
    it = iter(reqs)
    handled = []
    multihost.follower_loop(handled.append, _publish=lambda _: next(it))
    assert handled == reqs[:2]


def test_follower_loop_survives_handler_errors():
    """A failing request must not eject the follower from the loop (the
    primary keeps serving after per-request errors; a desynced follower
    would hang the next collective)."""
    reqs = [{"prompts": ["bad"]}, {"prompts": ["good"]}, multihost.SHUTDOWN]
    it = iter(reqs)
    handled = []

    def handle(req):
        handled.append(req)
        if req["prompts"] == ["bad"]:
            raise ValueError("bad image payload")

    multihost.follower_loop(handle, _publish=lambda _: next(it))
    assert handled == reqs[:2]


def test_execute_request_shared_path(tmp_path):
    """The handler/follower shared executor produces the wire payload."""
    from long_vita_tpu.inference.server import execute_request

    class FakeResult:
        text = "ok"
        logprobs = [-0.1]

    class FakeMM:
        class tokenizer:  # noqa: N801 — mimic attribute access
            def __call__(self, *a, **k):
                class R:
                    input_ids = [198]
                return R()

        tokenizer = tokenizer()
        max_num_frame = 0

    class FakeEngine:
        mm = FakeMM()
        calls = []

        def generate(self, messages, **kw):
            self.calls.append((messages, kw))
            return FakeResult()

    eng = FakeEngine()
    req = {"prompts": ["p1", "p2"], "tokens_to_generate": 3,
           "logprobs": True, "stop_on_eol": True, "max_num_frame": 7}
    payload = execute_request(eng, req)
    assert payload == {"text": ["ok", "ok"], "logprobs": [[-0.1], [-0.1]]}
    assert len(eng.calls) == 2
    # per-request frame budget rides the call, never mutates shared state
    assert eng.mm.max_num_frame == 0
    assert eng.calls[0][1]["max_num_frame"] == 7
    sampling = eng.calls[0][1]["sampling"]
    assert sampling.max_new_tokens == 3 and sampling.greedy
    assert sampling.stop_token_ids == (198,)
