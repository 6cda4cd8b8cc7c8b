"""Multi-host serving orchestration (reference broadcasts each request from
rank 0 to all ranks: text_generation_server.py:25-32; ours broadcasts
fine-grained scheduler actions so continuous batching runs on pods).
Single-process tests cover the payload codec, the degenerate one-host
broadcast, and the follower-loop control flow with an injected publish.
The REAL 2-process lockstep serving test is
tests/test_multicontroller.py::test_two_process_continuous_serving."""
import numpy as np

from long_vita_tpu.inference import multihost


def test_payload_roundtrip_msg_only():
    req = {"prompts": ["hello <image>"], "top_k": 5,
           "image_list": ["aGk=" * 100]}
    header, body = multihost.encode_payload(req)
    assert header.shape == (multihost.HEADER_BYTES,)
    assert body.dtype == np.uint8
    # bucketed body: power-of-two multiple of 64 KiB
    assert body.shape[0] % multihost.BUCKET_BYTES == 0
    msg, arrays = multihost.decode_payload(header, body)
    assert msg == req and arrays == []


def test_payload_roundtrip_with_arrays():
    import jax.numpy as jnp

    ids = np.arange(37, dtype=np.int32)
    tiles = np.asarray(
        np.random.default_rng(0).normal(size=(3, 4, 4, 3)),
        np.dtype(jnp.bfloat16),
    )
    idx = np.asarray([[0] * 8, list(range(8))], np.int32)
    header, body = multihost.encode_payload(
        {"op": "admit", "has_images": True}, [ids, tiles, idx]
    )
    msg, arrays = multihost.decode_payload(header, body)
    assert msg == {"op": "admit", "has_images": True}
    np.testing.assert_array_equal(arrays[0], ids)
    assert arrays[1].dtype == tiles.dtype  # bf16 survives the wire
    np.testing.assert_array_equal(
        np.asarray(arrays[1], np.float32), np.asarray(tiles, np.float32)
    )
    np.testing.assert_array_equal(arrays[2], idx)


def test_bucket_sizes_are_bounded():
    """Body shapes quantize to powers of two of 64 KiB — a handful of
    distinct broadcast shapes total, so XLA compiles O(log max) programs."""
    assert multihost._bucket(1) == multihost.BUCKET_BYTES
    assert multihost._bucket(multihost.BUCKET_BYTES) == multihost.BUCKET_BYTES
    assert (
        multihost._bucket(multihost.BUCKET_BYTES + 1)
        == 2 * multihost.BUCKET_BYTES
    )
    assert multihost._bucket(10 << 20) == 256 * multihost.BUCKET_BYTES


def test_publish_single_host_identity():
    """With process_count()==1 broadcast_one_to_all is the identity."""
    req = {"prompts": ["hi"], "tokens_to_generate": 4}
    assert multihost.publish(req) == req
    msg, arrays = multihost.publish_blob(
        {"op": "tick"}, [np.arange(5, dtype=np.int32)]
    )
    assert msg == {"op": "tick"}
    np.testing.assert_array_equal(arrays[0], np.arange(5, dtype=np.int32))


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


def test_sampling_fields_subset():
    from long_vita_tpu.inference.server import _sampling_fields

    req = {"prompts": ["p"], "tokens_to_generate": 9, "top_k": 3,
           "image_path_list": ["/x.jpg"], "random_seed": 7}
    sub = _sampling_fields(req)
    assert sub == {"tokens_to_generate": 9, "top_k": 3, "random_seed": 7}
