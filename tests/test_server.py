"""REST server contract tests (reference Flask /api PUT schema)."""
import base64
import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.data.image_processor import ImageProcessor
from long_vita_tpu.data.multimodal import MultimodalTokenizer
from long_vita_tpu.inference.engine import InferenceEngine
from long_vita_tpu.models.long_vita import init_long_vita_params
from long_vita_tpu.tokenizer import QWEN_CHATML_TEMPLATE

REF_TOK = "/root/reference/long_vita/models/long_vita_qwen2_intern"


@pytest.fixture(scope="module")
def server_url():
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
    engine = InferenceEngine(
        params, cfg, mm, max_seq_len=512, chunk=64, cache_dtype=jnp.float32
    )

    from long_vita_tpu.inference.server import make_server

    server = make_server(engine, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}/api"
    server.shutdown()


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


def test_basic_generate(server_url):
    code, body = _put(server_url, {
        "prompts": ["hello there"], "tokens_to_generate": 4,
    })
    assert code == 200, body
    out = json.loads(body)
    assert isinstance(out["text"], list) and len(out["text"]) == 1
    assert isinstance(out["text"][0], str)


def test_base64_image(server_url):
    img = Image.new("RGB", (64, 64), (10, 200, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    code, body = _put(server_url, {
        "prompts": ["<image>\nwhat color?"],
        "image_list": [b64],
        "tokens_to_generate": 2,
    })
    assert code == 200, body
    assert json.loads(body)["text"][0] is not None


def test_validation_errors(server_url):
    code, body = _put(server_url, {"tokens_to_generate": 4})
    assert code == 400 and "prompts" in body
    code, body = _put(server_url, {"prompts": ["x"], "max_len": 5})
    assert code == 400 and "tokens_to_generate" in body
    code, body = _put(server_url, {
        "prompts": ["x"], "top_k": 5, "top_p": 0.5,
    })
    assert code == 400 and "both" in body
    code, body = _put(server_url, {"prompts": ["x"], "temperature": -1})
    assert code == 400


def test_sampling_path(server_url):
    code, body = _put(server_url, {
        "prompts": ["sample this"], "tokens_to_generate": 4,
        "top_k": 5, "temperature": 0.7, "random_seed": 7,
    })
    assert code == 200, body


def test_vlmeval_adapter_end_to_end(server_url, tmp_path):
    """Adapter -> client -> server -> engine roundtrip (reference
    VLMEvalKit/long_vita.py generate_inner contract)."""
    from long_vita_tpu.eval.vlmeval_adapter import LongVITAAPI

    img = tmp_path / "x.png"
    Image.new("RGB", (64, 64), (10, 200, 30)).save(img)
    api = LongVITAAPI(url=server_url, tokens_to_generate=4)
    code, answer, log = api.generate_inner(
        [{"type": "image", "value": str(img)},
         {"type": "text", "value": "What color?"}],
        dataset="MMVet",
    )
    assert code == 0
    assert isinstance(answer, str)

    # server down -> error tuple, not an exception
    bad = LongVITAAPI(url="http://127.0.0.1:9/api", tokens_to_generate=4)
    code, msg, _ = bad.generate_inner("hello")
    assert code == -1 and "Failed" in msg


def test_vlmeval_prompt_rewrites():
    from long_vita_tpu.eval.vlmeval_adapter import (
        build_prompt, postprocess_answer,
    )

    # MCQ-letter datasets get the letter instruction, boilerplate stripped
    text, imgs, vids = build_prompt(
        [{"type": "image", "value": "a.png"},
         {"type": "text",
          "value": "Q?\nPlease select the correct answer from the options above."}],
        dataset="MMStar",
    )
    assert text.endswith("letter from the given choices directly.")
    assert "select the correct answer" not in text
    assert imgs == ["a.png"] and vids == []

    # Video-MME frame images are folded into a <video> stream
    text, imgs, _ = build_prompt(
        [{"type": "image", "value": f}
         for f in ("f1.jpg", "f2.jpg")] + [{"type": "text", "value": "Q?"}],
        dataset="Video-MME",
    )
    assert text.count("<video>") == 2 and "<image>" not in text

    assert postprocess_answer("blah Answer: C") == "C"
    assert postprocess_answer("direct") == "direct"
