"""Inference REST server — wire-compatible with the reference Flask server.

Contract (reference long_vita_megatron/inference/text_generation_server.py
:34-281 + client inference_long_vita.py:27-65):

    PUT /api
    {"prompts": [str],                  # exactly one prompt supported
     "image_path_list": [str] | null,
     "video_path_list": [str] | null,
     "image_list": [base64 str] | null, # base64-encoded images
     "tokens_to_generate": int,         # default 64
     "temperature": float, "top_k": int, "top_p": float,
     "max_num_frame": int, "random_seed": int, ...}
    -> 200 {"text": [generated_text]}
    -> 400 plain-text error message (same strings where practical)

Implemented on http.server (flask is not in the image); the wire contract
is what VLMEvalKit's LongVITAAPI adapter consumes. Unlike the reference CP
server (which re-prefills per token, server_cp.sh:184), generation here
always uses the KV cache.
"""
from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax

from long_vita_tpu.inference.engine import InferenceEngine
from long_vita_tpu.inference.sampler import SamplingParams


def _validate(req: dict) -> Optional[str]:
    if "prompts" not in req:
        return "prompts argument required"
    if "max_len" in req:
        return "max_len is no longer used.  Replace with tokens_to_generate"
    if "sentences" in req:
        return "sentences is no longer used.  Replace with prompts"
    prompts = req["prompts"]
    if not isinstance(prompts, list) or not prompts:
        return "prompts is not a list of strings"
    if len(prompts) > 128:
        return "Maximum number of prompts is 128"
    tok = req.get("tokens_to_generate", 64)
    if not isinstance(tok, int) or tok < 0:
        return "tokens_to_generate must be an integer greater than 0"
    temperature = req.get("temperature", 1.0)
    if not isinstance(temperature, (int, float)) or not 0.0 < temperature <= 100.0:
        return "temperature must be a positive number less than or equal to 100.0"
    top_k = req.get("top_k", 0)
    if not isinstance(top_k, int) or not 0 <= top_k <= 1000:
        return (
            "top_k must be equal to or greater than 0 and less than or "
            "equal to 1000"
        )
    top_p = req.get("top_p", 0.0)
    if isinstance(top_p, int):
        top_p = float(top_p)
    if not isinstance(top_p, float) or not 0.0 <= top_p <= 1.0:
        return "top_p must be less than or equal to 1.0"
    if top_p > 0.0 and top_k > 0:
        return "cannot set both top-k and top-p samplings."
    return None


class LongVITARequestHandler(BaseHTTPRequestHandler):
    engine: InferenceEngine = None  # set by make_server

    def log_message(self, fmt, *args):  # quiet
        pass

    def _reply(self, code: int, body: str, content_type="application/json"):
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_PUT(self):
        if self.path not in ("/api", "/api/"):
            self._reply(404, "not found", "text/plain")
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
        except json.JSONDecodeError:
            self._reply(400, "invalid json", "text/plain")
            return

        err = _validate(req)
        if err:
            self._reply(400, err, "text/plain")
            return

        try:
            with self.server.generate_lock:
                if jax.process_count() > 1:
                    # multi-host pod: every host must issue the same
                    # generate() for the SPMD collectives to line up
                    # (reference broadcast: text_generation_server.py:25-32)
                    from long_vita_tpu.inference import multihost

                    multihost.publish(req)
                payload = execute_request(self.engine, req)
        except Exception as e:  # noqa: BLE001 — surface as 400 like reference
            self._reply(400, str(e), "text/plain")
            return
        self._reply(200, json.dumps(payload))


def execute_request(engine: InferenceEngine, req: dict) -> dict:
    """Run one validated /api request dict -> response payload dict.

    Shared by the HTTP handler (primary host) and multihost.follower_loop
    (all other hosts) so every host reaches identical engine calls."""
    prompts = req["prompts"]
    images = list(req.get("image_path_list") or [])
    if req.get("image_list"):
        from PIL import Image

        for image_str in req["image_list"]:
            raw = base64.b64decode(image_str)
            images.append(Image.open(io.BytesIO(raw)).convert("RGB"))
    videos = list(req.get("video_path_list") or [])

    if req.get("max_num_frame"):
        engine.mm.max_num_frame = int(req["max_num_frame"])

    top_k = req.get("top_k", 0)
    top_p = float(req.get("top_p", 0.0))
    stop_ids = ()
    if req.get("stop_on_eol") or req.get("stop_on_double_eol"):
        nl = engine.mm.tokenizer("\n", add_special_tokens=False).input_ids
        stop_ids = tuple(nl)
    sampling = SamplingParams(
        temperature=float(req.get("temperature", 1.0)),
        top_k=top_k,
        top_p=top_p,
        greedy=(top_k == 0 and top_p == 0.0),
        max_new_tokens=int(req.get("tokens_to_generate", 64)) or 1,
        stop_token_ids=stop_ids,
        return_logprobs=bool(req.get("logprobs", False)),
    )
    results = []
    for prompt in prompts:
        results.append(engine.generate(
            [{"role": "user", "content": prompt}],
            images=images,
            videos=videos,
            sampling=sampling,
            seed=max(int(req.get("random_seed", 0)), 0),
        ))
    payload = {"text": [r.text for r in results]}
    if sampling.return_logprobs:
        payload["logprobs"] = [r.logprobs for r in results]
    return payload


def make_server(
    engine: InferenceEngine, host: str = "0.0.0.0", port: int = 5001
) -> ThreadingHTTPServer:
    handler = type(
        "BoundHandler", (LongVITARequestHandler,), {"engine": engine}
    )
    server = ThreadingHTTPServer((host, port), handler)
    server.generate_lock = threading.Lock()  # one generation at a time
    return server


def run_server(engine: InferenceEngine, host="0.0.0.0", port=5001):
    if jax.process_count() > 1:
        from long_vita_tpu.inference import multihost

        if not multihost.is_primary():
            # follower hosts execute the broadcast requests and discard the
            # payload (only host 0 answers HTTP); returns on shutdown
            print(f"host {jax.process_index()}: follower generate loop")
            multihost.follower_loop(lambda req: execute_request(engine, req))
            return
    server = make_server(engine, host, port)
    print(f"long-vita-tpu server listening on {host}:{port} (PUT /api)")
    server.serve_forever()
