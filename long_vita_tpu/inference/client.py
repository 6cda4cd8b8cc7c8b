"""HTTP client for the inference server.

Mirrors the reference client (long_vita_megatron/inference_long_vita.py:27-65):
PUT {url}/api with prompts + media path lists; answer = response["text"][0].
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import requests


def generate(
    prompt: str,
    *,
    url: Optional[str] = None,
    image_path_list: Sequence[str] = (),
    video_path_list: Sequence[str] = (),
    tokens_to_generate: int = 256,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    max_num_frame: Optional[int] = None,
    timeout: float = 600.0,
) -> str:
    url = url or os.environ.get("LongVITA_URL", "http://127.0.0.1:5001/api")
    payload = {
        "prompts": [prompt],
        "image_path_list": list(image_path_list) or None,
        "video_path_list": list(video_path_list) or None,
        "tokens_to_generate": tokens_to_generate,
    }
    if temperature is not None:
        payload["temperature"] = temperature
    if top_k is not None:
        payload["top_k"] = top_k
    if top_p is not None:
        payload["top_p"] = top_p
    if max_num_frame is not None:
        payload["max_num_frame"] = max_num_frame
    resp = requests.put(
        url, headers={"Content-Type": "application/json"},
        data=json.dumps(payload), timeout=timeout,
    )
    if resp.status_code != 200:
        raise RuntimeError(f"server error {resp.status_code}: {resp.text}")
    return resp.json()["text"][0]


def generate_stream(
    prompt: str,
    *,
    url: Optional[str] = None,
    tokens_to_generate: int = 256,
    timeout: float = 600.0,
    **kwargs,
):
    """Streaming generate against a --continuous server: yields text deltas
    as they decode; the final full text is the concatenation. Extra kwargs
    ride into the request payload (temperature/top_k/top_p/...)."""
    url = url or os.environ.get("LongVITA_URL", "http://127.0.0.1:5001/api")
    payload = {
        "prompts": [prompt],
        "tokens_to_generate": tokens_to_generate,
        "stream": True,
        **kwargs,
    }
    resp = requests.put(
        url, headers={"Content-Type": "application/json"},
        data=json.dumps(payload), timeout=timeout, stream=True,
    )
    if resp.status_code != 200:
        raise RuntimeError(f"server error {resp.status_code}: {resp.text}")
    for line in resp.iter_lines():
        if not line:
            continue
        ev = json.loads(line)
        if ev.get("error"):
            raise RuntimeError(ev["error"])
        if ev.get("done"):
            return
        yield ev["delta"]
