"""Multi-host serving orchestration.

Reference behavior (SURVEY.md §3.2; run_text_generation_server.py:114-153,
text_generation_server.py:25-32): rank 0 runs the HTTP server; on each
request it broadcasts a "do generate" choice plus the tokenized
prompt/images to every rank, and all ranks enter the same generate() so the
model-parallel collectives line up.

TPU-native version: on a multi-host pod (jax.distributed initialized,
`jax.process_count() > 1`) the same SPMD engine program runs on every host.
Host 0 serves HTTP and publishes each request as a fixed-size uint8 payload
via `multihost_utils.broadcast_one_to_all`; follower hosts block in
`follower_loop`, decode the identical payload, and issue the same
`engine.generate(...)` — every host reaches the same jitted computation
with the same operands, which is all XLA's multi-host collectives need.

Requests are JSON-serialized (images as base64, same as the wire format in
inference/server.py), so one codepath covers both the HTTP body and the
inter-host payload.
"""
from __future__ import annotations

import json
from typing import Any, Callable, Optional

import numpy as np

import jax

# payload slot size: must be identical on every host (static shape for the
# broadcast). 64 MiB covers thousands of video frames as base64 JPEG.
DEFAULT_SLOT_BYTES = 64 * 1024 * 1024
SHUTDOWN = {"__ctl__": "shutdown"}


def is_primary() -> bool:
    return jax.process_index() == 0


def encode_payload(obj: Any, slot_bytes: int = DEFAULT_SLOT_BYTES) -> np.ndarray:
    """dict -> fixed-size uint8 array: [4-byte big-endian length | json]."""
    raw = json.dumps(obj).encode("utf-8")
    if len(raw) + 4 > slot_bytes:
        raise ValueError(
            f"request payload {len(raw)} B exceeds the {slot_bytes} B slot; "
            "raise slot_bytes on ALL hosts"
        )
    buf = np.zeros((slot_bytes,), np.uint8)
    buf[:4] = np.frombuffer(len(raw).to_bytes(4, "big"), np.uint8)
    buf[4 : 4 + len(raw)] = np.frombuffer(raw, np.uint8)
    return buf


def decode_payload(buf: np.ndarray) -> Any:
    n = int.from_bytes(bytes(buf[:4].tobytes()), "big")
    return json.loads(buf[4 : 4 + n].tobytes().decode("utf-8"))


def publish(obj: Any, slot_bytes: int = DEFAULT_SLOT_BYTES) -> Any:
    """Broadcast a request dict from host 0 to all hosts; returns it back
    (identical on every host). Call with the request on host 0 and with
    anything (ignored) on followers — only host 0's value is used."""
    from jax.experimental import multihost_utils

    buf = encode_payload(obj, slot_bytes) if is_primary() else np.zeros(
        (slot_bytes,), np.uint8
    )
    out = multihost_utils.broadcast_one_to_all(buf)
    return decode_payload(np.asarray(out))


def follower_loop(
    handle: Callable[[dict], None],
    slot_bytes: int = DEFAULT_SLOT_BYTES,
    _publish: Optional[Callable[[Any], Any]] = None,
) -> None:
    """Run on every non-primary host: receive each published request and
    execute the same generate call. Returns on the shutdown sentinel.

    handle(request_dict) must issue the identical engine call the primary
    makes for that request (the server's request->generate mapping).

    Per-request failures (bad image payload, decode errors) are logged and
    swallowed: the primary handles the same request error-per-request and
    keeps serving, so a follower that exited the loop would desync the pod —
    the next broadcast/collective would hang every host."""
    import logging

    pub = _publish or (lambda _: publish(None, slot_bytes))
    while True:
        req = pub(None)
        if req == SHUTDOWN:
            return
        try:
            handle(req)
        except Exception:
            logging.getLogger(__name__).exception(
                "follower request handler failed; staying in lockstep"
            )


def shutdown(slot_bytes: int = DEFAULT_SLOT_BYTES) -> None:
    """Primary: release followers from follower_loop."""
    publish(SHUTDOWN, slot_bytes)
