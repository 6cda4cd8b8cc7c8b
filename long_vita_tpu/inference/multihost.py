"""Multi-host serving orchestration.

Reference behavior (SURVEY.md §3.2; run_text_generation_server.py:114-153,
text_generation_server.py:25-32): rank 0 runs the HTTP server; on each
request it broadcasts a "do generate" choice plus the tokenized
prompt/images to every rank, and all ranks enter the same generate() so the
model-parallel collectives line up.

TPU-native version: on a multi-host pod (jax.distributed initialized,
`jax.process_count() > 1`) the same SPMD engine program runs on every host.
Host 0 serves HTTP and publishes each SCHEDULER ACTION over one ordered
broadcast channel; follower hosts block in the server's follower loop,
decode the identical payload, and issue the same engine call — every host
reaches the same jitted computation with the same operands, which is all
XLA's multi-host collectives need. Unlike the reference's serial broadcast
loop (one whole generate per request), the channel carries fine-grained
continuous-batching actions (admit / prefill-chunk / decode-tick), so the
slot-pool scheduler runs in lockstep across the pod.

Wire format (two-phase, so a decode tick costs a 64 KiB broadcast instead
of a fixed multi-MiB slot):

  1. a 16-byte header broadcast: big-endian [json_len:8 | body_len:8]
     (8-byte fields: a continuous-batching admit publishes the EXPANDED
     bf16 tile stack, and the flagship 4096-frame workload is ~4.9 GB —
     past a 4-byte field; an OverflowError on host 0 mid-collective would
     hang the whole pod)
  2. a body broadcast of `bucket(body_len)` bytes, where bucket() rounds up
     to a power-of-two multiple of 64 KiB (bounds the number of distinct
     broadcast shapes XLA compiles)

Oversized payloads are rejected by ``encode_payload`` (PayloadTooLarge)
against MAX_BODY_BYTES; the server pre-checks with ``payload_nbytes`` and
returns a 400 BEFORE taking the lockstep channel, so a too-big request can
never desynchronize hosts.

The body is the JSON metadata followed by the raw bytes of any numpy
arrays (dtype/shape recorded in the metadata) — image tile stacks ride the
channel as bf16 bytes, the reference's NCCL image broadcast
(tasks/inference/module.py:340-362) without a second codepath.
"""
from __future__ import annotations

import json
from typing import Any, Callable, Optional, Sequence

import numpy as np

import jax

HEADER_BYTES = 16
BUCKET_BYTES = 64 * 1024
# Sanity ceiling on one broadcast body (64 GiB — an order of magnitude above
# the largest real payload, the ~4.9 GB 4096-frame bf16 tile stack). Checked
# BEFORE any collective so violations fail the request, not the pod.
MAX_BODY_BYTES = 64 * 1024**3
SHUTDOWN = {"__ctl__": "shutdown"}


class PayloadTooLarge(ValueError):
    """Raised by encode_payload before any broadcast has been entered."""


def is_primary() -> bool:
    return jax.process_index() == 0


def _bucket(n: int) -> int:
    size = BUCKET_BYTES
    while size < n:
        size *= 2
    return size


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bf16 et al. register through ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def payload_nbytes(msg: Any, arrays: Sequence[np.ndarray] = ()) -> int:
    """Body size (msg, arrays) would occupy on the wire — callers use it to
    reject oversized requests with a 400 before entering the collective."""
    meta = {
        "msg": msg,
        "arrays": [[a.dtype.name, list(a.shape)] for a in arrays],
    }
    return len(json.dumps(meta).encode("utf-8")) + sum(
        int(a.nbytes) for a in arrays
    )


def encode_payload(
    msg: Any, arrays: Sequence[np.ndarray] = ()
) -> tuple[np.ndarray, np.ndarray]:
    """(msg, arrays) -> (header, body) uint8 broadcast buffers."""
    arrays = [np.ascontiguousarray(a) for a in arrays]
    meta = {
        "msg": msg,
        "arrays": [[a.dtype.name, list(a.shape)] for a in arrays],
    }
    raw = json.dumps(meta).encode("utf-8")
    body_len = len(raw) + sum(a.nbytes for a in arrays)
    if body_len > MAX_BODY_BYTES:
        raise PayloadTooLarge(
            f"broadcast body {body_len} bytes exceeds MAX_BODY_BYTES "
            f"{MAX_BODY_BYTES}"
        )
    body = np.zeros((_bucket(body_len),), np.uint8)
    body[: len(raw)] = np.frombuffer(raw, np.uint8)
    off = len(raw)
    for a in arrays:
        body[off : off + a.nbytes] = np.frombuffer(a.tobytes(), np.uint8)
        off += a.nbytes
    header = np.zeros((HEADER_BYTES,), np.uint8)
    header[:8] = np.frombuffer(len(raw).to_bytes(8, "big"), np.uint8)
    header[8:16] = np.frombuffer(body_len.to_bytes(8, "big"), np.uint8)
    return header, body


def decode_payload(
    header: np.ndarray, body: np.ndarray
) -> tuple[Any, list[np.ndarray]]:
    json_len = int.from_bytes(bytes(header[:8].tobytes()), "big")
    meta = json.loads(body[:json_len].tobytes().decode("utf-8"))
    arrays = []
    off = json_len
    for dtype_name, shape in meta["arrays"]:
        dtype = _np_dtype(dtype_name)
        n = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
        arrays.append(
            np.frombuffer(body[off : off + n].tobytes(), dtype).reshape(shape)
        )
        off += n
    return meta["msg"], arrays


def publish_blob(
    msg: Any, arrays: Sequence[np.ndarray] = ()
) -> tuple[Any, list[np.ndarray]]:
    """Broadcast (msg, arrays) from host 0 to all hosts; returns them back
    (identical on every host). Call with the payload on host 0 and with
    anything (ignored) on followers — only host 0's value is used.

    This is a COLLECTIVE: every host must call it the same number of times
    in the same order (the server serializes all publishes under one lock).
    """
    from jax.experimental import multihost_utils

    if is_primary():
        header, body = encode_payload(msg, arrays)
    else:
        header = np.zeros((HEADER_BYTES,), np.uint8)
    header = np.asarray(multihost_utils.broadcast_one_to_all(header))
    body_len = int.from_bytes(bytes(header[8:16].tobytes()), "big")
    if not is_primary():
        body = np.zeros((_bucket(body_len),), np.uint8)
    body = np.asarray(multihost_utils.broadcast_one_to_all(body))
    return decode_payload(header, body)


def publish(obj: Any, slot_bytes: int | None = None) -> Any:
    """Broadcast a plain JSON-serializable message (no arrays)."""
    return publish_blob(obj)[0]


def follower_loop(
    handle: Callable[[dict], None],
    slot_bytes: int | None = None,
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

    pub = _publish or (lambda _: publish(None))
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


def shutdown(slot_bytes: int | None = None) -> None:
    """Primary: release followers from their receive loop."""
    publish(SHUTDOWN)
