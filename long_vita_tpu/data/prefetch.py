"""Background-thread batch prefetcher.

Replaces the reference's torch DataLoader worker processes
(legacy/data/data_samplers.py:52-101): packing + image preprocessing run on
host threads (the native feedworker releases the GIL in C++), staying ahead
of the device so the TPU never waits on tokenization or tiling.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator


class _Stop:
    pass


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run `iterator` in a daemon thread, keeping `depth` items ready."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    error: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            error.append(e)
        finally:
            q.put(_Stop)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _Stop:
            if error:
                raise error[0]
            return
        yield item
