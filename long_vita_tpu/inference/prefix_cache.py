"""Cross-request prefix KV caching.

The reference server recomputes the full prompt for every request (its CP
variant even re-prefills per emitted token, inference_long_vita_server_cp.sh
keeps --use-kv-cache off). Multi-turn chat over one long video — Long-VITA's
headline 1M use case — re-pays the whole prefill (~90 s·chip at 128K,
PERF.md) on every turn for a prompt that is 99% identical to the last one.

This module keeps snapshots of recent prompts' KV caches and lets the
engine resume prefill after the longest matching prefix:

  - Entries are FULL-SIZE cache buffers (same shape/sharding as a fresh
    engine cache), so restore is a device copy with no slot arithmetic —
    and the same code path works for tp- and cp-sharded serving meshes.
  - Matching is exact on expanded token ids, capped at the entry's valid
    frontier, aligned DOWN to the engine's prefill-chunk grid (prefill can
    only resume at a chunk boundary), and capped at true_len - 1 so the
    final prompt row is always recomputed (finish_prefill needs a real
    last-row hidden even for an exact repeat of a cached prompt).
  - Multimodal prompts carry image-placeholder ids that are identical for
    DIFFERENT images, so ids alone cannot key the cache: every entry also
    stores a media fingerprint (hash of the tile array, sampled for large
    frame stacks) and a hit requires it to match.
  - Snapshots are copies: the engine donates its cache buffers on every
    jitted step, so entries must never alias a cache the engine still
    drives (`put` copies in, `match` copies out).

Memory: one entry holds a full cache allocation (e.g. 2 x 2.1 GB for a
48-layer int8 1M cache), so the default budget is small; size it to the
number of concurrent long-context sessions the chip serves.
"""
from __future__ import annotations

import dataclasses
import hashlib
from typing import Optional

import numpy as np

import jax.numpy as jnp

from long_vita_tpu.models.qwen2 import KVCache


def copy_cache(cache: KVCache) -> KVCache:
    """Deep device copy (preserves sharding); never aliases the source."""
    cp = lambda x: None if x is None else jnp.copy(x)
    return KVCache(
        cp(cache.k), cp(cache.v), jnp.copy(cache.length),
        k_scale=cp(cache.k_scale), v_scale=cp(cache.v_scale),
    )


def media_fingerprint(images: Optional[np.ndarray]) -> str:
    """Fingerprint of a tile stack: shape + hashed byte sample.

    Hashing 4096 frames outright is ~5 GB through blake2b; sampling every
    k-th tile (plus first/last) bounds the cost at ~16 tiles while still
    distinguishing different videos of the same length."""
    if images is None or getattr(images, "shape", (0,))[0] == 0:
        return ""
    arr = np.asarray(images)
    n = arr.shape[0]
    step = max(1, n // 14)
    idx = sorted({0, n - 1, *range(0, n, step)})
    h = hashlib.blake2b(digest_size=16)
    h.update(str(arr.shape).encode())
    h.update(str(arr.dtype).encode())
    for i in idx:
        h.update(np.ascontiguousarray(arr[i]).tobytes())
    return h.hexdigest()


@dataclasses.dataclass
class _Entry:
    ids: np.ndarray        # [n] int32 — prompt (+ generated) token ids
    media_key: str
    cache: KVCache         # full-size snapshot, length == frontier
    frontier: int          # number of valid kv slots
    tick: int = 0          # LRU clock


class PrefixCache:
    """LRU store of prompt KV snapshots, matched by token-id prefix."""

    def __init__(self, max_entries: int, chunk: int):
        if max_entries <= 0:
            raise ValueError("max_entries must be positive")
        self.max_entries = max_entries
        self.chunk = chunk
        self._entries: list[_Entry] = []
        self._tick = 0
        # stats (asserted in tests, reported by the server)
        self.hits = 0
        self.misses = 0
        self.tokens_saved = 0

    def __len__(self) -> int:
        return len(self._entries)

    def match(
        self, ids, media_key: str = ""
    ) -> Optional[tuple[KVCache, int]]:
        """Longest usable cached prefix of `ids`.

        -> (cache copy with length = start, start) where start is chunk-
        aligned and >= one chunk, or None. The returned cache is the
        caller's to donate."""
        ids = np.asarray(ids, np.int32).reshape(-1)
        best, best_len = None, 0
        for e in self._entries:
            if e.media_key != media_key:
                continue
            n = min(len(ids), len(e.ids), e.frontier)
            if n <= 0:
                continue
            neq = np.nonzero(ids[:n] != e.ids[:n])[0]
            common = int(neq[0]) if neq.size else n
            if common > best_len:
                best, best_len = e, common
        # resume on the chunk grid; always leave the final row to recompute
        start = min(best_len, len(ids) - 1) // self.chunk * self.chunk
        if best is None or start < self.chunk:
            self.misses += 1
            return None
        self._tick += 1
        best.tick = self._tick
        self.hits += 1
        self.tokens_saved += start
        restored = copy_cache(best.cache)
        restored = KVCache(
            restored.k, restored.v, jnp.asarray(start, jnp.int32),
            k_scale=restored.k_scale, v_scale=restored.v_scale,
        )
        return restored, start

    def put(
        self, ids, cache: KVCache, frontier: int, media_key: str = ""
    ) -> None:
        """Snapshot `cache` (copied) for the prompt `ids[:frontier]`.

        A snapshot whose ids already prefix-match an existing entry at
        least as far as its frontier REPLACES it (the longer of the two
        survives) — multi-turn chat then keeps one entry per session, not
        one per turn."""
        ids = np.asarray(ids, np.int32).reshape(-1)
        frontier = min(frontier, len(ids))
        if frontier < self.chunk:
            return
        self._tick += 1
        snap = copy_cache(cache)
        snap = KVCache(
            snap.k, snap.v, jnp.asarray(frontier, jnp.int32),
            k_scale=snap.k_scale, v_scale=snap.v_scale,
        )
        entry = _Entry(ids[:frontier].copy(), media_key, snap, frontier,
                       self._tick)
        for i, e in enumerate(self._entries):
            if e.media_key != media_key:
                continue
            n = min(e.frontier, frontier)
            if np.array_equal(e.ids[:n], entry.ids[:n]):
                if frontier >= e.frontier:
                    self._entries[i] = entry
                else:
                    e.tick = self._tick  # keep the longer snapshot fresh
                return
        self._entries.append(entry)
        if len(self._entries) > self.max_entries:
            self._entries.sort(key=lambda e: e.tick)
            self._entries.pop(0)
