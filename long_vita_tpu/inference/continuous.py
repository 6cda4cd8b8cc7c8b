"""Continuous (iteration-level) batching: a slot-pool decode scheduler.

Beyond both the reference server (strictly one request at a time,
text_generation_server.py's global lock) and this framework's window
micro-batcher (requests must ARRIVE together): a fixed pool of KV-cache
slots decodes in short segments ("ticks"), and new requests join at any
segment boundary — the vLLM-style scheduling discipline, built on the
engine's ragged per-row cache frontier:

  - one shared [L, B, Smax] cache; per-slot lengths; inactive slots ride
    the decode scan masked-done (their clamped writes are overwritten by
    the next occupant's prefill insert)
  - admission: prefill into a 1-row staging cache, then one
    dynamic_update_slice drops the row into its slot
  - all rows in flight share one SamplingParams (the server groups
    requests by sampling key, as the micro-batcher does)

Everything stays static-shaped: the decode scan compiles once per
(pool size, tick); admission compiles once.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from long_vita_tpu.inference.engine import (
    GenerationResult,
    InferenceEngine,
    _round_up,
)
from long_vita_tpu.inference.sampler import SamplingParams
from long_vita_tpu.models.qwen2 import KVCache


@dataclasses.dataclass
class _Slot:
    request_id: int
    prompt_tokens: int
    tokens: list
    logprobs: list
    remaining: int
    # for prefix-cache put-back on finish (engine.prefix_cache set)
    prompt_ids: Optional[np.ndarray] = None
    media_key: str = ""


class ContinuousEngine:
    """Slot-pool wrapper over an InferenceEngine.

    Composes with cp/tp serving meshes (the cache shards over the mesh via
    engine._make_cache; tests/test_continuous.py::test_continuous_on_cp_mesh)
    and with multi-host pods via the server's lockstep action channel
    (server.FollowerReplayer replays admit/chunk/tick on every host)."""

    def __init__(
        self,
        engine: InferenceEngine,
        sampling: SamplingParams = SamplingParams(),
        *,
        max_slots: int = 8,
        tick: int = 16,
        seed: int = 0,
        on_tokens=None,
    ):
        """on_tokens(rid, token_ids): streaming hook — called with each
        slot's KEPT tokens as they are produced (first token at admission,
        then per decode tick; stop tokens and post-stop tails are never
        reported, so the stream concatenates to the final result)."""
        self.engine = engine
        self.sampling = sampling
        self.on_tokens = on_tokens
        self.max_slots = max_slots
        self.tick = tick
        smax = _round_up(engine.max_seq_len, engine.chunk)
        self.cache = engine._make_cache(batch=max_slots, max_len=smax)
        self.lengths = np.zeros(max_slots, np.int32)
        self.cur_tokens = np.full(max_slots, engine.eos_id, np.int32)
        self.slots: list[Optional[_Slot]] = [None] * max_slots
        self.rng = jax.random.PRNGKey(seed)
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,))
        self._next_id = 0
        self._stop_set = {engine.eos_id, *sampling.stop_token_ids}
        # in-flight chunked admission: (rid, slot, PrefillJob)
        self._admission = None

    # -- jitted ----------------------------------------------------------

    def _insert_impl(self, big: KVCache, staged: KVCache, slot) -> KVCache:
        def put(b, s):
            return jax.lax.dynamic_update_slice(
                b, s, (0, slot) + (0,) * (b.ndim - 2)
            )

        return KVCache(
            put(big.k, staged.k), put(big.v, staged.v), big.length,
            k_scale=(put(big.k_scale, staged.k_scale)
                     if big.k_scale is not None else None),
            v_scale=(put(big.v_scale, staged.v_scale)
                     if big.v_scale is not None else None),
        )

    # -- public ----------------------------------------------------------

    def set_sampling(self, sampling: SamplingParams):
        """Switch the pool's sampling config — only while drained (the
        server's scheduler batches by sampling key)."""
        if self.active:
            raise RuntimeError("cannot switch sampling with requests in flight")
        self.sampling = sampling
        self._stop_set = {self.engine.eos_id, *sampling.stop_token_ids}

    @property
    def free_slots(self) -> int:
        n = sum(s is None for s in self.slots)
        return n - (1 if self._admission is not None else 0)

    @property
    def active(self) -> int:
        return self.max_slots - sum(s is None for s in self.slots)

    @property
    def admission_pending(self) -> bool:
        return self._admission is not None

    def start_admission(
        self,
        input_ids,
        images=None,
        image_indices=None,
    ) -> int:
        """Reserve a slot and begin a CHUNKED prefill for a new request.

        Drive with admission_step() between decode ticks — one prompt chunk
        per call, so a long admission never stalls in-flight decodes for
        more than ~one chunk (the reference server and the round-2 batcher
        both ran the whole prefill under the lock). Returns the request id.
        """
        if self._admission is not None:
            raise RuntimeError("an admission is already in flight")
        slot = next(
            (i for i, s in enumerate(self.slots) if s is None), None
        )
        if slot is None:
            raise RuntimeError("no free slots")
        job = self.engine.start_prefill(input_ids, images, image_indices)
        rid = self._next_id
        self._next_id += 1
        self._admission = (rid, slot, job)
        return rid

    def admission_step(self) -> Optional[int]:
        """One prefill chunk of the in-flight admission; on the final call
        the row drops into its slot and the rid is returned (None before)."""
        rid, slot, job = self._admission
        if not job.done:
            self.engine.prefill_step(job)
            if not job.done:
                return None
        staged, last_hidden, true_len = self.engine.finish_prefill(job)
        self.rng, sub = jax.random.split(self.rng)
        token, lp = self.engine._head_sample(
            self.engine.params, last_hidden, sub, self.sampling
        )
        self.cache = self._insert(
            self.cache, staged, jnp.asarray(slot, jnp.int32)
        )
        self.slots[slot] = _Slot(
            request_id=rid,
            prompt_tokens=true_len,
            tokens=[int(token[0])],
            logprobs=[float(lp[0])],
            remaining=self.sampling.max_new_tokens - 1,
            prompt_ids=np.asarray(job.ids[0, :true_len], np.int32),
            media_key=job.media_key,
        )
        self.lengths[slot] = true_len
        self.cur_tokens[slot] = int(token[0])
        self._admission = None
        if self.on_tokens is not None and int(token[0]) not in self._stop_set:
            self.on_tokens(rid, [int(token[0])])
        return rid

    def add_request(
        self,
        input_ids,
        images=None,
        image_indices=None,
    ) -> int:
        """Prefill a request into a free slot in one go; returns the id."""
        rid = self.start_admission(input_ids, images, image_indices)
        while self.admission_step() is None:
            pass
        return rid

    def step(self) -> list[tuple[int, GenerationResult]]:
        """Decode one tick for every active slot; returns finished
        (request_id, result) pairs and frees their slots.

        With the engine's prompt-lookup speculation on (speculative_k > 0)
        and greedy sampling, a tick is ONE batched verify step instead of
        `tick` single-token reads: each slot proposes k-1 n-gram drafts
        from its own history, the pool verifies them in one cache read,
        and each row emits 1..k tokens (accepted prefix + bonus). Outputs
        stay bit-identical to the plain path (losslessness contract,
        inference/speculative.py); context-quoting workloads get the
        ~(accepted+1)x tokens-per-cache-read win in the serving mode that
        matters."""
        finished: list[tuple[int, GenerationResult]] = []
        # rows already past their first-token stop finish without decoding
        for i, s in enumerate(self.slots):
            if s is not None and (
                s.tokens[-1] in self._stop_set or s.remaining <= 0
            ):
                finished.append(self._finish(i, s))
                self.slots[i] = None
        active_mask = np.asarray([s is not None for s in self.slots])
        if not active_mask.any():
            return finished

        k = self.engine.speculative_k
        # every active row needs k free cache rows for a verify step, and
        # near the SEQUENCE cap (max_seq_len, not the chunk-rounded cache
        # capacity) a verify could emit tokens past where the plain tick
        # masks to eos — fall back to the plain per-token tick there so
        # the two paths stay bit-identical at the boundary
        spec_cap = min(self.cache.k.shape[2], self.engine.max_seq_len - 1)
        if (
            k > 0
            and self.sampling.greedy
            and all(
                int(self.lengths[i]) + k <= spec_cap
                for i, s in enumerate(self.slots) if s is not None
            )
        ):
            return finished + self._step_speculative()

        self.rng, sub = jax.random.split(self.rng)
        cache = KVCache(
            self.cache.k, self.cache.v, jnp.asarray(self.lengths),
            k_scale=self.cache.k_scale, v_scale=self.cache.v_scale,
        )
        tokens, lps, cache, _ = self.engine._decode_scan_masked(
            self.engine.params,
            jnp.asarray(self.cur_tokens[:, None]),
            jnp.asarray(self.lengths),
            cache,
            sub,
            self.sampling,
            self.tick,
            jnp.asarray(~active_mask),
        )
        self.cache = KVCache(
            cache.k, cache.v, self.cache.length,
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
        tokens = np.asarray(tokens)
        lps = np.asarray(lps)

        for i, s in enumerate(self.slots):
            if s is None:
                continue
            row = tokens[i]
            take = min(self.tick, s.remaining)
            stop_at = None
            for j in range(take):
                if row[j] in self._stop_set:
                    stop_at = j
                    break
            if stop_at is not None:
                kept = [int(t) for t in row[:stop_at]]
                s.tokens += kept
                s.logprobs += [float(x) for x in lps[i][:stop_at]]
                if self.on_tokens is not None and kept:
                    self.on_tokens(s.request_id, kept)
                finished.append(self._finish(i, s, all_fed=True))
                self.slots[i] = None
            else:
                kept = [int(t) for t in row[:take]]
                s.tokens += kept
                s.logprobs += [float(x) for x in lps[i][:take]]
                if self.on_tokens is not None and kept:
                    self.on_tokens(s.request_id, kept)
                s.remaining -= take
                self.lengths[i] += self.tick
                self.cur_tokens[i] = int(row[self.tick - 1])
                if s.remaining <= 0 or (
                    self.lengths[i] >= self.engine.max_seq_len - 1
                ):
                    finished.append(self._finish(i, s))
                    self.slots[i] = None
        return finished

    def _step_speculative(self) -> list[tuple[int, GenerationResult]]:
        """One batched verify step for every active slot (greedy only).

        Cache discipline per row (same frontier rule as the solo path,
        inference/speculative.py): the verify writes k rows at the row's
        frontier; step[0..j] (pending token + j accepted drafts) have valid
        kv, so lengths advances j+1 and the rejected tail stays masked
        garbage, overwritten by the next verify. The emitted bonus token
        outs[j] becomes the row's pending cur_token (kv not yet written) —
        identical bookkeeping to the plain tick's last-sampled token."""
        from long_vita_tpu.inference.speculative import draft_tokens

        k = self.engine.speculative_k
        eos = self.engine.eos_id
        step_mat = np.full((self.max_slots, k), eos, np.int32)
        n_drafts = np.zeros(self.max_slots, np.int32)
        for i, s in enumerate(self.slots):
            if s is None:
                continue
            step_mat[i, 0] = self.cur_tokens[i]
            hist = np.concatenate([
                np.asarray(s.prompt_ids, np.int32),
                np.asarray(s.tokens, np.int32),
            ])
            drafts = draft_tokens(hist, k - 1)
            step_mat[i, 1 : 1 + len(drafts)] = drafts
            n_drafts[i] = len(drafts)

        cache = KVCache(
            self.cache.k, self.cache.v, jnp.asarray(self.lengths),
            k_scale=self.cache.k_scale, v_scale=self.cache.v_scale,
        )
        outs, olps, cache = self.engine._verify_step(
            self.engine.params, jnp.asarray(step_mat),
            jnp.asarray(self.lengths[:, None]), cache,
        )
        self.engine._spec_steps += 1
        self.cache = KVCache(
            cache.k, cache.v, self.cache.length,
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
        outs = np.asarray(outs)
        olps = np.asarray(olps)

        finished: list[tuple[int, GenerationResult]] = []
        for i, s in enumerate(self.slots):
            if s is None:
                continue
            # accept drafts while they equal the model's own argmax
            j = 0
            while j < int(n_drafts[i]) and step_mat[i, j + 1] == outs[i, j]:
                j += 1
            # kv rows step[0..j] are valid; bonus outs[j] is emitted, unfed
            self.lengths[i] += j + 1
            self.cur_tokens[i] = int(outs[i, j])
            emitted = [int(t) for t in outs[i, : j + 1]]
            emit_lps = [float(x) for x in olps[i, : j + 1]]
            take = min(len(emitted), s.remaining)
            stop_at = next(
                (m for m, t in enumerate(emitted[:take])
                 if t in self._stop_set),
                None,
            )
            if stop_at is not None:
                kept = emitted[:stop_at]
                s.tokens += kept
                s.logprobs += emit_lps[:stop_at]
                if self.on_tokens is not None and kept:
                    self.on_tokens(s.request_id, kept)
                # every kept token was fed (only the bonus is unfed, and a
                # stop at the bonus keeps strictly fewer tokens)
                finished.append(self._finish(i, s, all_fed=True))
                self.slots[i] = None
            else:
                kept = emitted[:take]
                s.tokens += kept
                s.logprobs += emit_lps[:take]
                if self.on_tokens is not None and kept:
                    self.on_tokens(s.request_id, kept)
                s.remaining -= take
                if s.remaining <= 0 or (
                    int(self.lengths[i]) >= self.engine.max_seq_len - 1
                ):
                    finished.append(self._finish(i, s))
                    self.slots[i] = None
        return finished

    def run_to_completion(self) -> list[tuple[int, GenerationResult]]:
        out = []
        while self.active:
            out += self.step()
        return out

    def _finish(
        self, i: int, s: _Slot, all_fed: bool = False
    ) -> tuple[int, GenerationResult]:
        """Build the result for slot i; snapshot its cache row into the
        engine's prefix cache so a follow-up turn resumes here."""
        res = self._result(s)
        pc = self.engine.prefix_cache
        if pc is not None and s.prompt_ids is not None:
            # frontier rule as engine.generate: kv rows are valid for the
            # prompt plus every kept token that was FED back. The in-tick
            # stop branch fed every kept token (all_fed); elsewhere the
            # last kept token may still be un-fed — claim one less (match
            # aligns down to the chunk grid anyway).
            stopped = len(res.token_ids) < len(s.tokens)
            n_fed = (len(res.token_ids) if (all_fed or stopped)
                     else max(0, len(res.token_ids) - 1))
            row = lambda x: None if x is None else x[:, i:i + 1]
            frontier = s.prompt_tokens + n_fed
            pc.put(
                np.concatenate([
                    s.prompt_ids,
                    np.asarray(res.token_ids[:n_fed], np.int32),
                ]),
                KVCache(
                    row(self.cache.k), row(self.cache.v),
                    jnp.asarray(frontier, jnp.int32),
                    k_scale=row(self.cache.k_scale),
                    v_scale=row(self.cache.v_scale),
                ),
                frontier, s.media_key,
            )
        return (s.request_id, res)

    def _result(self, s: _Slot) -> GenerationResult:
        toks = s.tokens
        for idx, t in enumerate(toks):
            if t in self._stop_set:
                toks = toks[:idx]
                s.logprobs = s.logprobs[:idx]
                break
        text = self.engine.mm.tokenizer.decode(
            toks, skip_special_tokens=True
        )
        return GenerationResult(
            toks, text, s.prompt_tokens,
            s.logprobs if self.sampling.return_logprobs else None,
        )
