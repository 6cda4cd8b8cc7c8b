"""Inference engine: chunked multimodal prefill + KV-cache decode.

Replaces the reference's Megatron inference stack (SURVEY.md C21:
module.py generate -> generation.py token loop) and the HF generate path
(C8). Key differences, TPU-first:

  - Real distributed-KV decode design instead of the reference CP server's
    full-recompute-per-token loop (inference_..._server_cp.sh keeps
    --use-kv-cache off; we keep the cache).
  - Static shapes everywhere: prompt lengths bucket to multiples of
    `chunk` (compile-cache hygiene, SURVEY.md §7 hard parts); the cache
    length is corrected to the true length after prefill, so padded tail
    slots are masked and then overwritten one by one during decode.
  - Chunked prefill: prompts longer than `chunk` stream through the
    flash kernel against the growing cache (q_offset + kv_valid_len
    masking), bounding activation memory at 1M tokens.
  - Logits-masked head: prefill computes logits for exactly one row.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig
from long_vita_tpu.data.multimodal import MultimodalTokenizer
from long_vita_tpu.inference.sampler import SamplingParams, sample
from long_vita_tpu.models import qwen2
from long_vita_tpu.models.long_vita import encode_images
from long_vita_tpu.models.qwen2 import KVCache


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


@dataclasses.dataclass
class GenerationResult:
    token_ids: list[int]
    text: str
    prompt_tokens: int
    logprobs: Optional[list[float]] = None


@dataclasses.dataclass
class PrefillJob:
    """Incremental prefill state: one chunk per prefill_step call.

    Lets a scheduler interleave long-prompt admission with decode ticks
    (inference/continuous.py) instead of blocking every in-flight request
    for the whole prompt — a 128K admission is ~90 s·chip (PERF.md)."""

    ids: jnp.ndarray  # [1, padded]
    feats: Optional[jnp.ndarray]
    indices: Optional[jnp.ndarray]
    cache: KVCache
    true_len: int
    padded: int
    start: int = 0
    last_hidden: Optional[jnp.ndarray] = None
    media_key: str = ""     # prefix-cache fingerprint of the tile stack
    resumed_from: int = 0   # tokens restored from the prefix cache
    # interleaved encode (VERDICT r4 #8): pixels not yet encoded ride the
    # job; prefill_step dispatches exactly the transfer-chunks whose tiles
    # scatter into the upcoming prompt chunk, so the pixel H2D/host-cast
    # pipeline hides behind prefill device compute instead of fully
    # preceding it (the reference's server encodes ALL media before the
    # first decoder token, tasks/inference/module.py:270-362)
    pixels: Optional[np.ndarray] = None
    tiles_done: int = 0
    tile_first_row: Optional[np.ndarray] = None

    @property
    def done(self) -> bool:
        return self.start >= self.padded



def _host_cast_pixels(images, dtype) -> "jnp.ndarray":
    """Cast pixel arrays to the cache dtype ON HOST before device_put.

    jnp.asarray(f32_host_array, bf16) ships the full f32 bytes (measured
    16.2 s for a 616 MB frame stack through the axon relay vs 7.5 s for a
    host-side ml_dtypes cast + put — and PCIe on a real host scales the
    same way). At 1M-multimodal scale the prompt's frame stack is the
    single largest host->device transfer (2.3 GB f32 at 1536 frames), so
    halving its wire size directly cuts TTFT."""
    import ml_dtypes

    arr = np.asarray(images)
    if dtype == jnp.bfloat16 and arr.dtype == np.float32:
        arr = arr.astype(ml_dtypes.bfloat16)
    return jnp.asarray(arr, dtype)


def _pad_tiles(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad = np.zeros((n - arr.shape[0], *arr.shape[1:]), arr.dtype)
    return np.concatenate([arr, pad], 0)


_OOB_SEQ = np.int32(2**30)  # survives any `- chunk_start` shift as OOB


def _pad_scatter_indices(indices, n_feat_rows: int) -> np.ndarray:
    """Match the scatter index list to a padded feature stack.

    indices is [2, N_tiles, image_token_length]; when the pipelined
    encode pads the tile dim, append sentinel (batch 0, seq 2**30)
    entries — the embed scatter's mode="drop" discards out-of-range
    rows, so padded encodings never land in the prompt."""
    idx = np.asarray(indices)
    short = n_feat_rows - idx.shape[1]
    if short <= 0:
        return idx
    pad = np.zeros((2, short, idx.shape[2]), idx.dtype)
    pad[1] = _OOB_SEQ
    return np.concatenate([idx, pad], 1)


class InferenceEngine:
    def __init__(
        self,
        params,
        cfg: LongVITAConfig,
        mm_tokenizer: MultimodalTokenizer,
        *,
        max_seq_len: int = 16384,
        chunk: int = 2048,
        vision_chunk: int = 64,
        cache_dtype=jnp.bfloat16,
        kv_quant: bool = False,
        mesh=None,
        decode_segment: int = 64,
        prefix_cache_entries: int = 0,
        speculative_k: int = 0,
        transfer_chunk: int = 256,
        weight_quant: Optional[str] = None,
        interleave_encode: Optional[bool] = None,
    ):
        """mesh: optional jax Mesh for multi-chip serving — params shard by
        the training rules (TP on heads/MLP/vocab), the KV cache shards its
        head dim over tp; GSPMD inserts the TP collectives (the reference
        needs a whole Megatron inference stack for this, SURVEY.md C21).

        interleave_encode: defer tile encoding into the prefill chunk loop
        (see start_prefill). Default OFF — the round-5 1M composite A/B on
        the network-attached v5e measured interleaved 255.9 s TTFT vs
        upfront-pipelined 217.6 s (same session, same chip): splicing
        pixel shipping between prefill dispatches loses the back-to-back
        wire/tower overlap the upfront loop gets. Opt in (or set
        LVT_INTERLEAVE_ENCODE=1) on directly-attached hosts where H2D is
        PCIe and the encode wall is small."""
        self.cfg = cfg
        self.mm = mm_tokenizer
        self.max_seq_len = max_seq_len
        self.chunk = chunk
        self.vision_chunk = vision_chunk
        self.cache_dtype = cache_dtype
        self.kv_quant = kv_quant
        self.decode_segment = decode_segment
        self.transfer_chunk = transfer_chunk
        if interleave_encode is None:
            interleave_encode = (
                os.environ.get("LVT_INTERLEAVE_ENCODE", "0") == "1"
            )
        self.interleave_encode = interleave_encode
        self.eos_id = cfg.text.eos_token_id
        # cross-request prefix KV reuse (inference/prefix_cache.py): skips
        # re-prefilling a shared prompt prefix — multi-turn chat over one
        # long video re-pays ~the whole TTFT every turn without it (the
        # reference recomputes the full prompt per request)
        self.prefix_cache = None
        if prefix_cache_entries > 0:
            from long_vita_tpu.inference.prefix_cache import PrefixCache

            self.prefix_cache = PrefixCache(prefix_cache_entries, chunk)
        # prompt-lookup speculative decoding (inference/speculative.py):
        # greedy generate verifies k-token n-gram drafts per step —
        # lossless (bit-identical outputs), ~(accepted+1)x decode speed
        # when the answer quotes the context
        self.speculative_k = speculative_k
        if speculative_k < 0 or speculative_k == 1:
            raise ValueError("speculative_k must be 0 (off) or >= 2")
        self._spec_steps = 0  # verify-step counter (acceptance telemetry)
        # weight-only int8 (w8a16, models/quantize.py): decode is HBM-
        # bound on the per-token weight read — halving weight bytes
        # halves the tok/s floor itself. Opt-in; the reference serves
        # strictly bf16 (text_generation_server.py).
        self.weight_quant = weight_quant
        if weight_quant is not None:
            # on the HOST: the device path would hold fp + quantized
            # trees together — more HBM than the chip the quantized
            # model is meant to fit on (quantize._quant_entry_host)
            if weight_quant == "int8":
                from long_vita_tpu.models.quantize import (
                    quantize_weights_int8_host,
                )

                params = quantize_weights_int8_host(params)
            elif weight_quant == "int4":
                from long_vita_tpu.models.quantize import (
                    quantize_weights_int4_host,
                )

                params = quantize_weights_int4_host(params)
            else:
                raise ValueError(f"unknown weight_quant {weight_quant!r}")
        self.mesh = mesh
        self.parallel = None
        if mesh is not None:
            from long_vita_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
            cp = mesh.shape.get("cp", 1)
            if cp > 1:
                from long_vita_tpu.models.qwen2 import ParallelConfig

                # sequence-sharded KV cache + shard_map partial-merge
                # attention (1M serving without recompute-per-token)
                self.parallel = ParallelConfig(mesh)
                slots = _round_up(max_seq_len, chunk)
                if chunk > slots // cp:
                    raise ValueError(
                        f"prefill chunk {chunk} exceeds one cp rank's cache "
                        f"shard ({slots}//{cp} = {slots // cp}); lower "
                        "chunk or raise max_seq_len"
                    )
        self.params = params

        # the input cache is DONATED on every step (callers always adopt
        # the returned cache) — without donation each prefill chunk/decode
        # scan transiently holds two full KV caches in HBM, halving the
        # servable context per chip
        self._prefill_chunk = jax.jit(
            self._prefill_chunk_impl, donate_argnums=(3,)
        )
        self._embed_chunk = jax.jit(self._embed_chunk_impl)
        self._decode_step = jax.jit(
            self._decode_step_impl, static_argnames=("sp",),
            donate_argnums=(3,),
        )
        self._decode_scan_masked = jax.jit(
            self._decode_scan_masked_impl, static_argnames=("sp", "n"),
            donate_argnums=(3,),
        )
        self._encode_images = jax.jit(self._encode_images_impl)
        # donated dynamic_update_slice: pipelined encode writes each
        # transfer-chunk's features into ONE buffer (never two copies of
        # the 4.0 GB feature stack at 1536 frames)
        self._feat_update = jax.jit(
            lambda buf, part, start: jax.lax.dynamic_update_slice(
                buf, part, (start, 0, 0)
            ),
            donate_argnums=(0,),
        )
        self._last_row = jax.jit(self._last_row_impl, donate_argnums=(3,))
        self._head_sample = jax.jit(
            self._head_sample_impl, static_argnames=("sp",)
        )
        self._verify_step = jax.jit(
            self._verify_step_impl, donate_argnums=(3,)
        )

    def _make_cache(self, batch: int, max_len: int) -> KVCache:
        cache = KVCache.zeros(
            self.cfg.text, batch=batch, max_len=max_len,
            dtype=self.cache_dtype, quantize=self.kv_quant,
        )
        return self.shard_cache(cache)

    def shard_cache(self, cache: KVCache) -> KVCache:
        """Lay a cache out on the serving mesh: cache slots over cp (when
        cp-serving), kv heads over tp. No-op off-mesh. Also used by beam
        search after replicating the prompt cache across beams."""
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding, PartitionSpec as P

        from long_vita_tpu.parallel.mesh import AXIS_CP, AXIS_TP

        cp_axis = AXIS_CP if self.parallel is not None else None
        spec = NamedSharding(
            self.mesh, P(None, None, cp_axis, AXIS_TP, None)
        )
        return KVCache(
            jax.device_put(cache.k, spec),
            jax.device_put(cache.v, spec),
            cache.length,
            k_scale=(
                jax.device_put(cache.k_scale, spec)
                if cache.k_scale is not None else None
            ),
            v_scale=(
                jax.device_put(cache.v_scale, spec)
                if cache.v_scale is not None else None
            ),
        )

    # ---- jitted pieces --------------------------------------------------

    def _encode_images_host(self, images) -> jnp.ndarray:
        """Encode a HOST tile stack, overlapping pixel transfer with
        tower compute.

        A one-shot encode serializes the FULL pixel transfer (1.15 GB
        bf16 at 1536 frames) before the first ViT flop. Splitting the
        stack into `transfer_chunk`-tile pieces and dispatching encode
        per piece lets JAX's async dispatch run chunk i's tower while
        chunk i+1's pixels are still in flight (H2D DMA and the MXU are
        independent engines). Each piece's features land in ONE donated
        buffer, so the feature stack (4.0 GB bf16 at 1536 frames) is
        never held twice.

        Returns a buffer padded to a transfer_chunk multiple; rows past
        the real tile count hold zero-tile encodings. Consumers feed
        feature rows through the `image_indices` scatter, whose index
        list is padded with out-of-range sentinels for those rows
        (`_pad_scatter_indices`) so `mode="drop"` discards them. Off on
        meshes (sharded-layout policy stays with the one-shot jit) and
        for stacks within one chunk.
        """
        arr = np.asarray(images)
        n, tc = arr.shape[0], self.transfer_chunk
        if self.mesh is not None or not tc or n <= tc:
            return self._encode_images(
                self.params, _host_cast_pixels(arr, self.cache_dtype)
            )
        buf = None
        for i in range(0, n, tc):
            part = self._encode_images(
                self.params,
                _host_cast_pixels(
                    _pad_tiles(arr[i : i + tc], tc), self.cache_dtype
                ),
            )
            if buf is None:
                buf = jnp.zeros(
                    (-(-n // tc) * tc, *part.shape[1:]), part.dtype
                )
            buf = self._feat_update(buf, part, i)
        return buf

    def _encode_images_impl(self, params, images):
        # "short": the single-pass ViT attention kernel (forward-only);
        # on cp meshes tiles run batch-parallel over cp (encode_images)
        return encode_images(
            params, images, self.cfg, chunk=self.vision_chunk,
            attn_impl="short", parallel=self.parallel,
        )

    def _embed_chunk_impl(self, params, ids_chunk, feats, indices, start):
        """Token embeds + image-feature scatter for ONE prompt chunk.

        At 1M tokens whole-prompt [1, S, H] bf16 embeds are ~10 GB; per-
        chunk embedding keeps activation memory at O(chunk). The feature
        scatter shifts indices into chunk coordinates and DROPS rows that
        fall outside — a tile run straddling a chunk boundary lands token
        by token in the right chunks."""
        embeds = qwen2.embed_tokens(params["text"], ids_chunk)
        if feats is not None:
            b_idx = indices[0].reshape(-1)
            s_idx = indices[1].reshape(-1) - start
            flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
            embeds = embeds.at[b_idx, s_idx].set(
                flat, mode="drop", indices_are_sorted=False
            )
        if self.parallel is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from long_vita_tpu.parallel.mesh import AXIS_CP

            embeds = jax.lax.with_sharding_constraint(
                embeds, NamedSharding(self.mesh, P(None, AXIS_CP, None))
            )
        return embeds.astype(self.cache_dtype)

    def _prefill_chunk_impl(self, params, embeds, start, cache):
        """Run one prompt chunk through the decoder, extending the cache."""
        b, s, _ = embeds.shape
        positions = start + jnp.arange(s)[None, :]
        if self.parallel is not None and s % self.parallel.mesh.shape.get(
            self.parallel.axis_cp, 1
        ) == 0:
            # seq-shard the chunk over cp: every GEMM between attention
            # boundaries (QKV/MLP/norms) runs on 1/cp of the rows per rank;
            # the attention shard_map gathers q and scatters the merged
            # output back to this layout (cp_cache_attention q_sharded).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from long_vita_tpu.parallel.mesh import AXIS_CP

            embeds = jax.lax.with_sharding_constraint(
                embeds, NamedSharding(self.mesh, P(None, AXIS_CP, None))
            )
        hidden, cache = qwen2.qwen2_decoder(
            params["text"], embeds, positions, self.cfg.text, kv_cache=cache,
            parallel=self.parallel,
        )
        return hidden[:, -1], cache  # last row hidden (pre-head)

    def _last_row_impl(self, params, token, pos, cache):
        """Decode-style pass of the final real prompt token (no sampling)."""
        embeds = qwen2.embed_tokens(params["text"], token)
        hidden, cache = qwen2.qwen2_decoder(
            params["text"], embeds, pos, self.cfg.text, kv_cache=cache,
            parallel=self.parallel,
        )
        return hidden[:, -1], cache

    def _head_sample_impl(self, params, hidden, rng, sp):
        logits = qwen2.lm_head(params["text"], hidden)
        token = sample(logits, rng, sp)
        logprob = jnp.take_along_axis(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
            token[:, None], axis=-1,
        )[:, 0]
        return token, logprob

    def _verify_step_impl(self, params, tokens, pos0, cache):
        """Speculative verify: feed k tokens at positions pos0..pos0+k-1
        against a cache of length pos0; return each row's greedy argmax
        (the model's next token after that prefix) + its logprob. One
        cache read for k candidate emissions — see inference/speculative.py."""
        embeds = qwen2.embed_tokens(params["text"], tokens)
        positions = pos0 + jnp.arange(tokens.shape[1])[None, :]
        hidden, cache = qwen2.qwen2_decoder(
            params["text"], embeds, positions, self.cfg.text, kv_cache=cache,
            parallel=self.parallel,
        )
        logits = qwen2.lm_head(params["text"], hidden)  # [B, k, V]
        out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lps = jnp.take_along_axis(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
            out[..., None], axis=-1,
        )[..., 0]
        return out, lps, cache

    def _decode_step_impl(self, params, token, pos, cache, rng, sp):
        embeds = qwen2.embed_tokens(params["text"], token)
        hidden, cache = qwen2.qwen2_decoder(
            params["text"], embeds, pos, self.cfg.text, kv_cache=cache,
            parallel=self.parallel,
        )
        logits = qwen2.lm_head(params["text"], hidden[:, -1])
        next_token = sample(logits, rng, sp)
        return next_token, cache

    def _decode_scan_masked_impl(
        self, params, token, start_pos, cache, rng, sp, n, done0
    ):
        """As _decode_scan_impl, with an initial done mask — the continuous
        batcher feeds empty/finished slots as done (they step but emit eos
        and their clamped frontier writes are discarded)."""
        eos = self.eos_id
        stops = jnp.asarray((eos,) + tuple(sp.stop_token_ids), jnp.int32)
        cap = self.max_seq_len - 1  # last admissible token position

        def body(carry, i):
            token, cache, rng, done = carry
            rng, sub = jax.random.split(rng)
            embeds = qwen2.embed_tokens(params["text"], token)
            hidden, cache = qwen2.qwen2_decoder(
                params["text"], embeds, (start_pos + i)[:, None],
                self.cfg.text, kv_cache=cache, parallel=self.parallel,
            )
            logits = qwen2.lm_head(params["text"], hidden[:, -1])
            next_token = sample(logits, sub, sp)
            # per-row capacity: a ragged batch scans to the LONGEST row's
            # budget; rows that reach max_seq_len emit eos from there on
            done = jnp.logical_or(done, start_pos + i >= cap)
            next_token = jnp.where(done, eos, next_token)
            logprob = jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1),
                next_token[:, None], axis=-1,
            )[:, 0]
            done = jnp.logical_or(done, jnp.any(next_token[:, None] == stops[None], axis=-1))
            return (next_token[:, None], cache, rng, done), (next_token, logprob)

        (_, cache, _, done), (tokens, logprobs) = jax.lax.scan(
            body, (token, cache, rng, done0), jnp.arange(n)
        )
        return tokens.T, logprobs.T, cache, done  # [B, n]

    def _decode_run(
        self, token, start_pos, cache, rng, sp, budget, done0
    ):
        """Decode up to `budget` tokens in fixed-size SEGMENTS with a host
        early-stop check between segments.

        Two serving problems this solves at once (VERDICT #9):
          - compile-cache hygiene: the one-shot scan compiled a fresh
            program per distinct budget (every prompt-length/max-tokens
            pair); segments compile at most log2(decode_segment)+1 scan
            lengths total;
          - early stop: the one-shot scan always ran the full budget even
            when every row hit eos at step 3 (the reference's loop
            early-stops via a broadcast, generation.py:255-258) — now at
            most decode_segment-1 wasted steps.
        -> (tokens [B, <=budget], logprobs, cache, done).
        """
        tok_parts, lp_parts = [], []
        done = done0
        remaining = budget
        while remaining > 0:
            n = self.decode_segment
            while n // 2 >= remaining:  # small budgets: pow2 buckets
                n //= 2
            rng, sub = jax.random.split(rng)
            toks, lps, cache, done = self._decode_scan_masked(
                self.params, token, start_pos, cache, sub, sp, n, done
            )
            tok_parts.append(np.asarray(toks))
            lp_parts.append(np.asarray(lps))
            token = toks[:, -1:]
            start_pos = start_pos + n
            remaining -= n
            if bool(np.asarray(done).all()):
                break
        tokens = np.concatenate(tok_parts, axis=1)[:, :budget]
        lps = np.concatenate(lp_parts, axis=1)[:, :budget]
        return tokens, lps, cache, done

    # ---- public API ------------------------------------------------------

    def start_prefill(
        self,
        input_ids: Sequence[int],
        images: Optional[np.ndarray] = None,
        image_indices: Optional[np.ndarray] = None,
    ) -> PrefillJob:
        """Begin an incremental prefill; drive with prefill_step, then
        finish_prefill. (prefill() wraps the three for one-shot callers.)"""
        true_len = len(input_ids)
        if true_len > self.max_seq_len:
            raise ValueError(
                f"prompt {true_len} exceeds max_seq_len {self.max_seq_len} "
                "(reference max_tokens_to_oom semantics)"
            )
        padded = _round_up(true_len, self.chunk)
        ids = np.zeros((1, padded), np.int32)
        ids[0, :true_len] = input_ids
        feats = indices = None
        pixels = tile_first_row = None
        if images is not None and np.asarray(images).shape[0] > 0:
            arr = np.asarray(images)
            n, tc = arr.shape[0], self.transfer_chunk
            if (self.interleave_encode and self.mesh is None and tc
                    and n > tc):
                # INTERLEAVED encode (opt-in): defer tile encoding to
                # prefill_step, which dispatches each transfer-chunk just
                # before the first prompt chunk its tiles scatter into.
                # Measured SLOWER than the upfront pipelined loop on a
                # network-attached chip (round-5 A/B in PERF.md: 255.9 vs
                # 217.6 s composite TTFT) — the upfront loop's back-to-back
                # dispatches overlap wire transfer i+1 with tower i, which
                # splicing prefill chunks between encodes breaks. Kept for
                # PCIe-attached hosts. Off on meshes (sharded-layout
                # policy stays with the one-shot jit, as for pipelining).
                pixels = arr
                tile_first_row = np.asarray(image_indices)[1].min(axis=1)
                indices = jnp.asarray(_pad_scatter_indices(
                    image_indices, _round_up(n, tc)
                ))
            else:
                feats = self._encode_images_host(arr)
                indices = jnp.asarray(
                    _pad_scatter_indices(image_indices, feats.shape[0])
                )
        media_key, cache, start = "", None, 0
        if self.prefix_cache is not None:
            from long_vita_tpu.inference.prefix_cache import media_fingerprint

            media_key = media_fingerprint(images)
            hit = self.prefix_cache.match(
                np.asarray(input_ids, np.int32), media_key
            )
            if hit is not None:
                cache, start = hit
        if cache is None:
            cache = self._make_cache(
                batch=1, max_len=_round_up(self.max_seq_len, self.chunk)
            )
        tiles_done = 0
        if pixels is not None and start > 0:
            # prefix-cache resume: tiles whose every scatter row sits inside
            # the restored prefix are never read — skip their encodes
            last_row = np.asarray(image_indices)[1].max(axis=1)
            while tiles_done < pixels.shape[0] and last_row[tiles_done] < start:
                tiles_done += 1
        return PrefillJob(
            ids=jnp.asarray(ids), feats=feats, indices=indices,
            cache=cache, true_len=true_len, padded=padded,
            start=start, media_key=media_key, resumed_from=start,
            pixels=pixels, tile_first_row=tile_first_row,
            tiles_done=tiles_done,
        )

    def _advance_encode(self, job: PrefillJob, upto_row=None) -> None:
        """Dispatch encode transfer-chunks until every tile that scatters
        below `upto_row` has final features in the job buffer (all tiles
        when None). Dispatches are async: the device runs them before the
        next prefill chunk (queue order), while the host loop moves on to
        casting/shipping the following pixel batch."""
        if job.pixels is None:
            return
        n = job.pixels.shape[0]
        if upto_row is None:
            need = n
        else:
            mask = job.tile_first_row < upto_row
            need = int(np.nonzero(mask)[0].max()) + 1 if mask.any() else 0
        tc = self.transfer_chunk
        while job.tiles_done < need:
            i = job.tiles_done
            part = self._encode_images(
                self.params,
                _host_cast_pixels(
                    _pad_tiles(job.pixels[i : i + tc], tc),
                    self.cache_dtype,
                ),
            )
            if job.feats is None:
                job.feats = jnp.zeros(
                    (_round_up(n, tc), *part.shape[1:]), part.dtype
                )
            job.feats = self._feat_update(job.feats, part, i)
            job.tiles_done = min(i + tc, n)

    def prefill_step(self, job: PrefillJob) -> bool:
        """Run ONE prompt chunk; returns True when all chunks are done."""
        start = job.start
        self._advance_encode(job, start + self.chunk)
        # a leading text-only chunk skips the scatter entirely (feats may
        # not exist yet under interleaved encode)
        feats, indices = (
            (job.feats, job.indices) if job.feats is not None else (None, None)
        )
        chunk_embeds = self._embed_chunk(
            self.params, job.ids[:, start : start + self.chunk],
            feats, indices, jnp.asarray(start, jnp.int32),
        )
        job.last_hidden, job.cache = self._prefill_chunk(
            self.params, chunk_embeds, start, job.cache
        )
        job.start = start + self.chunk
        return job.done

    def finish_prefill(
        self, job: PrefillJob
    ) -> tuple[KVCache, jnp.ndarray, int]:
        """-> (cache at true length, last-row hidden, true prompt length)."""
        assert job.done, "prefill_step until done before finish_prefill"
        true_len, cache, last_hidden = job.true_len, job.cache, job.last_hidden
        # padded tail slots hold garbage kv; shrink the cache to truth so
        # decode masks them and overwrites them one position at a time.
        cache = KVCache(
            cache.k, cache.v, jnp.asarray(true_len, jnp.int32),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
        # logits row for the true last prompt token
        if job.padded != true_len:
            # recompute the last row exactly: decode-style pass of the final
            # real token against the cache shrunk to exclude it
            cache_minus = KVCache(
                cache.k, cache.v, jnp.asarray(true_len - 1, jnp.int32),
                k_scale=cache.k_scale, v_scale=cache.v_scale,
            )
            # (the chat template always ends with a text token, so no
            # image-feature merge is needed for this single row)
            tok = job.ids[:, true_len - 1 : true_len]
            last_hidden, cache = self._last_row(
                self.params, tok, jnp.full((1, 1), true_len - 1), cache_minus
            )
        return cache, last_hidden, true_len

    def prefill(
        self,
        input_ids: Sequence[int],
        images: Optional[np.ndarray] = None,
        image_indices: Optional[np.ndarray] = None,
    ) -> tuple[KVCache, jnp.ndarray, int]:
        """-> (cache at true length, last-row hidden, true prompt length)."""
        job = self.start_prefill(input_ids, images, image_indices)
        while not job.done:
            self.prefill_step(job)
        return self.finish_prefill(job)

    def prefill_batch(
        self, batch_inputs: list[tuple]
    ) -> tuple[KVCache, jnp.ndarray, np.ndarray]:
        """Batched ragged prefill: all prompts pad to one chunk-multiple and
        stream through the decoder together; a per-row frontier (vector
        cache length) then realigns each row at its true length.

        batch_inputs: list of (input_ids, images, image_indices) per row.
        -> (cache with per-row lengths, last-row hidden [B, H], lengths [B]).

        Composes with cp-sharded caches: prefill chunks write at batch-
        uniform offsets (all rows pad to one chunk grid), and the per-row
        realignment + decode ride the vector-cache_len shard_map path
        (ops/cp_cache_attention.py) — the reference's CP server is strictly
        one-at-a-time (text_generation_server.py:25-32).
        """
        bsz = len(batch_inputs)
        lengths = np.asarray([len(x[0]) for x in batch_inputs], np.int32)
        if lengths.max() > self.max_seq_len:
            raise ValueError(
                f"prompt {int(lengths.max())} exceeds max_seq_len "
                f"{self.max_seq_len} (reference max_tokens_to_oom semantics)"
            )
        padded = _round_up(int(lengths.max()), self.chunk)
        ids = np.zeros((bsz, padded), np.int32)
        for row, (toks, _, _) in enumerate(batch_inputs):
            ids[row, : len(toks)] = toks
        ids = jnp.asarray(ids)

        # merge per-row tile stacks; rewrite the scatter batch index the way
        # the training collator does (reference data_collator.py:88-95)
        feats = indices = None
        stacks, idx_parts = [], []
        for row, (_, imgs, idx) in enumerate(batch_inputs):
            if imgs is None or imgs.shape[0] == 0:
                continue
            stacks.append(np.asarray(imgs))
            idx = np.array(idx, copy=True)
            idx[0] = row
            idx_parts.append(idx)
        if stacks:
            feats = self._encode_images_host(np.concatenate(stacks, 0))
            indices = jnp.asarray(
                _pad_scatter_indices(
                    np.concatenate(idx_parts, 1), feats.shape[0]
                )
            )

        cache = self._make_cache(
            batch=bsz, max_len=_round_up(self.max_seq_len, self.chunk)
        )
        for start in range(0, padded, self.chunk):
            chunk_embeds = self._embed_chunk(
                self.params, ids[:, start : start + self.chunk],
                feats, indices, jnp.asarray(start, jnp.int32),
            )
            _, cache = self._prefill_chunk(
                self.params, chunk_embeds, start, cache
            )
        # Realign every row at its true length: re-run each row's final
        # prompt token decode-style against a per-row frontier of len-1 (the
        # scatter overwrites slot len-1 with the identical kv; causality
        # masks each row's padded-prefill garbage beyond the frontier).
        cache = KVCache(
            cache.k, cache.v, jnp.asarray(lengths - 1),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
        last_tok = jnp.asarray(
            np.take_along_axis(
                np.asarray(ids), lengths[:, None] - 1, axis=1
            )
        )
        last_hidden, cache = self._last_row(
            self.params, last_tok, jnp.asarray(lengths[:, None] - 1), cache
        )
        return cache, last_hidden, lengths

    def generate_batch(
        self,
        requests: list[dict],
        *,
        sampling: SamplingParams = SamplingParams(),
        seed: int = 0,
    ) -> list[GenerationResult]:
        """Decode several requests in lockstep (one compiled scan for the
        whole batch — weight reads amortize, the serving-throughput lever
        the reference's one-request server never gets).

        Each request dict: {"messages": [...]} or {"input_ids": [...]},
        plus optional "images", "videos", "max_num_frame".
        """
        expanded = []
        for r in requests:
            input_ids = r.get("input_ids")
            if input_ids is None:
                input_ids = self.mm.encode_chat(r["messages"])
            expanded.append(self.mm.expand(
                input_ids,
                images=r.get("images", ()),
                videos=r.get("videos", ()),
                max_num_frame=r.get("max_num_frame"),
            ))
        cache, last_hidden, lengths = self.prefill_batch(
            [(e.input_ids, e.images, e.image_indices) for e in expanded]
        )
        bsz = len(requests)
        rng = jax.random.PRNGKey(seed)
        rng, sub = jax.random.split(rng)
        first, first_lp = self._head_sample(
            self.params, last_hidden, sub, sampling
        )
        first = np.asarray(first)
        rows = [[int(first[b])] for b in range(bsz)]
        row_lps = [[float(x)] for x in np.asarray(first_lp)]
        # scan to the LONGEST row's budget (the shortest prompt) — each
        # row's own capacity is enforced inside the scan, so one long
        # prompt cannot truncate its batchmates' outputs
        budget = min(
            sampling.max_new_tokens - 1,
            self.max_seq_len - 1 - int(lengths.min()),
        )
        stop_set = {self.eos_id, *sampling.stop_token_ids}
        done0 = jnp.asarray([int(t) in stop_set for t in first])
        if budget > 0 and not bool(done0.all()):
            rng, sub = jax.random.split(rng)
            tokens, lps, cache, _ = self._decode_run(
                jnp.asarray(first[:, None]), jnp.asarray(lengths),
                cache, sub, sampling, budget, done0,
            )
            for b in range(bsz):
                rows[b] += [int(t) for t in tokens[b]]
                row_lps[b] += [float(x) for x in lps[b]]
        results = []
        for b in range(bsz):
            toks, lps_b = rows[b], row_lps[b]
            for idx, t in enumerate(toks):
                if t in stop_set:
                    toks, lps_b = toks[:idx], lps_b[:idx]
                    break
            text = self.mm.tokenizer.decode(toks, skip_special_tokens=True)
            results.append(GenerationResult(
                toks, text, int(lengths[b]),
                lps_b if sampling.return_logprobs else None,
            ))
        return results

    def generate(
        self,
        messages: Optional[list[dict]] = None,
        *,
        input_ids: Optional[Sequence[int]] = None,
        images: Sequence = (),
        videos: Sequence = (),
        sampling: SamplingParams = SamplingParams(),
        seed: int = 0,
        max_num_frame: Optional[int] = None,
    ) -> GenerationResult:
        """Chat generate. `messages` use <image>/<video> tags in content."""
        if input_ids is None:
            input_ids = self.mm.encode_chat(messages)
        expanded = self.mm.expand(
            input_ids, images=images, videos=videos,
            max_num_frame=max_num_frame,
        )

        job = self.start_prefill(
            expanded.input_ids, expanded.images, expanded.image_indices
        )
        while not job.done:
            self.prefill_step(job)
        cache, last_hidden, true_len = self.finish_prefill(job)
        rng = jax.random.PRNGKey(seed)
        rng, sub = jax.random.split(rng)
        token, first_lp = self._head_sample(
            self.params, last_hidden, sub, sampling
        )
        token = token.reshape(1, 1)
        out_tokens = [int(token[0, 0])]
        pos = true_len
        budget = min(
            sampling.max_new_tokens - 1, self.max_seq_len - 1 - pos
        )
        logprobs: list[float] = [float(first_lp[0])]
        stop_set = {self.eos_id, *sampling.stop_token_ids}
        if out_tokens[-1] not in stop_set and budget > 0:
            if self.speculative_k > 0 and sampling.greedy:
                from long_vita_tpu.inference.speculative import (
                    speculative_decode,
                )

                hist = np.concatenate([
                    np.asarray(expanded.input_ids, np.int32),
                    np.asarray(out_tokens, np.int32),
                ])
                toks, lps, cache = speculative_decode(
                    self, hist, out_tokens[-1], pos, cache, budget,
                    stop_set, self.speculative_k,
                )
                out_tokens += toks
                logprobs += lps
            else:
                rng, sub = jax.random.split(rng)
                tokens, lps, cache, _ = self._decode_run(
                    token, jnp.full((1,), pos, jnp.int32), cache,
                    sub, sampling, budget, jnp.zeros((1,), bool),
                )
                out_tokens += [int(t) for t in np.asarray(tokens[0])]
                logprobs += [float(x) for x in np.asarray(lps[0])]
        stopped = False
        for idx, t in enumerate(out_tokens):
            if t in stop_set:
                out_tokens = out_tokens[:idx]
                logprobs = logprobs[:idx]
                stopped = True
                break
        if self.prefix_cache is not None:
            # kv is valid for every token that was FED back (all of them if
            # a stop token ended decode; all but the final sample otherwise)
            n_fed = len(out_tokens) if stopped else max(0, len(out_tokens) - 1)
            ids_cached = np.concatenate([
                np.asarray(expanded.input_ids, np.int32),
                np.asarray(out_tokens[:n_fed], np.int32),
            ])
            self.prefix_cache.put(
                ids_cached, cache, true_len + n_fed, job.media_key
            )
        text = self.mm.tokenizer.decode(out_tokens, skip_special_tokens=True)
        return GenerationResult(
            out_tokens, text, true_len,
            logprobs if sampling.return_logprobs else None,
        )
