"""Qwen2.5 decoder as pure functions over a stacked-layer pytree.

Behavioral parity target: the HF Qwen2 path used by the released
Long-VITA-*_HF checkpoints (reference modeling_long_vita.py:57-311 builds on
transformers' Qwen2Model). Architecture: RMSNorm (eps 1e-6), GQA attention
with q/k/v bias + rotate-half RoPE (theta 1e6), SwiGLU MLP, untied lm_head.

TPU-first design decisions (vs the reference's Megatron layer classes):
  - All 48 layers share one compiled body via lax.scan over stacked params
    ([L, ...] leading dim) — one MXU-shaped matmul chain, compile time O(1)
    in depth, and rematerialization is a single jax.checkpoint policy on the
    scan body (replacing Megatron's --recompute-num-layers machinery,
    reference stage4.sh full recompute of 48 layers).
  - No attention-mask tensors: masks are derived from positions/segment ids
    inside the attention kernel (see ops/attention.py).
  - KV cache is a preallocated [L, B, Smax, Hkv, D] buffer updated with
    dynamic_update_slice inside the scan — static shapes, jit-stable decode.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from long_vita_tpu.config import TextConfig
from long_vita_tpu.ops.attention import dot_product_attention
from long_vita_tpu.ops.rope import apply_rope, rope_cos_sin

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh context for context-parallel (ring) attention.

    When set (and not decoding from a KV cache), decoder self-attention runs
    as zigzag ring attention over `axis_cp` via shard_map; inputs must
    already be zigzag-permuted (parallel/zigzag.py). Heads shard over
    `axis_tp`, batch over `axis_dp`.
    """

    mesh: Any  # jax.sharding.Mesh
    axis_dp: str = "dp"
    axis_cp: str = "cp"
    axis_tp: str = "tp"
    cp_algo: str = "ring"  # "ring" (zigzag) | "ulysses" (head a2a) | "hybrid"
    cp_inner: int = 1  # hybrid: ulysses lanes per ring group
    cp_window: int = 0  # double-ring: ranks per inner window (0 = plain)
    axis_pp: str = "pp"
    microbatches: int = 0  # pipeline microbatches (0 -> pp size)
    virtual_pp: int = 1  # interleaved pipeline chunks per stage (1 = GPipe)
    # Axes the nested compute shard_maps (attention / EP) go manual over;
    # None = all mesh axes. Inside the pipeline stage body this MUST be
    # set to {dp, cp, tp}: a nested full-manual shard_map whose specs
    # never mention pp claims its outputs replicated over pp — unverified
    # under check_vma=False — and its TRANSPOSE then psums activation
    # gradients ACROSS PIPELINE STAGES, silently corrupting every weight
    # grad in pp training (caught by
    # tests/test_pipeline.py::test_interleaved_train_step_matches_gpipe).
    manual_axes: Optional[frozenset] = None

    @property
    def pp_size(self) -> int:
        try:
            return self.mesh.shape.get(self.axis_pp, 1)
        except Exception:
            return 1


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm with f32 variance, matching HF Qwen2RMSNorm numerics."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return weight * xf.astype(x.dtype)


@dataclasses.dataclass
class KVCache:
    """Static-shape KV cache: k/v are [L, B, Smax, Hkv, D].

    With int8 quantization (`zeros(..., quantize=True)`) k/v store int8
    values plus per-(token, head) f32 scales — decode reads HALF the HBM
    (the decode bottleneck at long context). Dequantization fuses into the
    attention matmuls (ops/attention.py quant path); the reference has no
    KV quantization at all.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    # int32 number of valid positions: scalar (batch-uniform) or [B] vector
    # (ragged batched serving — each row's tokens stay contiguously packed,
    # writes scatter at per-row offsets, causality masks beyond the frontier)
    length: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None  # [L, B, Smax, Hkv, 1] f32
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def zeros(
        cls, cfg: TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
        quantize: bool = False,
    ) -> "KVCache":
        shape = (
            cfg.num_hidden_layers,
            batch,
            max_len,
            cfg.num_key_value_heads,
            cfg.head_dim,
        )
        if quantize:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                length=jnp.zeros((), jnp.int32),
                k_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32),
                v_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
        )


jax.tree_util.register_dataclass(
    KVCache, data_fields=["k", "v", "length", "k_scale", "v_scale"],
    meta_fields=[],
)


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, head) symmetric int8: [..., D] -> (int8, f32 scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _with_lora(entry: Params, x: jnp.ndarray, out: jnp.ndarray,
               cfg: Optional[TextConfig]) -> jnp.ndarray:
    """Add a projection's low-rank update when the layer carries adapters.

    Reference LoRA flag group (arguments.py:263-281). The adapters ride the
    stacked layer pytree through the scan, so training, serving and beam
    all see them with no separate code path; merge_lora (training/lora.py)
    folds them into the base weights for export."""
    if "lora" not in entry or cfg is None or cfg.lora_r == 0:
        return out
    scale = cfg.lora_alpha / cfg.lora_r
    return out + ((x @ entry["lora"]["a"]) @ entry["lora"]["b"]) * scale


def _proj(
    entry: Params,
    x: jnp.ndarray,
    cfg: Optional[TextConfig],
    parallel: Optional["ParallelConfig"],
) -> jnp.ndarray:
    """Apply one dense projection entry (plus its LoRA adapter if any).

    Dispatches on the entry's layout: a serving tree quantized by
    models/quantize.py carries {kernel_q: int8, scale: f32[out]} — the
    convert int8->bf16 fuses into the dot's operand read on TPU, so the
    GEMM moves half the HBM bytes and the per-out-channel scale applies
    after as a vector multiply. Training trees carry {kernel} and route
    through _cp_dense for the cp-local weight-grad schedule."""
    if "kernel_q" in entry:
        out = (x @ entry["kernel_q"].astype(x.dtype)) * entry[
            "scale"
        ].astype(x.dtype)
    elif "kernel_p4" in entry:
        from long_vita_tpu.ops.quant_matmul import w4_matmul

        out = w4_matmul(x, entry["kernel_p4"], entry["scale4"])
    else:
        out = _cp_dense(x, entry["kernel"], parallel)
    return _with_lora(entry, x, out, cfg)


def _manual_axes_kw(parallel: "ParallelConfig") -> dict:
    """axis_names kwarg for the nested compute shard_maps (see
    ParallelConfig.manual_axes): full-manual outside the pipeline,
    partial-manual over {dp, cp, tp} inside a pp stage body."""
    if parallel.manual_axes is None:
        return {}
    return {"axis_names": set(parallel.manual_axes)}


def _cp_dense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    parallel: Optional["ParallelConfig"],
) -> jnp.ndarray:
    """``x @ kernel`` with a cp-LOCAL weight gradient.

    Under cp training the activations are seq-sharded over the cp axis.
    The default VJP's weight-grad contraction (sum over tokens of
    x^T dy) makes GSPMD all-gather the seq-sharded activation over cp —
    at stage-4 scale that is a [1, 1M, H/tp] (1.34 GB bf16) gather PER
    LAYER in the backward scan, ~64 GB of ICI traffic per micro-step
    (PERF.md round-3 AOT inventory). The true contraction is
    cp-decomposable: each rank contracts its own token rows and the
    [in, out] partials psum over cp — dw bytes instead of activation
    bytes on the wire. Forward and dx are untouched (identical to the
    default VJP); only dw's schedule changes.
    """
    if (
        parallel is None
        or parallel.mesh.shape.get(parallel.axis_cp, 1) <= 1
        or x.ndim != 3
    ):
        return x @ kernel

    from jax.sharding import PartitionSpec as P

    @jax.custom_vjp
    def dense(x_, w_):
        return x_ @ w_

    def fwd(x_, w_):
        return x_ @ w_, (x_, w_)

    def bwd(res, dy):
        x_, w_ = res
        dx = dy @ w_.T

        def local_dw(xl, dyl):
            return jax.lax.psum(
                jnp.einsum("bsh,bso->ho", xl, dyl), parallel.axis_cp
            )

        # manual over cp ONLY: tp/dp stay GSPMD-auto inside, so the
        # tp-sharded hidden/intermediate dims are NOT forced replicated
        # at entry (a fully-manual map would all-gather them over tp)
        seq_spec = P(None, parallel.axis_cp, None)
        dw = jax.shard_map(
            local_dw, mesh=parallel.mesh,
            in_specs=(seq_spec, seq_spec), out_specs=P(),
            axis_names={parallel.axis_cp},
            check_vma=False,
        )(x_, dy)
        return dx, dw

    dense.defvjp(fwd, bwd)
    return dense(x, kernel)


def _cp_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray],
    parallel: "ParallelConfig",
):
    """Context-parallel attention over the cp axis via shard_map.

    cp_algo "ring": zigzag ring attention (ppermute KV rotation).
    cp_algo "ulysses": head-scatter all-to-all, contiguous seq shards.
    """
    from jax.sharding import PartitionSpec as P

    from long_vita_tpu.ops.ring_attention import ring_attention
    from long_vita_tpu.ops.ulysses import ulysses_attention

    spec = P(parallel.axis_dp, parallel.axis_cp, parallel.axis_tp, None)
    sspec = P(parallel.axis_dp, parallel.axis_cp)

    if parallel.mesh.shape.get(parallel.axis_cp, 1) == 1:
        # dp/tp-only mesh (72B tp8xfsdp8, stage-1/2 tp8): the shard_map is
        # still required (Mosaic kernels cannot lower under GSPMD), but
        # ring-with-one-rank would emit a degenerate collective-permute
        # pair per layer per direction (96-147 per step in the 72B AOT
        # artifacts) — call the local flash kernel directly instead.
        from long_vita_tpu.ops.flash_attention import flash_attention

        if segment_ids is None:
            body = lambda q_, k_, v_: flash_attention(q_, k_, v_)
            in_specs = (spec, spec, spec)
            args = (q, k, v)
        else:
            body = lambda q_, k_, v_, s_: flash_attention(
                q_, k_, v_, q_segment_ids=s_, kv_segment_ids=s_
            )
            in_specs = (spec, spec, spec, sspec)
            args = (q, k, v, segment_ids)
    elif parallel.cp_algo == "hybrid":
        from long_vita_tpu.ops.hybrid_cp import hybrid_attention

        if segment_ids is None:
            body = lambda q_, k_, v_: hybrid_attention(
                q_, k_, v_, parallel.axis_cp, parallel.cp_inner,
                window=parallel.cp_window,
            )
            in_specs = (spec, spec, spec)
            args = (q, k, v)
        else:
            body = lambda q_, k_, v_, s_: hybrid_attention(
                q_, k_, v_, parallel.axis_cp, parallel.cp_inner,
                q_segment_ids=s_, kv_segment_ids=s_,
                window=parallel.cp_window,
            )
            in_specs = (spec, spec, spec, sspec)
            args = (q, k, v, segment_ids)
    elif parallel.cp_algo == "ulysses":
        if segment_ids is None:
            body = lambda q_, k_, v_: ulysses_attention(
                q_, k_, v_, parallel.axis_cp
            )
            in_specs = (spec, spec, spec)
            args = (q, k, v)
        else:
            body = lambda q_, k_, v_, s_: ulysses_attention(
                q_, k_, v_, parallel.axis_cp,
                q_segment_ids=s_, kv_segment_ids=s_,
            )
            in_specs = (spec, spec, spec, sspec)
            args = (q, k, v, segment_ids)
    elif segment_ids is None:
        body = lambda q_, k_, v_: ring_attention(
            q_, k_, v_, parallel.axis_cp, False, 1, None, None,
            parallel.cp_window,
        )
        in_specs = (spec, spec, spec)
        args = (q, k, v)
    else:
        body = lambda q_, k_, v_, s_: ring_attention(
            q_, k_, v_, parallel.axis_cp, True, 1, s_, s_,
            parallel.cp_window,
        )
        in_specs = (spec, spec, spec, sspec)
        args = (q, k, v, segment_ids)

    # check_vma=False: the bodies contain pallas_calls whose out_shapes
    # carry no varying-mesh-axes annotation (TPU compile path)
    fn = jax.shard_map(
        body, mesh=parallel.mesh, in_specs=in_specs, out_specs=spec,
        check_vma=False, **_manual_axes_kw(parallel),
    )
    return fn(*args)


def _cp_cached_update_attend_sharded(
    q, ck_full, cv_full, ks_full, vs_full, k_new, v_new, k_sc, v_sc,
    layer_idx, cache_len, q_offset, parallel: "ParallelConfig",
):
    """Fused shard-local cache write + cached attention over the cp axis.

    Two pathologies this shard_map avoids (ops/cp_cache_attention.py):
      - a pallas flash call on a cp-sharded cache would make GSPMD
        all-gather the whole cache (196 GB at 1M tokens for 14B); partials
        merge with an LSE-weighted psum instead;
      - a dynamic_update_slice at a TRACED offset into the cp-sharded slot
        dim also all-gathers the cache (the partitioner can't place the
        write); inside shard_map each rank writes its own s rows.

    Chunked prefill (Sq > 1): q rides in/out SEQUENCE-sharded over cp so the
    projections/MLP around this call run on 1/cp of the chunk per rank (TTFT
    scales with cp, not just tp). Decode (Sq = 1) keeps q replicated.
    """
    from jax.sharding import PartitionSpec as P

    from long_vita_tpu.ops.cp_cache_attention import cp_cache_update_attend

    cp = parallel.mesh.shape.get(parallel.axis_cp, 1)
    q_sharded = q.shape[1] > 1 and q.shape[1] % cp == 0
    qspec = P(
        parallel.axis_dp,
        parallel.axis_cp if q_sharded else None,
        parallel.axis_tp,
        None,
    )
    # [L, B, Smax, Hkv, D] stacked caches: slots over cp, kv heads over tp
    cspec = P(None, parallel.axis_dp, parallel.axis_cp, parallel.axis_tp, None)
    # the chunk's new kv rows [B, s, Hkv, D]: replicated over cp (s rows —
    # a few MB — vs gathering the cache)
    uspec = P(parallel.axis_dp, None, parallel.axis_tp, None)
    quant = ks_full is not None

    def body(q_, ck_, cv_, ks_, vs_, kn_, vn_, ksc_, vsc_, li, cl, qo):
        return cp_cache_update_attend(
            q_, ck_, cv_, kn_, vn_, ks_, vs_, ksc_, vsc_, li, cl, qo,
            parallel.axis_cp, q_sharded=q_sharded,
        )

    if quant:
        in_specs = (qspec, cspec, cspec, cspec, cspec, uspec, uspec,
                    uspec, uspec, P(), P(), P())
        out_specs = (qspec, cspec, cspec, cspec, cspec)
        args = (q, ck_full, cv_full, ks_full, vs_full, k_new, v_new,
                k_sc, v_sc, layer_idx, cache_len, q_offset)
    else:
        def body(q_, ck_, cv_, kn_, vn_, li, cl, qo):  # noqa: F811
            out, ck2, cv2, _, _ = cp_cache_update_attend(
                q_, ck_, cv_, kn_, vn_, None, None, None, None, li, cl, qo,
                parallel.axis_cp, q_sharded=q_sharded,
            )
            return out, ck2, cv2

        in_specs = (qspec, cspec, cspec, uspec, uspec, P(), P(), P())
        out_specs = (qspec, cspec, cspec)
        args = (q, ck_full, cv_full, k_new, v_new,
                layer_idx, cache_len, q_offset)

    fn = jax.shard_map(
        body, mesh=parallel.mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False, **_manual_axes_kw(parallel),
    )
    res = fn(*args)
    if quant:
        return res
    out, ck2, cv2 = res
    return out, ck2, cv2, None, None


def _decode_alt() -> bool:
    """A/B knob for the single-token cache-attention formulation
    (ops/attention.py decode_attention vs the general grouped einsum) —
    benchmarks/trace_decode.py races the two on hardware."""
    return os.environ.get("LVT_DECODE_ATT", "") == "alt"


def _attention_block(
    layer: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: TextConfig,
    cache_kv: Optional[tuple[jnp.ndarray, jnp.ndarray]],
    cache_len: Optional[jnp.ndarray],
    position_ids: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray],
    attn_impl: str,
    parallel: Optional["ParallelConfig"] = None,
):
    b, s, h = x.shape
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = _proj(layer["q_proj"], x, cfg, parallel) + layer["q_proj"]["bias"]
    k = _proj(layer["k_proj"], x, cfg, parallel) + layer["k_proj"]["bias"]
    v = _proj(layer["v_proj"], x, cfg, parallel) + layer["v_proj"]["bias"]
    q = q.reshape(b, s, hq, d)
    k = k.reshape(b, s, hkv, d)
    v = v.reshape(b, s, hkv, d)
    q, k = apply_rope(q, k, cos, sin)

    new_cache_kv = None
    if cache_kv is not None:
        # Full stacked caches [L, B, Smax, Hkv, D] ride the layer-scan CARRY
        # and only the new [s]-token slice is written — XLA aliases the
        # carry in place, so a decode step moves O(read) HBM, not a full
        # cache copy per token (scan ys would be fresh buffers).
        ck_full, cv_full, ks_full, vs_full, layer_idx = cache_kv
        quant = ks_full is not None
        if quant:
            k_w, k_sc = quantize_kv(k)
            v_w, v_sc = quantize_kv(v)
        else:
            k_w, v_w = k.astype(ck_full.dtype), v.astype(cv_full.dtype)
            k_sc = v_sc = None

        # cp-sharded cache: the write AND the attention must both happen
        # shard-locally (see _cp_cached_update_attend_sharded) — including
        # int8 prefill chunks (the quant flash kernel runs on the local
        # shard) and ragged batched decode (vector cache_len: each row at
        # its own frontier).
        if parallel is not None:
            q_off = (
                position_ids[:, 0] if cache_len.ndim == 1
                else position_ids[0, 0]
            )
            out, ck_full, cv_full, ks_full, vs_full = (
                _cp_cached_update_attend_sharded(
                    q, ck_full, cv_full, ks_full, vs_full, k_w, v_w,
                    k_sc, v_sc, layer_idx, cache_len, q_off,
                    parallel,
                )
            )
            new_cache_kv = (ck_full, cv_full, ks_full, vs_full)
        else:
            if cache_len.ndim == 1:
                # Ragged batched decode / batched speculative verify: each
                # row's tokens stay contiguously packed, so the s new
                # tokens scatter at that row's own frontier and the plain
                # causal mask (slot index vs per-row q position) excludes
                # the garbage beyond it.
                bidx = jnp.arange(b)

                def row_write(buf, new):
                    # rows past capacity keep stepping (engine masks their
                    # output to eos); their out-of-bounds writes drop
                    idx = cache_len[:, None] + jnp.arange(s)[None]  # [B, s]
                    return buf.at[layer_idx, bidx[:, None], idx].set(
                        new, mode="drop"
                    )

                if quant:
                    ks_full = row_write(ks_full, k_sc)
                    vs_full = row_write(vs_full, v_sc)
                ck_full = row_write(ck_full, k_w)
                cv_full = row_write(cv_full, v_w)
            else:
                if quant:
                    ks_full = jax.lax.dynamic_update_slice(
                        ks_full, k_sc[None], (layer_idx, 0, cache_len, 0, 0)
                    )
                    vs_full = jax.lax.dynamic_update_slice(
                        vs_full, v_sc[None], (layer_idx, 0, cache_len, 0, 0)
                    )
                ck_full = jax.lax.dynamic_update_slice(
                    ck_full, k_w[None], (layer_idx, 0, cache_len, 0, 0)
                )
                cv_full = jax.lax.dynamic_update_slice(
                    cv_full, v_w[None], (layer_idx, 0, cache_len, 0, 0)
                )
            new_cache_kv = (ck_full, cv_full, ks_full, vs_full)
            ck = jax.lax.dynamic_index_in_dim(ck_full, layer_idx, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cv_full, layer_idx, keepdims=False)
            if quant:
                ks = jax.lax.dynamic_index_in_dim(ks_full, layer_idx, keepdims=False)
                vs = jax.lax.dynamic_index_in_dim(vs_full, layer_idx, keepdims=False)
                if s > 1:
                    # prefill chunk: int8-fused flash — the cache is
                    # dequantized PER BLOCK in VMEM (a whole-slice dequant
                    # is a multi-GB HBM transient at 768K+)
                    from long_vita_tpu.ops.attention import (
                        quant_prefill_attention,
                    )

                    out = quant_prefill_attention(
                        q, ck, ks, cv, vs,
                        q_positions=position_ids,
                        kv_valid_len=jnp.broadcast_to(cache_len + s, (b,)),
                    )
                elif _decode_alt():
                    from long_vita_tpu.ops.attention import decode_attention

                    out = decode_attention(
                        q, ck, cv,
                        q_positions=position_ids,
                        kv_valid_len=jnp.broadcast_to(cache_len + s, (b,)),
                        k_scale=ks, v_scale=vs,
                    )
                else:
                    from long_vita_tpu.ops.attention import xla_attention_quant

                    out = xla_attention_quant(
                        q, ck, ks, cv, vs,
                        q_positions=position_ids,
                        kv_positions=jnp.broadcast_to(
                            jnp.arange(ck.shape[1]), (b, ck.shape[1])
                        ),
                        kv_valid_len=jnp.broadcast_to(cache_len + s, (b,)),
                    )
            elif s == 1 and _decode_alt():
                from long_vita_tpu.ops.attention import decode_attention

                out = decode_attention(
                    q, ck, cv,
                    q_positions=position_ids,
                    kv_valid_len=jnp.broadcast_to(cache_len + s, (b,)),
                )
            else:
                out = dot_product_attention(
                    q,
                    ck,
                    cv,
                    causal=True,
                    q_positions=position_ids,
                    kv_positions=jnp.broadcast_to(
                        jnp.arange(ck.shape[1]), (b, ck.shape[1])
                    ),
                    kv_valid_len=jnp.broadcast_to(cache_len + s, (b,)),
                    impl=attn_impl,
                )
    elif parallel is not None:
        out = _cp_attention_sharded(q, k, v, segment_ids, parallel)
    else:
        out = dot_product_attention(
            q,
            k,
            v,
            causal=True,
            q_positions=position_ids,
            kv_positions=position_ids,
            q_segment_ids=segment_ids,
            kv_segment_ids=segment_ids,
            impl=attn_impl,
        )

    flat = out.reshape(b, s, hq * d)
    out = _proj(layer["o_proj"], flat, cfg, parallel)
    return out, new_cache_kv


def _mlp_block(
    layer: Params,
    x: jnp.ndarray,
    cfg: Optional[TextConfig] = None,
    parallel: Optional["ParallelConfig"] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense SwiGLU, or the MoE MLP when the layer carries a router.

    -> (out, aux_loss). Expert parallelism rides the dp axis (the reference
    regenerates EP groups to coexist with CP, parallel_state.py:123-169;
    here experts shard over dp while cp/tp stay GSPMD-auto inside a
    partial-manual shard_map)."""
    if "router" in layer:
        return _moe_mlp_block(layer, x, cfg, parallel)
    gate = _proj(layer["gate_proj"], x, cfg, parallel)
    up = _proj(layer["up_proj"], x, cfg, parallel)
    act = jax.nn.silu(gate) * up
    out = _proj(layer["down_proj"], act, cfg, parallel)
    return out, jnp.zeros((), jnp.float32)


def _moe_mlp_block(
    layer: Params,
    x: jnp.ndarray,
    cfg: Optional[TextConfig],
    parallel: Optional["ParallelConfig"],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    from long_vita_tpu.ops.moe import moe_mlp

    top_k = cfg.moe_top_k if cfg is not None else 2
    cap = cfg.moe_capacity_factor if cfg is not None else 1.25
    moe_params = {"router": layer["router"], "experts": layer["experts"]}
    if parallel is not None:
        from jax.sharding import PartitionSpec as P

        dp = parallel.mesh.shape.get(parallel.axis_dp, 1)
        n_experts = layer["experts"]["gate"].shape[0]
        if dp > 1 and n_experts % dp == 0:
            def body(router_, gate_, up_, down_, x_):
                out, aux = moe_mlp(
                    {"router": {"kernel": router_},
                     "experts": {"gate": gate_, "up": up_, "down": down_}},
                    x_, top_k=top_k, capacity_factor=cap,
                    axis_name=parallel.axis_dp,
                )
                return out, jax.lax.pmean(aux, parallel.axis_dp)

            fn = jax.shard_map(
                body,
                mesh=parallel.mesh,
                in_specs=(
                    P(),                      # router: replicated over dp
                    P(parallel.axis_dp),      # experts: E over dp (EP)
                    P(parallel.axis_dp),
                    P(parallel.axis_dp),
                    P(parallel.axis_dp),      # tokens: batch over dp
                ),
                out_specs=(P(parallel.axis_dp), P()),
                axis_names={parallel.axis_dp},
            )
            return fn(
                layer["router"]["kernel"], layer["experts"]["gate"],
                layer["experts"]["up"], layer["experts"]["down"], x,
            )
    out, aux = moe_mlp(moe_params, x, top_k=top_k, capacity_factor=cap)
    return out, aux


def decoder_layer(
    layer: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: TextConfig,
    cache_kv,
    cache_len,
    position_ids,
    segment_ids,
    attn_impl: str,
    parallel: Optional[ParallelConfig] = None,
):
    attn_out, new_cache_kv = _attention_block(
        layer,
        rms_norm(x, layer["input_norm"], cfg.rms_norm_eps),
        cos,
        sin,
        cfg,
        cache_kv,
        cache_len,
        position_ids,
        segment_ids,
        attn_impl,
        parallel,
    )
    x = x + attn_out
    mlp_out, aux = _mlp_block(
        layer, rms_norm(x, layer["post_attn_norm"], cfg.rms_norm_eps),
        cfg, parallel,
    )
    x = x + mlp_out
    return x, new_cache_kv, aux


def qwen2_decoder(
    params: Params,
    inputs_embeds: jnp.ndarray,
    position_ids: jnp.ndarray,
    cfg: TextConfig,
    *,
    kv_cache: Optional[KVCache] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    parallel: Optional[ParallelConfig] = None,
    return_aux: bool = False,
):
    """Run the stacked decoder.

    inputs_embeds: [B, S, H]; position_ids: [B, S].
    Returns (final_norm(hidden) [B, S, H], updated kv_cache or None), plus
    the summed MoE aux loss as a third element when return_aux=True.
    """
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

    layers = params["layers"]
    aux0 = jnp.zeros((), jnp.float32)

    if kv_cache is not None:
        def body(carry, layer_and_idx):
            x, ck, cv, ks, vs, aux = carry
            layer, layer_idx = layer_and_idx
            x, (ck, cv, ks, vs), aux_l = decoder_layer(
                layer, x, cos, sin, cfg, (ck, cv, ks, vs, layer_idx),
                kv_cache.length, position_ids, segment_ids, attn_impl,
                parallel,
            )
            return (x, ck, cv, ks, vs, aux + aux_l), None

        (hidden, nk, nv, nks, nvs, aux), _ = jax.lax.scan(
            body,
            (inputs_embeds, kv_cache.k, kv_cache.v,
             kv_cache.k_scale, kv_cache.v_scale, aux0),
            (layers, jnp.arange(cfg.num_hidden_layers)),
        )
        new_cache = KVCache(
            k=nk, v=nv, length=kv_cache.length + inputs_embeds.shape[1],
            k_scale=nks, v_scale=nvs,
        )
    elif parallel is not None and parallel.pp_size > 1:
        hidden, aux = _pipelined_decoder(
            layers, inputs_embeds, cos, sin, cfg, position_ids,
            segment_ids, attn_impl, parallel, remat,
        )
        new_cache = None
    else:
        def body(carry, layer):
            x, aux = carry
            x, _, aux_l = decoder_layer(
                layer, x, cos, sin, cfg, None, None,
                position_ids, segment_ids, attn_impl, parallel,
            )
            return (x, aux + aux_l), None

        if remat:
            body = jax.checkpoint(body, policy=_remat_policy(remat))
        (hidden, aux), _ = jax.lax.scan(body, (inputs_embeds, aux0), layers)
        new_cache = None

    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    if return_aux:
        return hidden, new_cache, aux
    return hidden, new_cache


def _remat_policy(remat):
    """Rematerialization level (reference --recompute-* flags):
    True/"full" = recompute everything (stage-4: full recompute of 48
    layers); "dots" = keep matmul outputs (cheaper recompute for the
    shorter-context stages); "flash" = save ONLY the flash kernel's
    (o, lse) so the backward skips the attention-forward recompute —
    O(S*H*D) memory per layer for ~20% less attention compute, the
    flash-attn-2 backward contract the reference's full recompute loses;
    "vit" = full, PLUS chunk-level vision-tower remat in encode_images
    (per-ViT-layer activation saves drop to one tile chunk's pixels —
    the trainable-tower stage-2 regime at depth, and 4k-frame trainable
    towers, exceed one chip's HBM without it)."""
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if remat == "flash":
        return jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse"
        )
    return jax.checkpoint_policies.nothing_saveable


def _pipelined_decoder(
    layers, inputs_embeds, cos, sin, cfg, position_ids, segment_ids,
    attn_impl, parallel, remat,
):
    """GPipe pipeline over the pp axis (parallel/pipeline.py): layer stack
    sharded by stage, batch split into microbatches; cos/sin/positions
    travel the ring with the activations. Composes with TP via
    partial-manual shard_map (other mesh axes stay GSPMD-auto).

    With `parallel.virtual_pp = v > 1` the stack runs the INTERLEAVED
    schedule instead (Megatron core's virtual-pipeline equivalent,
    SURVEY.md §2b): v layer chunks per stage laid round-robin over the pp
    ring, shrinking the bubble to (pp-1)/v microbatch-times. The layer
    stack must arrive PRE-PERMUTED chunk-major
    (parallel/pipeline.py:permute_layer_stack — applied once at state
    init) so each stage's P(pp) shard holds its v chunks contiguously
    and the step moves zero weight bytes across stages.

    Constraint: CP and PP are mutually exclusive (the 72B TP8/PP8 recipes
    run cp=1)."""
    from jax.sharding import PartitionSpec as P

    from long_vita_tpu.parallel.pipeline import (
        pipeline_apply, pipeline_apply_interleaved,
    )

    pp = parallel.pp_size
    v = max(parallel.virtual_pp, 1)
    m = parallel.microbatches or pp
    b = inputs_embeds.shape[0]
    assert b % m == 0, f"batch {b} not divisible by microbatches {m}"

    def split(x):
        return x.reshape(m, b // m, *x.shape[1:]) if x is not None else None

    mb = {
        "x": split(inputs_embeds),
        "cos": split(cos),
        "sin": split(sin),
        "pos": split(position_ids),
        "aux": jnp.zeros((m,), jnp.float32),
    }
    if segment_ids is not None:
        mb["seg"] = split(segment_ids)

    def stage_body(stage_layers, t):
        # attention must still run inside a shard_map over the NON-pp axes
        # (Mosaic kernels cannot lower under GSPMD; the 72B tp8xpp8 AOT
        # compile fails without this). We are already manual over pp here,
        # so the nested shard_map uses the CONTEXT mesh (pp marked Manual)
        # — plain parallel.mesh would be rejected as a mesh mismatch.
        inner_par = dataclasses.replace(
            parallel, mesh=jax.sharding.get_abstract_mesh(),
            # manual over the non-pp axes ONLY: a full-manual nested
            # shard_map would claim its outputs replicated over pp and
            # its transpose would psum gradients across pipeline stages
            # (ParallelConfig.manual_axes)
            manual_axes=frozenset(
                {parallel.axis_dp, parallel.axis_cp, parallel.axis_tp}
            ),
        )

        def layer_body(carry, layer):
            x, aux = carry
            x, _, aux_l = decoder_layer(
                layer, x, t["cos"], t["sin"], cfg, None, None,
                t["pos"], t.get("seg"), attn_impl, inner_par,
            )
            return (x, aux + aux_l), None

        # per-layer remat for the GPipe path ONLY: the interleaved
        # schedule remats at the TICK level instead (remat_policy below)
        # so the traced-index chunk slice is recomputed in backward
        # rather than stacked per tick as a scan residual — nesting both
        # would replay each layer's forward twice
        if remat and v == 1:
            layer_body = jax.checkpoint(layer_body, policy=_remat_policy(remat))
        (x, aux), _ = jax.lax.scan(layer_body, (t["x"], t["aux"]), stage_layers)
        return {**t, "x": x, "aux": aux}

    if v > 1:
        n_layers = cfg.num_hidden_layers
        assert n_layers % (pp * v) == 0, (
            f"layers {n_layers} % (pp {pp} * virtual_pp {v}) != 0"
        )
        # PRE-PERMUTED storage contract: the layer stack must already be
        # chunk-major (parallel/pipeline.py:permute_layer_stack, applied
        # once by train_step.init_train_state). Permuting here — inside
        # the jitted step, on a P("pp")-sharded stack — made XLA
        # all-gather the entire weight stack per chip every step
        # (102.6 GB at 72B tp8xpp8 v2, benchmarks/aot_fullscale.py).
        apply = lambda ls, mb_: pipeline_apply_interleaved(
            ls, mb_, stage_body, parallel.axis_pp, virtual=v,
            remat_policy=_remat_policy(remat) if remat else None,
        )
    else:
        apply = lambda ls, mb_: pipeline_apply(
            ls, mb_, stage_body, parallel.axis_pp
        )
    layer_specs = jax.tree.map(lambda _: P(parallel.axis_pp), layers)
    mb_specs = jax.tree.map(lambda _: P(), mb)
    fn = jax.shard_map(
        apply,
        mesh=parallel.mesh,
        in_specs=(layer_specs, mb_specs),
        out_specs=mb_specs,
        axis_names={parallel.axis_pp},
        check_vma=False,
    )
    out = fn(layers, mb)
    hidden = out["x"].reshape(b, *inputs_embeds.shape[1:])
    # mean over microbatches: the Switch aux loss is token-count invariant
    # per call, so a sum would scale the coefficient m-fold vs the
    # non-pipelined path
    return hidden, out["aux"].mean()


def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed"]["embedding"][input_ids]


def embed_tokens_vp(
    params: Params, input_ids: jnp.ndarray, parallel: "ParallelConfig"
) -> jnp.ndarray:
    """Vocab-parallel embedding lookup + sequence-parallel reduce-scatter.

    The reference's VocabParallelEmbedding (tensor_parallel/layers.py:151)
    + Megatron SP: each tp rank looks up the ids that fall in its vocab
    shard (zeros elsewhere) and the partial rows psum-scatter over tp
    along the sequence — the [152k, H] table is never all-gathered (it was
    the largest collective in the stage-4 text artifact: a 778M-element /
    1.56 GB bf16 gather per micro-step). Output lands directly in the
    training SP layout [B@dp, S@(cp,tp), H]; values are bit-identical to
    the plain lookup (each position sums one real row + zeros).

    Requires S % (cp*tp) == 0 and B % dp == 0 — callers guard and fall
    back to embed_tokens."""
    from jax.sharding import PartitionSpec as P

    axis_tp, axis_cp, axis_dp = (
        parallel.axis_tp, parallel.axis_cp, parallel.axis_dp,
    )

    def body(table, ids):
        tp_i = jax.lax.axis_index(axis_tp)
        vloc = table.shape[0]
        loc = ids - tp_i * vloc
        ok = jnp.logical_and(loc >= 0, loc < vloc)
        rows = table[jnp.clip(loc, 0, vloc - 1)]
        rows = jnp.where(ok[..., None], rows, 0)
        return jax.lax.psum_scatter(
            rows, axis_tp, scatter_dimension=1, tiled=True
        )

    return jax.shard_map(
        body,
        mesh=parallel.mesh,
        in_specs=(P(axis_tp, None), P(axis_dp, axis_cp)),
        out_specs=P(axis_dp, (axis_cp, axis_tp), None),
        check_vma=False,
    )(params["embed"]["embedding"], input_ids)


def lm_head(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project hidden states to vocab logits (f32 for stable sampling/loss).

    Serving trees quantized by models/quantize.py carry an int8 head
    ({kernel_q, scale}): the [H, 152k] weight is the single largest
    per-token HBM read of a decode step, so halving its bytes moves the
    decode floor directly. The per-vocab-channel scale applies to the
    f32 logits after the GEMM (exactly x @ dequant(q), reordered)."""
    entry = params["lm_head"]
    if "kernel_p4" in entry:
        from long_vita_tpu.ops.quant_matmul import w4_matmul

        return w4_matmul(
            hidden, entry["kernel_p4"], entry["scale4"],
            out_dtype=jnp.float32,
        )
    if "kernel_q" in entry:
        return jnp.einsum(
            "...h,hv->...v",
            hidden,
            entry["kernel_q"].astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        ) * entry["scale"]
    return jnp.einsum(
        "...h,hv->...v",
        hidden,
        entry["kernel"],
        preferred_element_type=jnp.float32,
    )


def init_qwen2_params(
    rng: jax.Array, cfg: TextConfig, dtype=jnp.float32
) -> Params:
    """Random init (testing / from-scratch pretraining)."""
    l, h = cfg.num_hidden_layers, cfg.hidden_size
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    i = cfg.intermediate_size
    keys = iter(jax.random.split(rng, 16))

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    layers: Params = {
        "input_norm": jnp.ones((l, h), dtype),
        "post_attn_norm": jnp.ones((l, h), dtype),
        "q_proj": {
            "kernel": dense(next(keys), (l, h, hq * d)),
            "bias": jnp.zeros((l, hq * d), dtype),
        },
        "k_proj": {
            "kernel": dense(next(keys), (l, h, hkv * d)),
            "bias": jnp.zeros((l, hkv * d), dtype),
        },
        "v_proj": {
            "kernel": dense(next(keys), (l, h, hkv * d)),
            "bias": jnp.zeros((l, hkv * d), dtype),
        },
        "o_proj": {"kernel": dense(next(keys), (l, hq * d, h))},
    }
    if cfg.num_experts > 0:
        e = cfg.num_experts
        layers["router"] = {"kernel": dense(next(keys), (l, h, e))}
        layers["experts"] = {
            "gate": dense(next(keys), (l, e, h, i)),
            "up": dense(next(keys), (l, e, h, i)),
            "down": dense(next(keys), (l, e, i, h)),
        }
    else:
        layers["gate_proj"] = {"kernel": dense(next(keys), (l, h, i))}
        layers["up_proj"] = {"kernel": dense(next(keys), (l, h, i))}
        layers["down_proj"] = {"kernel": dense(next(keys), (l, i, h))}

    return {
        "embed": {"embedding": dense(next(keys), (cfg.vocab_size, h))},
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": {"kernel": dense(next(keys), (h, cfg.vocab_size))},
    }
