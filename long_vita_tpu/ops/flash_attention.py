"""Pallas TPU flash attention (forward + backward, custom VJP).

TPU-native replacement for the reference's flash-attn 2 CUDA dependency
(SURVEY.md N2; consumed at dot_product_attention.py:294-394 and
long_vita/models/.../flash_attention.py:15). One kernel covers all three
reference routes:

  - causal LLM prefill (flash_attn_func causal)
  - non-causal ViT (seq==vision_seq_length branch)
  - packed varlen via segment ids (HF position_ids varlen path)

plus the pieces ring attention needs that the CUDA kernel lacks natively:
explicit q/kv position offsets (so a context-parallel shard computes exact
causal masks against remote KV chunks) and an LSE output for cross-step
softmax combination.

Design notes (see /opt/skills/guides/pallas_guide.md):
  - Kernels work on head-major [B, H, S, D] so the (S, D) block tail meets
    TPU tiling; the public wrapper accepts model-layout [B, S, H, D].
  - Grid (B, Hq, n_q, n_kv), innermost kv dim "arbitrary" (sequential);
    online-softmax state lives in VMEM scratch across kv steps.
  - Causal skipping: the k/v BlockSpec index_map clamps kv block indices
    past the diagonal to the diagonal block — consecutive grid steps that
    map to the same block elide the DMA, so no HBM bandwidth is spent on
    masked-out blocks; the compute is predicated off with pl.when.
  - GQA: q head h reads kv head h // group inside the index_map; the dk/dv
    backward accumulates the whole group in VMEM scratch (grid walks
    (kv head, kv block, group x q block)) so no per-q-head f32 intermediate
    is materialized at 1M tokens.
  - All softmax math in f32; p cast to v dtype for the MXU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0**30

# Tuned on v5e (benchmarks/flash_tuning.py, fwd_kernel_lab.py, bench.py):
# 1024x1024 wins end-to-end; the block grid around it (2048x512 /
# 1024x2048 / 512x1024) measures 70.7-103.5 TF/s vs 111.7 here
# (scan-chained, 16K/40h/D128). Round 5 promoted three lab variants into
# the forward kernel — cheap 1-D-iota masks, interior-block fastpath,
# lane-wide m/l scratch — lifting it from 107.6 to 111.7 TF/s at the
# bench shape (official splash-attention kernel: 106.0 at the same
# shape/blocks). 2048x1024 exceeds VMEM.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 1024
# Backward block caps (read at trace time). Swept on v5e at 16K/40h/d128:
# 512x512 -> 75.3, 512x1024 -> 84.2, 1024x512 -> 84.3 TFLOP/s (fwd+bwd);
# 1024x1024 exceeds VMEM (dk/dv accumulators + p/ds intermediates live).
# Keep caps powers of two so they divide any legal forward block size.
BWD_BLOCK_Q_CAP = 1024
BWD_BLOCK_KV_CAP = 512
# Fused one-pass backward: dq partials are materialized once per kv MAJOR
# block (splash-attention pattern) — the bigger the major block, the fewer
# dq partial copies, bounded by the f32 dk/dv accumulators in VMEM.
# Round-5 re-sweep in the donated 16K/4-layer train step (train_bwd_sweep):
# fused M4096 1344 ms (0.711 MFU) vs two-pass 1427 ms (0.670) — the fused
# kernel wins END-TO-END even though kernel-level scan-chained timing has
# two-pass 23% faster (57.2 vs 74.1 ms; splash shows the same inversion);
# inside the remat step the two-pass's extra k/v re-read lands on an
# HBM-saturated phase. M8192+ fails to compile (fused dk/dv VMEM scratch).
# bq 1024 bk 512 remain the best backward caps.
BWD_BLOCK_KV_MAJOR = 4096
# fused-backward dq-partials HBM budget: past this the two-pass kernels
# (O(1) dq memory) take over — e.g. single-chip 128K text-only training
FUSED_BWD_DQ_BYTES_CAP = 2 * 1024**3
_FUSED_BWD = True  # env LVT_FUSED_BWD=0 falls back to the two-pass kernels
_LANE = 128

import os as _os  # noqa: E402

if _os.environ.get("LVT_FUSED_BWD") == "0":
    _FUSED_BWD = False
# block-size env overrides for benchmarking sweeps
DEFAULT_BLOCK_Q = int(_os.environ.get("LVT_FWD_BQ", DEFAULT_BLOCK_Q))
DEFAULT_BLOCK_KV = int(_os.environ.get("LVT_FWD_BK", DEFAULT_BLOCK_KV))
BWD_BLOCK_Q_CAP = int(_os.environ.get("LVT_BWD_BQ", BWD_BLOCK_Q_CAP))
BWD_BLOCK_KV_CAP = int(_os.environ.get("LVT_BWD_BK", BWD_BLOCK_KV_CAP))
BWD_BLOCK_KV_MAJOR = int(
    _os.environ.get("LVT_BWD_MAJOR", BWD_BLOCK_KV_MAJOR)
)


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    from long_vita_tpu.ops._target import target_is_tpu

    return not target_is_tpu()


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _mask_block(
    q_off, k_off, k_len, iq, jk, block_q, block_kv, causal,
    qseg_ref, kseg_ref, *, skip_causal=False,
):
    """kv-length / causal / segment mask for a [BQ, BK] logit block.

    1-D iotas ([BQ,1] vs [1,BK]) broadcast-compared cost ~BQ+BK vector
    elements instead of 2*BQ*BK (fwd_kernel_lab.py "cheap-mask": +2%).
    skip_causal: the caller proved the block is strictly below the causal
    diagonal and inside kv_len — only the segment compare remains."""
    if skip_causal:
        if qseg_ref is None:
            return None
        return qseg_ref[0, 0, :][:, None] == kseg_ref[0, 0, :][None, :]
    kv_idx = jk * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_kv), 1
    )
    mask = kv_idx < k_len
    if causal:
        q_pos = q_off + iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        kv_pos = k_off + kv_idx
        mask = jnp.logical_and(mask, kv_pos <= q_pos)
    else:
        mask = jnp.broadcast_to(mask, (block_q, block_kv))
    if qseg_ref is not None:
        mask = jnp.logical_and(
            mask, qseg_ref[0, 0, :][:, None] == kseg_ref[0, 0, :][None, :]
        )
    return mask


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    # scalar prefetch
    qo_ref,  # (1,) q position offset
    ko_ref,  # (1,) kv position offset
    klen_ref,  # (1,) number of valid kv positions
    # inputs
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BK, D]
    v_ref,  # [1, 1, BK, D]
    qseg_ref,  # [1, 1, BQ] or None (middle dummy dim keeps the block's
    kseg_ref,  # [1, 1, BK] or None  last-two dims Pallas-legal at any B)
    # outputs
    o_ref,  # [1, 1, BQ, D]
    lse_ref,  # [1, 1, 1, BQ, 1]
    # scratch
    acc_ref,  # [BQ, D] f32
    m_ref,  # [BQ, 1] f32
    l_ref,  # [BQ, 1] f32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
):
    iq = pl.program_id(2)
    jk = pl.program_id(3)

    q_off = qo_ref[0]
    k_off = ko_ref[0]
    k_len = klen_ref[0]

    @pl.when(jk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Block-level validity: causal-skip blocks past the diagonal, and skip
    # blocks entirely beyond the valid kv length.
    q_blk_max = q_off + (iq + 1) * block_q - 1  # largest q position in block
    kv_blk_min = k_off + jk * block_kv  # smallest kv position in block
    kv_blk_max = kv_blk_min + block_kv - 1
    compute = jk * block_kv < k_len
    if causal:
        compute = jnp.logical_and(compute, kv_blk_min <= q_blk_max)
    # Interior blocks (strictly below the causal diagonal band and fully
    # inside kv_len) need no length/causal mask at all — splash-style
    # full/partial block separation (fwd_kernel_lab.py "fastpath": at 16K,
    # 120 of 136 computed blocks per head are interior; +2% with the
    # cheap-mask, +3.8% total vs the round-4 kernel).
    interior = (jk + 1) * block_kv <= k_len
    if causal:
        interior = jnp.logical_and(
            interior, kv_blk_max < q_off + iq * block_q
        )

    def _step(skip_mask: bool):
        q = q_ref[0, 0]  # [BQ, D]
        k = k_ref[0, 0]  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [BQ, BK]

        mask = _mask_block(
            q_off, k_off, k_len, iq, jk, block_q, block_kv, causal,
            qseg_ref, kseg_ref, skip_causal=skip_mask,
        )
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)

        # m/l scratch rides full [BQ, LANE] tiles ("wide-ml"): a [BQ, 1]
        # f32 column occupies the same (8,128) VMEM tile but its updates
        # relayout; broadcasting keeps everything lane-aligned.
        m_prev = m_ref[...]  # [BQ, LANE]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])  # [BQ, BK] f32

        l_cur = jnp.sum(p, axis=1, keepdims=True)
        l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
            l_cur, m_prev.shape
        )
        m_ref[...] = m_new

        v = v_ref[0, 0]  # [BK, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(jnp.logical_and(compute, interior))
    def _fast():
        _step(True)

    @pl.when(jnp.logical_and(compute, jnp.logical_not(interior)))
    def _slow():
        _step(False)

    @pl.when(jk == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(l_safe)
        lse = jnp.where(l == 0.0, NEG_INF, lse)
        lse_ref[0, 0, 0] = lse


def _fwd_kernel_noseg(qo, ko, klen, q_ref, k_ref, v_ref, o_ref, lse_ref,
                      acc, m, l, **kw):
    _fwd_kernel(qo, ko, klen, q_ref, k_ref, v_ref, None, None, o_ref,
                lse_ref, acc, m, l, **kw)


def _fwd_quant_kernel(
    qo_ref, ko_ref, klen_ref,
    q_ref,   # [1, 1, BQ, D] bf16
    k_ref,   # [1, 1, BK, D] int8
    v_ref,   # [1, 1, BK, D] int8
    ks_ref,  # [1, 1, 1, BK] f32 per-(token, head) scales as ROW vectors
    vs_ref,  #   (a trailing [BK, 1] layout tile-pads 128x on TPU — 3 GB
    o_ref, lse_ref,  # for 24 MB of scales at 768K)
    acc_ref, m_ref, l_ref,
    *, causal, sm_scale, block_q, block_kv, num_kv_blocks,
):
    """Flash forward against an int8 KV cache. The dequantization is
    per-ROW, so it folds into the surrounding math instead of scaling k/v
    elementwise (the xla_attention_quant trick, in-kernel): logits pick up
    the k scale AFTER the int8 dot, probs pick up the v scale BEFORE the
    int8 dot — the bf16 cache never materializes anywhere."""
    iq = pl.program_id(2)
    jk = pl.program_id(3)

    q_off = qo_ref[0]
    k_off = ko_ref[0]
    k_len = klen_ref[0]

    @pl.when(jk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_blk_max = q_off + (iq + 1) * block_q - 1
    kv_blk_min = k_off + jk * block_kv
    compute = jk * block_kv < k_len
    if causal:
        compute = jnp.logical_and(compute, kv_blk_min <= q_blk_max)
    # interior fastpath (see _fwd_kernel): blocks strictly below the causal
    # diagonal and inside kv_len skip the mask build + select entirely
    interior = (jk + 1) * block_kv <= k_len
    if causal:
        interior = jnp.logical_and(
            interior, kv_blk_min + block_kv - 1 < q_off + iq * block_q
        )

    def _step(skip_mask: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0].astype(q.dtype)  # exact cast, |v| <= 127
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = s * ks_ref[0, 0]  # [1, BK] row scales broadcast over q rows
        if not skip_mask:
            mask = _mask_block(
                q_off, k_off, k_len, iq, jk, block_q, block_kv, causal,
                None, None,
            )
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_new

        v = v_ref[0, 0].astype(q.dtype)
        pv = jax.lax.dot_general(
            (p * vs_ref[0, 0]).astype(v.dtype), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(jnp.logical_and(compute, interior))
    def _fast():
        _step(True)

    @pl.when(jnp.logical_and(compute, jnp.logical_not(interior)))
    def _slow():
        _step(False)

    @pl.when(jk == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse = m_ref[...] + jnp.log(l_safe)
        lse_ref[0, 0, 0] = jnp.where(l == 0.0, NEG_INF, lse)


def _fwd(
    q, k, v, q_offset, kv_offset, kv_len, q_segment_ids, kv_segment_ids,
    *, causal: bool, block_q: int, block_kv: int, sm_scale: float,
):
    """q: [B, Hq, Sq, D]; k/v: [B, Hkv, Skv, D] (head-major, padded)."""
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    group = hq // hkv
    n_q = sq // block_q
    n_kv = skv // block_kv

    have_segs = q_segment_ids is not None

    def q_index(b_, h, iq, jk, *_):
        return (b_, h, iq, 0)

    def _clamped_jk(iq, jk, qo, ko):
        if not causal:
            return jk
        # Clamp past-diagonal blocks to the diagonal block; consecutive
        # identical indices elide the DMA.
        q_blk_max = qo[0] + (iq + 1) * block_q - 1
        diag = jax.lax.div(q_blk_max - ko[0], block_kv)
        return jnp.clip(jnp.minimum(jk, diag), 0, n_kv - 1)

    def kv_index(b_, h, iq, jk, qo, ko, klen):
        return (b_, h // group, _clamped_jk(iq, jk, qo, ko), 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_index),
        pl.BlockSpec((1, 1, block_kv, d), kv_index),
        pl.BlockSpec((1, 1, block_kv, d), kv_index),
    ]
    inputs = [q, k, v]
    if have_segs:
        # [B, S] int blocks of (1, block) are illegal on TPU when B > 1
        # (second-minor must divide 8 or equal the dim); a dummy middle dim
        # makes the last-two block dims (1, block) vs array (1, S) — legal.
        in_specs += [
            pl.BlockSpec(
                (1, 1, block_q), lambda b_, h, iq, jk, *_: (b_, 0, iq)
            ),
            pl.BlockSpec(
                (1, 1, block_kv),
                lambda b_, h, iq, jk, qo, ko, klen: (
                    b_, 0, _clamped_jk(iq, jk, qo, ko)
                ),
            ),
        ]
        inputs += [q_segment_ids[:, None], kv_segment_ids[:, None]]
        kernel = functools.partial(
            _fwd_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, num_kv_blocks=n_kv,
        )
    else:
        kernel = functools.partial(
            _fwd_kernel_noseg, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, num_kv_blocks=n_kv,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hq, n_q, n_kv),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_index),
            pl.BlockSpec(
                (1, 1, 1, block_q, 1),
                lambda b_, h, iq, jk, *_: (b_, h, iq, 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
        ],
    )

    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, hq, n_q, block_q, 1), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * sq * skv * d * (0.5 if causal else 1.0)),
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * hq * sq * skv,
        ),
    )(q_offset, kv_offset, kv_len, *inputs)
    return o, lse.reshape(b, hq, sq)


# ---------------------------------------------------------------------------
# Backward kernels (flash attention 2 style, recompute p from q/k + lse)
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    qo_ref, ko_ref, klen_ref,
    k_ref,  # [1, 1, BK, D]
    v_ref,
    q_ref,  # [1, 1, BQ, D]   (inner grid dim walks (group, q blocks))
    do_ref,
    lse_ref,  # [1, 1, 1, BQ, 1]
    delta_ref,  # [1, 1, 1, BQ, 1]
    qseg_ref, kseg_ref,
    dk_ref,  # [1, 1, BK, D] out
    dv_ref,
    dk_acc, dv_acc,
    *, causal, sm_scale, block_q, block_kv, num_q_blocks,
):
    # grid: (B, Hkv, n_kv, group * n_q) — dk/dv for one kv head accumulate
    # across all q heads of its GQA group without a per-q-head intermediate.
    jk = pl.program_id(2)
    t = pl.program_id(3)
    iq = jax.lax.rem(t, num_q_blocks)

    q_off = qo_ref[0]
    k_off = ko_ref[0]
    k_len = klen_ref[0]

    @pl.when(t == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kv_blk_min = k_off + jk * block_kv
    q_blk_max = q_off + (iq + 1) * block_q - 1
    compute = jk * block_kv < k_len
    if causal:
        compute = jnp.logical_and(compute, kv_blk_min <= q_blk_max)

    @pl.when(compute)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0]  # [BQ, 1]
        delta = delta_ref[0, 0, 0]  # [BQ, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [BQ, BK]
        mask = _mask_block(
            q_off, k_off, k_len, iq, jk, block_q, block_kv, causal,
            qseg_ref, kseg_ref,
        )
        p = jnp.exp(s - lse)
        p = jnp.where(mask, p, 0.0)

        # dv += p^T do
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp = do v^T ; ds = p * (dp - delta)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        # dk += ds^T q
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == pl.num_programs(3) - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    qo_ref, ko_ref, klen_ref,
    q_ref, do_ref, lse_ref, delta_ref,
    k_ref, v_ref,
    qseg_ref, kseg_ref,
    dq_ref,
    dq_acc,
    *, causal, sm_scale, block_q, block_kv, num_kv_blocks,
):
    iq = pl.program_id(2)
    jk = pl.program_id(3)

    q_off = qo_ref[0]
    k_off = ko_ref[0]
    k_len = klen_ref[0]

    @pl.when(jk == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    kv_blk_min = k_off + jk * block_kv
    q_blk_max = q_off + (iq + 1) * block_q - 1
    compute = jk * block_kv < k_len
    if causal:
        compute = jnp.logical_and(compute, kv_blk_min <= q_blk_max)

    @pl.when(compute)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0]  # [BQ, 1]
        delta = delta_ref[0, 0, 0]  # [BQ, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        mask = _mask_block(
            q_off, k_off, k_len, iq, jk, block_q, block_kv, causal,
            qseg_ref, kseg_ref,
        )
        p = jnp.exp(s - lse)
        p = jnp.where(mask, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jk == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_fused_kernel(
    qo_ref, ko_ref, klen_ref,
    k_ref,  # [1, 1, BKC, D] (compute granularity)
    v_ref,
    q_ref,  # [1, 1, BQ, D]
    do_ref,
    lse_ref,  # [1, 1, 1, BQ, 1]
    delta_ref,
    qseg_ref, kseg_ref,  # [1, 1, BQ] / [1, 1, BKC] or None
    dq_ref,  # [1, 1, 1, BQ, D] out (partials over kv-major blocks)
    dk_ref,  # [1, 1, BKM, D] out
    dv_ref,
    dq_acc,  # [BQ, D] f32
    dk_acc,  # [BKM, D] f32
    dv_acc,
    *, causal, sm_scale, block_q, block_kv, n_sub, num_q_blocks, group,
):
    """ONE pass over the logits per (q, kv) block pair: s/p/dp/ds are
    computed once and feed dv, dk AND dq (the two-pass split recomputes
    s and dp in the dq kernel — 2 of 8 backward matmul-units wasted).

    grid: (B, n_kv_major, Hq, n_q, n_sub) —
      - dk/dv accumulate in a kv-MAJOR-sized f32 scratch across the whole
        GQA group x q blocks x kv sub-blocks (out block index constant).
      - dq accumulates across the kv sub-blocks of one major block and is
        written as a PARTIAL (summed over major blocks outside the kernel,
        the splash-attention fused-backward pattern: accumulation across a
        non-innermost grid dim is not expressible as block revisits).
    """
    jkM = pl.program_id(1)
    h = pl.program_id(2)
    iq = pl.program_id(3)
    jks = pl.program_id(4)
    jk = jkM * n_sub + jks  # compute-granularity kv block index

    q_off = qo_ref[0]
    k_off = ko_ref[0]
    k_len = klen_ref[0]
    g_idx = jax.lax.rem(h, group)

    @pl.when(jnp.logical_and(
        g_idx == 0, jnp.logical_and(iq == 0, jks == 0)
    ))
    def _init_dkv():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(jks == 0)
    def _init_dq():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    kv_blk_min = k_off + jk * block_kv
    q_blk_max = q_off + (iq + 1) * block_q - 1
    compute = jk * block_kv < k_len
    if causal:
        compute = jnp.logical_and(compute, kv_blk_min <= q_blk_max)

    @pl.when(compute)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0]  # [BQ, 1]
        delta = delta_ref[0, 0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [BQ, BKC]
        mask = _mask_block(
            q_off, k_off, k_len, iq, jk, block_q, block_kv, causal,
            qseg_ref, kseg_ref,
        )
        p = jnp.exp(s - lse)
        p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale

        sub = pl.multiple_of(jks * block_kv, block_kv)
        dv_acc[pl.ds(sub, block_kv), :] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_acc[pl.ds(sub, block_kv), :] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jks == n_sub - 1)
    def _write_dq():
        dq_ref[0, 0, 0] = dq_acc[...].astype(dq_ref.dtype)

    @pl.when(jnp.logical_and(
        g_idx == group - 1,
        jnp.logical_and(iq == num_q_blocks - 1, jks == n_sub - 1),
    ))
    def _write_dkv():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_fused_impl(
    q, k, v, g, lse, delta, q_offset, kv_offset, kv_len, segs,
    causal, block_q, block_kv, true_head_dim,
):
    """Fused one-pass backward. Shapes as _bwd_impl; skv_pad must divide
    into kv-major blocks (the caller re-pads)."""
    b, hq, sq_pad, d_pad = q.shape
    hkv, skv_pad = k.shape[1], k.shape[2]
    group = hq // hkv
    n_q = sq_pad // block_q
    n_kv = skv_pad // block_kv
    # major block = largest n_sub dividing n_kv with n_sub*bk <= MAJOR cap
    n_sub = 1
    for cand in range(min(n_kv, BWD_BLOCK_KV_MAJOR // block_kv), 0, -1):
        if n_kv % cand == 0:
            n_sub = cand
            break
    n_kv_major = n_kv // n_sub
    block_kv_major = n_sub * block_kv
    sm_scale = 1.0 / (true_head_dim ** 0.5)

    lse5 = lse.reshape(b, hq, n_q, block_q, 1)
    delta5 = delta.reshape(b, hq, n_q, block_q, 1)
    g = g.astype(q.dtype)
    have_segs = segs[0] is not None

    def _clamped_jk(iq, jk, qo, ko):
        """Causal DMA elision: clamp past-diagonal kv blocks."""
        if not causal:
            return jk
        q_blk_max = qo[0] + (iq + 1) * block_q - 1
        diag = jax.lax.div(q_blk_max - ko[0], block_kv)
        return jnp.clip(jnp.minimum(jk, diag), 0, n_kv - 1)

    def _clamped_iq(jkM, iq, qo, ko):
        """Causal DMA elision: clamp q blocks above the kv-major start."""
        if not causal:
            return iq
        kv_blk_min = ko[0] + jkM * block_kv_major
        diag = jax.lax.div(kv_blk_min - qo[0], block_q)
        return jnp.clip(jnp.maximum(iq, diag), 0, n_q - 1)

    def kv_index(b_, jkM, h, iq, jks, qo, ko, klen):
        return (
            b_, h // group,
            _clamped_jk(iq, jkM * n_sub + jks, qo, ko), 0,
        )

    def q_index(b_, jkM, h, iq, jks, qo, ko, klen):
        return (b_, h, _clamped_iq(jkM, iq, qo, ko), 0)

    def lse_index(b_, jkM, h, iq, jks, qo, ko, klen):
        return (b_, h, _clamped_iq(jkM, iq, qo, ko), 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec((1, 1, block_q, d_pad), q_index),
        pl.BlockSpec((1, 1, block_q, d_pad), q_index),
        pl.BlockSpec((1, 1, 1, block_q, 1), lse_index),
        pl.BlockSpec((1, 1, 1, block_q, 1), lse_index),
    ]
    inputs = [k, v, q, g, lse5, delta5]
    if have_segs:
        in_specs += [
            pl.BlockSpec(
                (1, 1, block_q),
                lambda b_, jkM, h, iq, jks, qo, ko, klen: (
                    b_, 0, _clamped_iq(jkM, iq, qo, ko)
                ),
            ),
            pl.BlockSpec(
                (1, 1, block_kv),
                lambda b_, jkM, h, iq, jks, qo, ko, klen: (
                    b_, 0, _clamped_jk(iq, jkM * n_sub + jks, qo, ko)
                ),
            ),
        ]
        inputs += [segs[0][:, None], segs[1][:, None]]
        kernel = functools.partial(
            _bwd_fused_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, n_sub=n_sub,
            num_q_blocks=n_q, group=group,
        )
    else:
        def kernel(qo, ko, klen, k_ref, v_ref, q_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dk_ref, dv_ref, dqa, dka, dva):
            _bwd_fused_kernel(
                qo, ko, klen, k_ref, v_ref, q_ref, do_ref, lse_ref,
                delta_ref, None, None, dq_ref, dk_ref, dv_ref, dqa, dka, dva,
                causal=causal, sm_scale=sm_scale, block_q=block_q,
                block_kv=block_kv, n_sub=n_sub, num_q_blocks=n_q,
                group=group,
            )

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, n_kv_major, hq, n_q, n_sub),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, 1, block_q, d_pad),
                lambda b_, jkM, h, iq, jks, *_: (jkM, b_, h, iq, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv_major, d_pad),
                lambda b_, jkM, h, iq, jks, *_: (b_, h // group, jkM, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv_major, d_pad),
                lambda b_, jkM, h, iq, jks, *_: (b_, h // group, jkM, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_kv_major, d_pad), jnp.float32),
            pltpu.VMEM((block_kv_major, d_pad), jnp.float32),
        ],
    )
    dq_parts, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((n_kv_major, b, hq, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "arbitrary", "arbitrary", "arbitrary",
            ),
        ),
    )(q_offset, kv_offset, kv_len, *inputs)
    dq = dq_parts.astype(jnp.float32).sum(axis=0).astype(q.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom VJP core (head-major, padded shapes)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _flash_core(
    q, k, v, q_offset, kv_offset, kv_len, segs,
    causal, block_q, block_kv, true_head_dim,
):
    o, _ = _flash_core_fwd(
        q, k, v, q_offset, kv_offset, kv_len, segs,
        causal, block_q, block_kv, true_head_dim,
    )
    return o


def _flash_core_fwd(
    q, k, v, q_offset, kv_offset, kv_len, segs,
    causal, block_q, block_kv, true_head_dim,
):
    o, lse = _fwd(
        q, k, v, q_offset, kv_offset, kv_len, segs[0], segs[1],
        causal=causal, block_q=block_q, block_kv=block_kv,
        sm_scale=1.0 / (true_head_dim ** 0.5),
    )
    # Under jax.checkpoint with the "flash" policy (qwen2._remat_policy),
    # these tags keep (o, lse) saved so the backward NEVER re-runs the
    # forward kernel — what CUDA flash-attn-2 does natively, and what the
    # reference's Megatron full-recompute cannot express.
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, o, lse, q_offset, kv_offset, kv_len, segs)


def _flash_core_bwd(causal, block_q, block_kv, true_head_dim, res, g):
    q, k, v, o, lse, q_offset, kv_offset, kv_len, segs = res
    # delta = rowsum(do * o) (d padding contributes zeros)
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # [B, Hq, Sq_pad]
    # the backward holds ~3x the forward's live blocks (p, ds, dk/dv
    # accumulators); larger-than-512 blocks exceed v5e VMEM
    bq = min(block_q, BWD_BLOCK_Q_CAP)
    bk = min(block_kv, BWD_BLOCK_KV_CAP)
    # The forward padded seq lens to multiples of (block_q, block_kv); the
    # capped blocks need not divide those (e.g. 576-padded ViT vs bk=512),
    # and _bwd_impl floors the block count — an undivided tail would leave
    # dk/dv rows unwritten and drop their dq contribution. Re-pad to the
    # capped blocks: extra kv slots sit beyond kv_len (masked in-kernel);
    # extra q rows get do=0 and lse=+big so p underflows to exactly 0.
    sq_pad, skv_pad = q.shape[2], k.shape[2]
    eq = -sq_pad % bq
    ek = -skv_pad % bk
    if eq or ek:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, eq), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, eq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, ek), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, ek), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, eq)), constant_values=2.0**30)
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, eq)))
        if segs[0] is not None:
            segs = (
                jnp.pad(segs[0], ((0, 0), (0, eq)), constant_values=-1),
                jnp.pad(segs[1], ((0, 0), (0, ek)), constant_values=-2),
            )
    # The fused kernel materializes one dq partial per kv-major block; at
    # very long NON-cp sequences (ring/CP paths bound skv to chunk sizes)
    # those transient copies would exceed HBM — fall back to the O(1)-dq
    # two-pass kernels past the budget.
    use_fused = _FUSED_BWD and BWD_BLOCK_KV_MAJOR > 0
    if use_fused:
        n_kv_major = max(1, k.shape[2] // BWD_BLOCK_KV_MAJOR)
        dq_partial_bytes = n_kv_major * q.size * q.dtype.itemsize
        use_fused = dq_partial_bytes <= FUSED_BWD_DQ_BYTES_CAP
    impl = _bwd_fused_impl if use_fused else _bwd_impl
    dq, dk, dv = impl(
        q, k, v, g, lse, delta, q_offset, kv_offset, kv_len, segs,
        causal, bq, bk, true_head_dim,
    )
    if eq:
        dq = dq[:, :, :sq_pad]
    if ek:
        dk = dk[:, :, :skv_pad]
        dv = dv[:, :, :skv_pad]
    return dq, dk, dv, None, None, None, (None, None)


def _bwd_impl(
    q, k, v, g, lse, delta, q_offset, kv_offset, kv_len, segs,
    causal, block_q, block_kv, true_head_dim,
):
    """Flash backward on head-major padded arrays; lse/delta [B, Hq, Sq_pad]."""
    b, hq, sq_pad, d_pad = q.shape
    hkv, skv_pad = k.shape[1], k.shape[2]
    group = hq // hkv
    n_q = sq_pad // block_q
    n_kv = skv_pad // block_kv
    sm_scale = 1.0 / (true_head_dim ** 0.5)

    # TPU-tileable 5D layout for per-row stats: (B, Hq, n_q, BQ, 1)
    lse5 = lse.reshape(b, hq, n_q, block_q, 1)
    delta5 = delta.reshape(b, hq, n_q, block_q, 1)
    g = g.astype(q.dtype)

    have_segs = segs[0] is not None

    # ---- dk/dv: grid (B, Hkv, n_kv, group*n_q)
    def _clamped_iq(jk, t, qo, ko):
        """Causal: q blocks strictly above the diagonal contribute nothing;
        clamp their index to the diagonal block so consecutive identical
        indices elide the DMA (mirror of the forward's kv clamp)."""
        iq = jax.lax.rem(t, n_q)
        if not causal:
            return iq
        kv_blk_min = ko[0] + jk * block_kv
        diag = jax.lax.div(kv_blk_min - qo[0], block_q)
        return jnp.clip(jnp.maximum(iq, diag), 0, n_q - 1)

    def q_index(b_, h, jk, t, qo, ko, klen):
        return (b_, h * group + t // n_q, _clamped_iq(jk, t, qo, ko), 0)

    def kv_index(b_, h, jk, t, *_):
        return (b_, h, jk, 0)

    def lse_index(b_, h, jk, t, qo, ko, klen):
        return (b_, h * group + t // n_q, _clamped_iq(jk, t, qo, ko), 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec((1, 1, block_q, d_pad), q_index),
        pl.BlockSpec((1, 1, block_q, d_pad), q_index),
        pl.BlockSpec((1, 1, 1, block_q, 1), lse_index),
        pl.BlockSpec((1, 1, 1, block_q, 1), lse_index),
    ]
    inputs = [k, v, q, g, lse5, delta5]
    if have_segs:
        in_specs += [
            pl.BlockSpec(
                (1, 1, block_q),
                lambda b_, h, jk, t, qo, ko, klen: (
                    b_, 0, _clamped_iq(jk, t, qo, ko)
                ),
            ),
            pl.BlockSpec(
                (1, 1, block_kv), lambda b_, h, jk, t, *_: (b_, 0, jk)
            ),
        ]
        inputs += [segs[0][:, None], segs[1][:, None]]
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, num_q_blocks=n_q,
        )
    else:
        def dkv_kernel(qo, ko, klen, k_ref, v_ref, q_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, dka, dva):
            _bwd_dkv_kernel(
                qo, ko, klen, k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                None, None, dk_ref, dv_ref, dka, dva,
                causal=causal, sm_scale=sm_scale, block_q=block_q,
                block_kv=block_kv, num_q_blocks=n_q,
            )

    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hkv, n_kv, group * n_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
            pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=dkv_grid,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q_offset, kv_offset, kv_len, *inputs)

    # ---- dq: grid (B, Hq, n_q, n_kv)
    def q_index2(b_, h, iq, jk, *_):
        return (b_, h, iq, 0)

    def _clamped_jk(iq, jk, qo, ko):
        if not causal:
            return jk
        q_blk_max = qo[0] + (iq + 1) * block_q - 1
        diag = jax.lax.div(q_blk_max - ko[0], block_kv)
        return jnp.clip(jnp.minimum(jk, diag), 0, n_kv - 1)

    def kv_index2(b_, h, iq, jk, qo, ko, klen):
        return (b_, h // group, _clamped_jk(iq, jk, qo, ko), 0)

    in_specs2 = [
        pl.BlockSpec((1, 1, block_q, d_pad), q_index2),
        pl.BlockSpec((1, 1, block_q, d_pad), q_index2),
        pl.BlockSpec(
            (1, 1, 1, block_q, 1),
            lambda b_, h, iq, jk, *_: (b_, h, iq, 0, 0),
        ),
        pl.BlockSpec(
            (1, 1, 1, block_q, 1),
            lambda b_, h, iq, jk, *_: (b_, h, iq, 0, 0),
        ),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index2),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index2),
    ]
    inputs2 = [q, g, lse5, delta5, k, v]
    if have_segs:
        in_specs2 += [
            pl.BlockSpec(
                (1, 1, block_q), lambda b_, h, iq, jk, *_: (b_, 0, iq)
            ),
            pl.BlockSpec(
                (1, 1, block_kv),
                lambda b_, h, iq, jk, qo, ko, klen: (
                    b_, 0, _clamped_jk(iq, jk, qo, ko)
                ),
            ),
        ]
        inputs2 += [segs[0][:, None], segs[1][:, None]]
        dq_kernel = functools.partial(
            _bwd_dq_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, num_kv_blocks=n_kv,
        )
    else:
        def dq_kernel(qo, ko, klen, q_ref, do_ref, lse_ref, delta_ref,
                      k_ref, v_ref, dq_ref, dqa):
            _bwd_dq_kernel(
                qo, ko, klen, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                None, None, dq_ref, dqa,
                causal=causal, sm_scale=sm_scale, block_q=block_q,
                block_kv=block_kv, num_kv_blocks=n_kv,
            )

    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hq, n_q, n_kv),
        in_specs=in_specs2,
        out_specs=[pl.BlockSpec((1, 1, block_q, d_pad), q_index2)],
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
    )
    (dq,) = pl.pallas_call(
        dq_kernel,
        grid_spec=dq_grid,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q_offset, kv_offset, kv_len, *inputs2)

    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _bwd_pair_pallas(
    q, k, v, do, lse, delta, *, causal,
    q_segment_ids=None, kv_segment_ids=None,
    block_q: int = DEFAULT_BLOCK_Q, block_kv: int = DEFAULT_BLOCK_KV,
):
    """Pair-level backward for ring attention (model layout [B, S, H, D]).

    lse/delta are the GLOBAL softmax statistics [B, Hq, Sq] (f32), so the
    returned (dq, dk, dv) are exact partial gradients for this kv chunk.
    """
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    # short ragged sequences (ViT's 1025): mid-size blocks minimize padding
    # waste (1025 -> two 576 blocks instead of one 1152 block;
    # benchmarks/: 13.6 vs 5.6 TFLOP/s at the ViT shape). Aligned sizes
    # (2048-token prefill chunks) keep the large tuned blocks.
    if sq <= 2048 and _round_up(sq, 128) % block_q:
        block_q = min(block_q, 576)
    if skv <= 2048 and _round_up(skv, 128) % block_kv:
        block_kv = min(block_kv, 576)
    # same VMEM caps as _flash_core_bwd (1024x1024 bwd overflows on v5e)
    block_q = min(block_q, BWD_BLOCK_Q_CAP, _round_up(sq, 128))
    block_kv = min(block_kv, BWD_BLOCK_KV_CAP, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)

    qp, kp, vp, segs = _prepare(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv
    )
    gp = _prepare(do, k, v, None, None, block_q, block_kv)[0]
    # Padded q rows: lse=+big so p = exp(s - big) = 0 -> zero grads.
    pads = ((0, 0), (0, 0), (0, sq_pad - sq))
    lse_p = jnp.pad(lse, pads, constant_values=2.0**30)
    delta_p = jnp.pad(delta, pads)

    qo = jnp.zeros((1,), jnp.int32)
    ko = jnp.zeros((1,), jnp.int32)
    klen = jnp.asarray([skv], jnp.int32)

    use_fused = _FUSED_BWD and BWD_BLOCK_KV_MAJOR > 0
    if use_fused:
        n_kv_major = max(1, kp.shape[2] // BWD_BLOCK_KV_MAJOR)
        use_fused = (
            n_kv_major * qp.size * qp.dtype.itemsize <= FUSED_BWD_DQ_BYTES_CAP
        )
    impl = _bwd_fused_impl if use_fused else _bwd_impl
    dq, dk, dv = impl(
        qp, kp, vp, gp, lse_p, delta_p, qo, ko, klen, segs,
        causal, block_q, block_kv, d,
    )
    dq = jnp.transpose(dq, (0, 2, 1, 3))[:, :sq, :, :d]
    dk = jnp.transpose(dk, (0, 2, 1, 3))[:, :skv, :, :d]
    dv = jnp.transpose(dv, (0, 2, 1, 3))[:, :skv, :, :d]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API (model layout [B, S, H, D])
# ---------------------------------------------------------------------------


def _prepare(q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv):
    """Transpose to head-major, pad head_dim to lane width and seq lens to
    block multiples. Padded kv positions are masked by kv_len."""
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    # blocks always span the full head dim, so any d that tiles the MXU
    # sublanes works unpadded (64 for ViT); ragged d pads to the lane width
    d_pad = d if d % 64 == 0 else _round_up(d, _LANE)
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)

    def prep(x, s_target):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, S, D]
        pads = [(0, 0), (0, 0), (0, s_target - x.shape[2]), (0, d_pad - x.shape[3])]
        if any(p != (0, 0) for p in pads):
            x = jnp.pad(x, pads)
        return x

    qp, kp, vp = prep(q, sq_pad), prep(k, skv_pad), prep(v, skv_pad)
    segs = (None, None)
    if q_segment_ids is not None:
        qs = jnp.pad(q_segment_ids, ((0, 0), (0, sq_pad - sq)), constant_values=-1)
        ks = jnp.pad(kv_segment_ids, ((0, 0), (0, skv_pad - skv)), constant_values=-2)
        segs = (qs.astype(jnp.int32), ks.astype(jnp.int32))
    return qp, kp, vp, segs


def _short_nc_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, sm_scale
):
    """Single-pass non-causal attention for short sequences: the whole
    k/v rides VMEM per (batch, head) cell, scores never touch HBM, and
    softmax is one max/exp/sum pass (no online-accumulator bookkeeping).

    VPU-work diet (the measured cost at the ViT shape is the per-score
    VPU work, not the MXU matmuls — exp overlaps the MXU for free, the
    reductions don't): the kv-length mask is an additive bias row
    instead of an iota compare+select, and the softmax divide happens
    AFTER the pv matmul on [BQ, Dp] rows instead of on the [BQ, Sp]
    probability matrix. Measured 7.4 -> 5.0 ms at the 32-tile InternViT
    shape vs the streaming flash kernel (benchmarks/vit_throughput.py);
    the remaining gap to the 3.5 ms no-softmax floor is the max/sum
    lane reductions."""
    q = q_ref[0, 0]  # [BQ, Dp]
    k = k_ref[0, 0]  # [Sp, Dp]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    s = s + bias_ref[0, 0]  # [1, Sp]: 0 on valid kv, NEG_INF on padding
    m = jnp.max(s, axis=1, keepdims=True)
    v = v_ref[0, 0]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0, 0, 0] = m + jnp.log(jnp.maximum(l, 1e-30))


@jax.custom_vjp
def short_attention(
    q: jnp.ndarray,  # [B, S, Hq, D]
    k: jnp.ndarray,  # [B, S, Hkv, D]
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Non-causal attention for SHORT sequences (the ViT's 1025 tokens),
    differentiable: forward is the single-pass kernel; backward delegates
    to the streaming flash kernels (fwd-for-lse + fused bwd), so the
    trainable-ViT stages keep their Pallas backward while forward-only
    regimes (frozen-ViT stage-3/4 training, serving, eval) get the
    single-pass speedup."""
    return _short_attention_impl(q, k, v)


def _short_attention_fwd(q, k, v):
    o, lse = _short_attention_impl(q, k, v, return_lse=True)
    return o, (q, k, v, o, lse)


def _short_attention_bwd(res, g):
    """Backward via the streaming flash bwd kernels, fed the short
    kernel's own (o, lse) — no forward recompute (the flash-attn-2
    backward contract)."""
    q, k, v, o, lse = res
    b, s, hq, d = q.shape
    s_pad = _round_up(s, 128)
    d_pad = _round_up(d, _LANE)

    def hm(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                (0, d_pad - x.shape[3])),
        )

    lse_p = jnp.pad(
        lse, ((0, 0), (0, 0), (0, s_pad - s)), constant_values=2.0**30
    )
    zeros = jnp.asarray([0], jnp.int32)
    res_core = (
        hm(q), hm(k), hm(v), hm(o), lse_p,
        zeros, zeros, jnp.asarray([s], jnp.int32), (None, None),
    )
    dq, dk, dv, *_ = _flash_core_bwd(
        False, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_KV, d, res_core, hm(g)
    )
    trim = lambda x, h: jnp.transpose(x, (0, 2, 1, 3))[:, :s, :h, :d]
    hkv = k.shape[2]
    if hq != hkv:  # GQA: fold group grads back onto the kv heads
        group = hq // hkv
        dk = dk.reshape(b, hkv, group, s_pad, d_pad).sum(2) if dk.shape[1] == hq else dk
        dv = dv.reshape(b, hkv, group, s_pad, d_pad).sum(2) if dv.shape[1] == hq else dv
    return trim(dq, hq), trim(dk, hkv), trim(dv, hkv)


short_attention.defvjp(_short_attention_fwd, _short_attention_bwd)


def _short_attention_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int = 1152,
    return_lse: bool = False,
):
    """Non-causal attention for SHORT sequences (the ViT's 1025 tokens).

    The streaming flash kernel is mis-shaped here: its per-block online
    accumulators and kv-grid bookkeeping dominate at S~1K (measured 19-22
    TFLOP/s at the InternViT shape, benchmarks/vit_throughput.py). This
    kernel holds the whole padded k/v in VMEM per (b, head) grid cell and
    does one plain softmax.
    """
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    s_pad = _round_up(s, 128)
    block_q = min(block_q, s_pad)
    s_padq = _round_up(s, block_q)
    d_pad = _round_up(d, _LANE)

    def hm(x, pad_to):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, S, D]
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, pad_to - x.shape[2]),
                (0, d_pad - x.shape[3])),
        )

    qp = hm(q, s_padq)
    kp = hm(k, s_pad)
    vp = hm(v, s_pad)
    bias = jnp.where(
        jnp.arange(s_pad) < s, 0.0, NEG_INF
    ).astype(jnp.float32)[None, None, None, :]
    n_q = s_padq // block_q

    kernel = functools.partial(
        _short_nc_kernel, sm_scale=1.0 / (d ** 0.5)
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(b, hq, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b_, h, iq: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad),
                         lambda b_, h, iq: (b_, h // group, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad),
                         lambda b_, h, iq: (b_, h // group, 0, 0)),
            pl.BlockSpec((1, 1, 1, s_pad), lambda b_, h, iq: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b_, h, iq: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, 1, block_q, 1),
                         lambda b_, h, iq: (b_, h, iq, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct((b, hq, n_q, block_q, 1), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qp, kp, vp, bias)
    o = jnp.transpose(o, (0, 2, 1, 3))[:, :s, :, :d]
    if return_lse:
        return o, lse[..., 0].reshape(b, hq, s_padq)[:, :, :s]
    return o


def flash_attention_quant(
    q: jnp.ndarray,        # [B, Sq, Hq, D] bf16/f32
    k_q: jnp.ndarray,      # [B, Skv, Hkv, D] int8
    k_scale: jnp.ndarray,  # [B, Skv, Hkv, 1] f32
    v_q: jnp.ndarray,
    v_scale: jnp.ndarray,
    *,
    q_offset=0,
    kv_offset=0,
    kv_valid_len=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    return_lse: bool = False,
):
    """Causal flash attention against an int8 KV cache (chunked prefill).

    Forward-only (inference path); per-block VMEM dequantization — the
    bf16 cache never exists in HBM. No segment support (cache slots are
    positional). return_lse: also return the log-sum-exp [B, Hq, Sq] f32
    (NEG_INF where a row saw no valid kv) — the cp-sharded serving path
    merges per-shard partials with it (ops/cp_cache_attention.py)."""
    b, sq, hq, d = q.shape
    skv, hkv = k_q.shape[1], k_q.shape[2]
    group = hq // hkv
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)
    d_pad = _round_up(d, _LANE)

    def hm(x, s_pad, pad_val=0):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, S, last]
        return jnp.pad(
            x,
            ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
             (0, (d_pad - x.shape[3]) if x.shape[3] == d else 0)),
            constant_values=pad_val,
        )

    qp = hm(q, sq_pad)
    kp = hm(k_q, skv_pad)
    vp = hm(v_q, skv_pad)

    def hm_scale(x):  # [B, S, Hkv, 1] f32 -> [B, Hkv, 1, S_pad] row layout
        x = jnp.transpose(x[..., 0], (0, 2, 1))[:, :, None, :]
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, skv_pad - skv)))

    ksp = hm_scale(k_scale)
    vsp = hm_scale(v_scale)

    qo = jnp.asarray(q_offset, jnp.int32).reshape(1)
    ko = jnp.asarray(kv_offset, jnp.int32).reshape(1)
    klen = (
        jnp.asarray([skv], jnp.int32) if kv_valid_len is None
        else jnp.asarray(kv_valid_len, jnp.int32).reshape(-1)[:1]
    )

    n_q = sq_pad // block_q
    n_kv = skv_pad // block_kv

    def q_index(b_, h, iq, jk, *_):
        return (b_, h, iq, 0)

    def _clamped_jk(iq, jk, qo_, ko_):
        q_blk_max = qo_[0] + (iq + 1) * block_q - 1
        diag = jax.lax.div(q_blk_max - ko_[0], block_kv)
        return jnp.clip(jnp.minimum(jk, diag), 0, n_kv - 1)

    def kv_index(b_, h, iq, jk, qo_, ko_, klen_):
        return (b_, h // group, _clamped_jk(iq, jk, qo_, ko_), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad), q_index),
            pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
            pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
            pl.BlockSpec(
                (1, 1, 1, block_kv),
                lambda b_, h, iq, jk, qo_, ko_, klen_: (
                    b_, h // group, 0, _clamped_jk(iq, jk, qo_, ko_)
                ),
            ),
            pl.BlockSpec(
                (1, 1, 1, block_kv),
                lambda b_, h, iq, jk, qo_, ko_, klen_: (
                    b_, h // group, 0, _clamped_jk(iq, jk, qo_, ko_)
                ),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad), q_index),
            pl.BlockSpec(
                (1, 1, 1, block_q, 1),
                lambda b_, h, iq, jk, *_: (b_, h, iq, 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_quant_kernel, causal=True, sm_scale=1.0 / (d ** 0.5),
        block_q=block_q, block_kv=block_kv, num_kv_blocks=n_kv,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct((b, hq, n_q, block_q, 1), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary",
            ),
        ),
    )(qo, ko, klen, qp, kp, vp, ksp, vsp)
    o = jnp.transpose(o, (0, 2, 1, 3))[:, :sq, :, :d]
    if return_lse:
        return o, lse[..., 0].reshape(b, hq, sq_pad)[:, :, :sq]
    return o


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    q_offset=0,
    kv_offset=0,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    kv_valid_len=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    return_lse: bool = False,
):
    """Flash attention on TPU.

    q: [B, Sq, Hq, D]; k, v: [B, Skv, Hkv, D]. Output [B, Sq, Hq, D].
    Positions are assumed contiguous from the given offsets (for arbitrary
    per-token positions use the XLA path; ring attention always works on
    contiguous chunks so offsets suffice). If q_positions/kv_positions are
    given they must be arange + offset; the offset is taken from element 0.
    return_lse: also return the log-sum-exp [B, Hq, Sq] (f32) — needed for
    ring-attention accumulation. (The LSE path is forward-only.)
    """
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    # short ragged sequences (ViT's 1025): mid-size blocks minimize padding
    # waste (1025 -> two 576 blocks instead of one 1152 block;
    # benchmarks/: 13.6 vs 5.6 TFLOP/s at the ViT shape). Aligned sizes
    # (2048-token prefill chunks) keep the large tuned blocks.
    if sq <= 2048 and _round_up(sq, 128) % block_q:
        block_q = min(block_q, 576)
    if skv <= 2048 and _round_up(skv, 128) % block_kv:
        block_kv = min(block_kv, 576)
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(skv, 128))

    if q_positions is not None:
        q_offset = q_positions[0, 0]
    if kv_positions is not None:
        kv_offset = kv_positions[0, 0]

    qo = jnp.asarray(q_offset, jnp.int32).reshape(1)
    ko = jnp.asarray(kv_offset, jnp.int32).reshape(1)
    # kv_valid_len: number of real kv slots (KV-cache chunked prefill);
    # slots beyond it are masked inside the kernel.
    if kv_valid_len is None:
        klen = jnp.asarray([skv], jnp.int32)
    else:
        klen = jnp.asarray(kv_valid_len, jnp.int32).reshape(-1)[:1]

    qp, kp, vp, segs = _prepare(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv
    )

    if return_lse:
        o, lse = _fwd(
            qp, kp, vp, qo, ko, klen, segs[0], segs[1],
            causal=causal, block_q=block_q, block_kv=block_kv,
            sm_scale=1.0 / (d ** 0.5),
        )
        o = jnp.transpose(o, (0, 2, 1, 3))[:, :sq, :, :d]
        return o, lse[:, :, :sq]

    o = _flash_core(
        qp, kp, vp, qo, ko, klen, segs, causal, block_q, block_kv, d
    )
    return jnp.transpose(o, (0, 2, 1, 3))[:, :sq, :, :d]
