"""Ring attention with zigzag causal load balancing over the "cp" mesh axis.

TPU-native replacement for the reference's context-parallel attention stack
(SURVEY.md N3): MindSpeed `ringattn_context_parallel` kernels dispatched at
long_vita_megatron/core/transformer/dot_product_attention.py:337-342, the
zigzag batch slicing of training/utils.py:252-341, and the cp/cp2 NCCL
send-recv groups of core/parallel_state.py:278-312. Here the ring is a
single `jax.lax.ppermute` per step over the ICI ring, and the zigzag math
collapses to chunk-level flash calls:

With the sequence split into 2*cp chunks and rank r holding chunks
(r, 2cp-1-r) ("zigzag"), every (q-chunk, kv-chunk) pair at every ring step
is exactly one of: the causal DIAGONAL (q==kv chunk), a FULL attend
(q chunk after kv chunk), or SKIPPED — so the per-step work is one or two
flash kernel launches with LSE merging, and every rank does identical work
(the load balance the reference gets from megatron_cp_algo).

Backward is the standard dkv-rotation ring: (k, v, dkv-accumulators) travel
together; after cp rotations each rank holds exactly its own dk/dv. Pair
gradients are exact because they use the GLOBAL lse/delta (see
ops/attention_pair.py).

Must be called inside shard_map with the sequence dim sharded on `axis_name`
and already zigzag-permuted (parallel/zigzag.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from long_vita_tpu.ops.attention_pair import (
    merge_partials,
    pair_attn_bwd,
    pair_attn_fwd,
)
from long_vita_tpu.ops.flash_attention import NEG_INF


def _axis_size(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def _split2(x, axis=1):
    c = x.shape[axis] // 2
    lo = jax.lax.slice_in_dim(x, 0, c, axis=axis)
    hi = jax.lax.slice_in_dim(x, c, 2 * c, axis=axis)
    return lo, hi


def _rotate(x, axis_name: str, cp: int, inner: int = 1):
    """Ring-rotate over the outer groups of the axis.

    inner == 1: plain ring over all cp ranks. inner > 1 (hybrid CP): the
    axis is (groups x inner lanes); each lane rotates within its own ring
    of groups: rank r -> ((r//inner + 1) % (cp//inner)) * inner + r%inner.
    """
    if inner == 1:
        perm = [(i, (i + 1) % cp) for i in range(cp)]
    else:
        groups = cp // inner
        perm = [
            (r, ((r // inner + 1) % groups) * inner + r % inner)
            for r in range(cp)
        ]
    return jax.lax.ppermute(x, axis_name, perm)


def _pvary(x, ref):
    """Make a fresh array vary over every mesh axis `ref` varies over.

    Inside shard_map over (dp, cp, tp), scan carries must have the same
    varying-axis set as the values merged into them; fresh zeros/full arrays
    start unvarying."""
    try:
        want = tuple(sorted(set(jax.typeof(ref).vma) - set(jax.typeof(x).vma)))
    except Exception:
        return x
    return jax.lax.pvary(x, want) if want else x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "cp",
    have_segs: bool = False,
    inner_size: int = 1,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
):
    """Causal ring attention on zigzag-sharded chunks.

    q/k/v: local [B, 2C, H, D] — the concatenation of zigzag chunk pair
    (r, 2cp-1-r). segment ids: local [B, 2C]. Returns local [B, 2C, Hq, D].
    """
    o, _ = _ring_fwd(
        q, k, v, axis_name, have_segs, inner_size,
        q_segment_ids, kv_segment_ids,
    )
    return o


def _ring_fwd(q, k, v, axis_name, have_segs, inner_size, q_seg, kv_seg):
    cp = _axis_size(axis_name) // inner_size  # number of ring groups
    r = jax.lax.axis_index(axis_name) // inner_size  # ring-group index
    b, two_c, hq, d = q.shape
    c = two_c // 2

    q_a, q_b = _split2(q)  # chunks r and 2cp-1-r
    qs_a = qs_b = None
    if have_segs:
        qs_a, qs_b = _split2(q_seg)

    def seg_or_none(s):
        return s if have_segs else None

    # accumulators per local q chunk (pvary: carries vary across cp shards)
    o_a = _pvary(jnp.zeros_like(q_a), q)
    o_b = _pvary(jnp.zeros_like(q_b), q)
    lse_a = _pvary(jnp.full((b, hq, c), NEG_INF, jnp.float32), q)
    lse_b = _pvary(jnp.full((b, hq, c), NEG_INF, jnp.float32), q)

    kv = (
        k, v,
        kv_seg if have_segs
        else _pvary(jnp.zeros((b, two_c), jnp.int32), q),
    )

    def step_fn(carry, step):
        o_a, lse_a, o_b, lse_b, kv = carry
        kc, vc, sc = kv
        k_c, k_d = _split2(kc)
        v_c, v_d = _split2(vc)
        s_c, s_d = _split2(sc, axis=1)

        w = jax.lax.rem(r - step + cp, cp)  # owner of current kv
        wrap = w > r

        def diag_step(_):
            # step 0: q_a vs kv_c (diag), q_b vs kv_c (full), q_b vs kv_d (diag)
            oa, la = pair_attn_fwd(
                q_a, k_c, v_c, causal=True,
                q_segment_ids=seg_or_none(qs_a), kv_segment_ids=seg_or_none(s_c),
            )
            ob1, lb1 = pair_attn_fwd(
                q_b, k_c, v_c, causal=False,
                q_segment_ids=seg_or_none(qs_b), kv_segment_ids=seg_or_none(s_c),
            )
            ob2, lb2 = pair_attn_fwd(
                q_b, k_d, v_d, causal=True,
                q_segment_ids=seg_or_none(qs_b), kv_segment_ids=seg_or_none(s_d),
            )
            ob, lb = merge_partials(ob1, lb1, ob2, lb2)
            return oa, la, ob, lb

        def off_diag_step(_):
            # q_b vs kv_c always full; second pair depends on wrap:
            #   no wrap (w < r): q_a vs kv_c (full), accumulate into chunk a
            #   wrap (w > r):    q_b vs kv_d (full), accumulate into chunk b
            ob1, lb1 = pair_attn_fwd(
                q_b, k_c, v_c, causal=False,
                q_segment_ids=seg_or_none(qs_b), kv_segment_ids=seg_or_none(s_c),
            )
            q2 = jnp.where(wrap, q_b, q_a)
            k2 = jnp.where(wrap, k_d, k_c)
            v2 = jnp.where(wrap, v_d, v_c)
            if have_segs:
                qs2 = jnp.where(wrap, qs_b, qs_a)
                ss2 = jnp.where(wrap, s_d, s_c)
            else:
                qs2 = ss2 = None
            o2, l2 = pair_attn_fwd(
                q2, k2, v2, causal=False,
                q_segment_ids=qs2, kv_segment_ids=ss2,
            )
            # route (o2, l2) into a or b
            oa = jnp.where(wrap, jnp.zeros_like(o2), o2)
            la = jnp.where(wrap, NEG_INF, l2)
            ob2 = jnp.where(wrap, o2, jnp.zeros_like(o2))
            lb2 = jnp.where(wrap, l2, NEG_INF)
            ob, lb = merge_partials(ob1, lb1, ob2, lb2)
            return oa, la, ob, lb

        oa, la, ob, lb = jax.lax.cond(step == 0, diag_step, off_diag_step, None)

        o_a, lse_a = merge_partials(o_a, lse_a, oa, la)
        o_b, lse_b = merge_partials(o_b, lse_b, ob, lb)

        # Rotate unconditionally (cp rotations == identity): keeps the
        # collective out of lax.cond, which XLA requires to be uniform.
        kv = _rotate(kv, axis_name, cp * inner_size, inner_size)
        return (o_a, lse_a, o_b, lse_b, kv), None

    (o_a, lse_a, o_b, lse_b, _), _ = jax.lax.scan(
        step_fn, (o_a, lse_a, o_b, lse_b, kv), jnp.arange(cp)
    )

    o = jnp.concatenate([o_a, o_b], axis=1)
    lse = jnp.concatenate([lse_a, lse_b], axis=2)
    return o, lse


def _ring_vjp_fwd(q, k, v, axis_name, have_segs, inner_size, q_seg, kv_seg):
    o, lse = _ring_fwd(q, k, v, axis_name, have_segs, inner_size, q_seg, kv_seg)
    return o, (q, k, v, o, lse, q_seg, kv_seg)


def _ring_vjp_bwd(axis_name, have_segs, inner_size, res, g):
    q, k, v, o, lse, q_seg, kv_seg = res
    cp = _axis_size(axis_name) // inner_size
    r = jax.lax.axis_index(axis_name) // inner_size
    b, two_c, hq, d = q.shape
    c = two_c // 2

    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # [B, Hq, 2C]

    q_a, q_b = _split2(q)
    g_a, g_b = _split2(g)
    lse_a, lse_b = lse[..., :c], lse[..., c:]
    delta_a, delta_b = delta[..., :c], delta[..., c:]
    qs_a = qs_b = None
    if have_segs:
        qs_a, qs_b = _split2(q_seg)

    def seg_or_none(s):
        return s if have_segs else None

    dq = _pvary(jnp.zeros(q.shape, jnp.float32), q)
    # (k, v, seg, dk, dv) travel together around the ring.
    kv = (
        k, v,
        kv_seg if have_segs
        else _pvary(jnp.zeros((b, two_c), jnp.int32), q),
        _pvary(jnp.zeros(k.shape, jnp.float32), q),
        _pvary(jnp.zeros(v.shape, jnp.float32), q),
    )

    def step_fn(carry, step):
        dq, kv = carry
        kc, vc, sc, dkc, dvc = kv
        k_c, k_d = _split2(kc)
        v_c, v_d = _split2(vc)
        s_c, s_d = _split2(sc)

        w = jax.lax.rem(r - step + cp, cp)
        wrap = w > r

        def diag_step(_):
            dqa, dkc1, dvc1 = pair_attn_bwd(
                q_a, k_c, v_c, g_a, lse_a, delta_a, causal=True,
                q_segment_ids=seg_or_none(qs_a), kv_segment_ids=seg_or_none(s_c),
            )
            dqb1, dkc2, dvc2 = pair_attn_bwd(
                q_b, k_c, v_c, g_b, lse_b, delta_b, causal=False,
                q_segment_ids=seg_or_none(qs_b), kv_segment_ids=seg_or_none(s_c),
            )
            dqb2, dkd, dvd = pair_attn_bwd(
                q_b, k_d, v_d, g_b, lse_b, delta_b, causal=True,
                q_segment_ids=seg_or_none(qs_b), kv_segment_ids=seg_or_none(s_d),
            )
            dqa_f = dqa.astype(jnp.float32)
            dqb_f = (dqb1 + dqb2).astype(jnp.float32)
            dk_new = jnp.concatenate(
                [(dkc1 + dkc2).astype(jnp.float32), dkd.astype(jnp.float32)],
                axis=1,
            )
            dv_new = jnp.concatenate(
                [(dvc1 + dvc2).astype(jnp.float32), dvd.astype(jnp.float32)],
                axis=1,
            )
            return dqa_f, dqb_f, dk_new, dv_new

        def off_diag_step(_):
            dqb1, dkc1, dvc1 = pair_attn_bwd(
                q_b, k_c, v_c, g_b, lse_b, delta_b, causal=False,
                q_segment_ids=seg_or_none(qs_b), kv_segment_ids=seg_or_none(s_c),
            )
            q2 = jnp.where(wrap, q_b, q_a)
            g2 = jnp.where(wrap, g_b, g_a)
            l2 = jnp.where(wrap, lse_b, lse_a)
            d2 = jnp.where(wrap, delta_b, delta_a)
            k2 = jnp.where(wrap, k_d, k_c)
            v2 = jnp.where(wrap, v_d, v_c)
            if have_segs:
                qs2 = jnp.where(wrap, qs_b, qs_a)
                ss2 = jnp.where(wrap, s_d, s_c)
            else:
                qs2 = ss2 = None
            dq2, dk2, dv2 = pair_attn_bwd(
                q2, k2, v2, g2, l2, d2, causal=False,
                q_segment_ids=qs2, kv_segment_ids=ss2,
            )
            dq2 = dq2.astype(jnp.float32)
            dk2 = dk2.astype(jnp.float32)
            dv2 = dv2.astype(jnp.float32)
            zero_q = jnp.zeros_like(dq2)
            zero_kv = jnp.zeros_like(dk2)
            dqa_f = jnp.where(wrap, zero_q, dq2)
            dqb_f = dqb1.astype(jnp.float32) + jnp.where(wrap, dq2, zero_q)
            dk_new = jnp.concatenate(
                [dkc1.astype(jnp.float32) + jnp.where(wrap, zero_kv, dk2),
                 jnp.where(wrap, dk2, zero_kv)],
                axis=1,
            )
            dv_new = jnp.concatenate(
                [dvc1.astype(jnp.float32) + jnp.where(wrap, zero_kv, dv2),
                 jnp.where(wrap, dv2, zero_kv)],
                axis=1,
            )
            return dqa_f, dqb_f, dk_new, dv_new

        dqa_f, dqb_f, dk_new, dv_new = jax.lax.cond(
            step == 0, diag_step, off_diag_step, None
        )

        dq = dq + jnp.concatenate([dqa_f, dqb_f], axis=1)
        kv = (kc, vc, sc, dkc + dk_new, dvc + dv_new)
        # Rotate every step (cp total): after the last rotation each dkv
        # accumulator lands back on the rank that owns its kv chunks.
        kv = _rotate(kv, axis_name, cp * inner_size, inner_size)
        return (dq, kv), None

    (dq, kv), _ = jax.lax.scan(step_fn, (dq, kv), jnp.arange(cp))
    dk = kv[3].astype(k.dtype)
    dv = kv[4].astype(v.dtype)
    return dq.astype(q.dtype), dk, dv, None, None


ring_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)
