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

Double-ring windows (reference `--cp-window-size`,
parallel_state.py:379-472): with `window` = W ranks per inner ring, KV
rotates W-1 hops inside the window, then the whole window's start-state KV
jumps W hops to the next window. The forward issues that jump at the START
of each inner sweep (the buffer it moves is already final), so XLA's async
collective-permute can overlap the long-distance hop with the entire inner
sweep's compute — the same latency hiding the reference builds a second
NCCL comm for. The backward carries dKV with the KV, so it takes a uniform
schedule (inner hop, then one diagonal inner+window hop per sweep) that is
exactly identity after cp steps — each dKV accumulator lands back on its
owner with no fix-up permutation.

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
from long_vita_tpu.ops._target import target_is_tpu


def _overlap_collectives() -> bool:
    """Whether to let ring permutes float past unrelated compute/collectives.

    On TPU the compiler fixes ONE collective issue order at compile time and
    every core executes that same order, so a dangling async
    collective-permute (the double-ring window jump, the last discarded scan
    rotation) can never be joined in a different order by different cores —
    overlap is free latency hiding. On the CPU backend the thunk executor
    dynamically runs independent thunks concurrently PER DEVICE, so two
    unordered in-flight collectives can be joined in opposite orders by
    different device threads and deadlock the in-process rendezvous (40 s
    SIGABRT; observed on the 8-device virtual gate: window-jump
    collective-permute vs a later tp all-reduce, devices split 5/3). There
    is no XLA CPU flag to serialize the executor, so off-TPU we thread
    optimization_barrier data deps that impose a total order instead
    (verified to keep the TPU overlap by benchmarks/ring_overlap_check.py).
    """
    import os

    t = os.environ.get("LVT_RING_OVERLAP")
    if t is not None:
        return t != "0"
    return target_is_tpu()


def _axis_size(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def _split2(x, axis=1):
    c = x.shape[axis] // 2
    lo = jax.lax.slice_in_dim(x, 0, c, axis=axis)
    hi = jax.lax.slice_in_dim(x, c, 2 * c, axis=axis)
    return lo, hi


def _rotate_groups(x, axis_name: str, cp_total: int, inner: int, dest_fn):
    """ppermute over the ring GROUPS of the axis (inner lanes ride along:
    hybrid CP keeps `inner` Ulysses lanes per ring group)."""
    groups = cp_total // inner
    perm = [
        (g * inner + lane, dest_fn(g) * inner + lane)
        for g in range(groups)
        for lane in range(inner)
    ]
    return jax.lax.ppermute(x, axis_name, perm)


def _rotate(x, axis_name: str, cp: int, inner: int = 1):
    """Plain ring-rotate: group g -> g+1 (mod ring size)."""
    groups = cp // inner
    return _rotate_groups(
        x, axis_name, cp, inner, lambda g: (g + 1) % groups
    )


def _rotate_inner_window(x, axis_name, cp, inner, window):
    """Rotate within each window of `window` ring groups."""
    return _rotate_groups(
        x, axis_name, cp, inner,
        lambda g: (g // window) * window + (g % window + 1) % window,
    )


def _rotate_window_jump(x, axis_name, cp, inner, window):
    """Jump a whole window ahead (same position within the window)."""
    n_win = (cp // inner) // window
    return _rotate_groups(
        x, axis_name, cp, inner,
        lambda g: ((g // window + 1) % n_win) * window + g % window,
    )


def _rotate_diagonal(x, axis_name, cp, inner, window):
    """window+1, inner+1 in one hop — the backward's sweep-end rotation
    (uniform schedule: cp such steps compose to the identity)."""
    n_win = (cp // inner) // window
    return _rotate_groups(
        x, axis_name, cp, inner,
        lambda g: ((g // window + 1) % n_win) * window
        + (g % window + 1) % window,
    )


def _pvary(x, ref):
    """Make a fresh array vary over every mesh axis `ref` varies over.

    Inside shard_map over (dp, cp, tp), scan carries must have the same
    varying-axis set as the values merged into them; fresh zeros/full arrays
    start unvarying."""
    try:
        want = tuple(sorted(set(jax.typeof(ref).vma) - set(jax.typeof(x).vma)))
    except Exception:
        return x
    return jax.lax.pcast(x, want, to="varying") if want else x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 8))
def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "cp",
    have_segs: bool = False,
    inner_size: int = 1,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    window: int = 0,
):
    """Causal ring attention on zigzag-sharded chunks.

    q/k/v: local [B, 2C, H, D] — the concatenation of zigzag chunk pair
    (r, 2cp-1-r). segment ids: local [B, 2C]. Returns local [B, 2C, Hq, D].
    window: ranks per double-ring inner window (0 / ring size = plain ring).
    """
    o, _ = _ring_fwd(
        q, k, v, axis_name, have_segs, inner_size,
        q_segment_ids, kv_segment_ids, window,
    )
    return o


def _segments_overlap(qs, ks):
    """True when ANY batch row's q segment range intersects the kv range.

    The TPU-native answer to the reference's adaptive CP
    (dot_product_attention.py:76-78, --adaptive-cp-* flags): packed ragged
    masks make many (q-chunk, kv-chunk) ring pairs entirely cross-segment;
    those pair kernels are skipped under lax.cond — exact (the skipped pair
    contributes nothing) and data-dependent, with no host-side scheduling
    pass. Segment ids are non-decreasing within a chunk stream, so min/max
    ranges capture membership."""
    q_lo = jnp.min(qs, axis=1)
    q_hi = jnp.max(qs, axis=1)
    k_lo = jnp.min(ks, axis=1)
    k_hi = jnp.max(ks, axis=1)
    row = jnp.logical_and(k_lo <= q_hi, q_lo <= k_hi)
    return jnp.any(row)


def _guarded_pair_fwd(q, k, v, causal, qs, ks):
    """pair_attn_fwd, elided when no segment ranges intersect."""
    if qs is None:
        return pair_attn_fwd(q, k, v, causal=causal)

    def yes(_):
        return pair_attn_fwd(
            q, k, v, causal=causal, q_segment_ids=qs, kv_segment_ids=ks
        )

    def no(_):
        # derive the empty partial FROM both inputs so the varying-axis
        # sets match the compute branch exactly (shard_map vma typing)
        zero = (jnp.sum(q) * jnp.sum(k) * 0).astype(jnp.float32)
        o0 = q * 0
        l0 = jnp.transpose(
            jnp.sum(q * 0, axis=-1).astype(jnp.float32), (0, 2, 1)
        ) + zero + NEG_INF
        return o0 + zero.astype(q.dtype), l0

    return jax.lax.cond(_segments_overlap(qs, ks), yes, no, None)


def _fwd_compute(q_a, q_b, qs_a, qs_b, kv, w, r, is_diag, have_segs):
    """One ring step's attention work given the kv owner's group index w.

    Returns per-chunk partials (oa, la, ob, lb) to merge into accumulators.
    """
    kc, vc, sc = kv
    k_c, k_d = _split2(kc)
    v_c, v_d = _split2(vc)
    s_c, s_d = _split2(sc, axis=1)
    wrap = w > r

    def seg_or_none(s):
        return s if have_segs else None

    def diag_step(_):
        # q_a vs kv_c (diag), q_b vs kv_c (full), q_b vs kv_d (diag)
        oa, la = _guarded_pair_fwd(
            q_a, k_c, v_c, True, seg_or_none(qs_a), seg_or_none(s_c)
        )
        ob1, lb1 = _guarded_pair_fwd(
            q_b, k_c, v_c, False, seg_or_none(qs_b), seg_or_none(s_c)
        )
        ob2, lb2 = _guarded_pair_fwd(
            q_b, k_d, v_d, True, seg_or_none(qs_b), seg_or_none(s_d)
        )
        ob, lb = merge_partials(ob1, lb1, ob2, lb2)
        return oa, la, ob, lb

    def off_diag_step(_):
        # q_b vs kv_c always full; second pair depends on wrap:
        #   no wrap (w < r): q_a vs kv_c (full), accumulate into chunk a
        #   wrap (w > r):    q_b vs kv_d (full), accumulate into chunk b
        ob1, lb1 = _guarded_pair_fwd(
            q_b, k_c, v_c, False, seg_or_none(qs_b), seg_or_none(s_c)
        )
        q2 = jnp.where(wrap, q_b, q_a)
        k2 = jnp.where(wrap, k_d, k_c)
        v2 = jnp.where(wrap, v_d, v_c)
        if have_segs:
            qs2 = jnp.where(wrap, qs_b, qs_a)
            ss2 = jnp.where(wrap, s_d, s_c)
        else:
            qs2 = ss2 = None
        o2, l2 = _guarded_pair_fwd(q2, k2, v2, False, qs2, ss2)
        # route (o2, l2) into a or b
        oa = jnp.where(wrap, jnp.zeros_like(o2), o2)
        la = jnp.where(wrap, NEG_INF, l2)
        ob2 = jnp.where(wrap, o2, jnp.zeros_like(o2))
        lb2 = jnp.where(wrap, l2, NEG_INF)
        ob, lb = merge_partials(ob1, lb1, ob2, lb2)
        return oa, la, ob, lb

    return jax.lax.cond(is_diag, diag_step, off_diag_step, None)


def _ring_fwd(q, k, v, axis_name, have_segs, inner_size, q_seg, kv_seg,
              window=0):
    cp = _axis_size(axis_name) // inner_size  # number of ring groups
    r = jax.lax.axis_index(axis_name) // inner_size  # ring-group index
    b, two_c, hq, d = q.shape
    c = two_c // 2

    win = window if window and 0 < window < cp else cp
    assert cp % win == 0, f"window {win} must divide ring size {cp}"
    n_win = cp // win

    q_a, q_b = _split2(q)  # chunks r and 2cp-1-r
    qs_a = qs_b = None
    if have_segs:
        qs_a, qs_b = _split2(q_seg)

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

    if n_win == 1:
        # plain single ring: owner w = r - step (mod cp)
        def step_fn(carry, step):
            o_a, lse_a, o_b, lse_b, kv = carry
            w = jax.lax.rem(r - step + cp, cp)
            oa, la, ob, lb = _fwd_compute(
                q_a, q_b, qs_a, qs_b, kv, w, r, step == 0, have_segs
            )
            o_a, lse_a = merge_partials(o_a, lse_a, oa, la)
            o_b, lse_b = merge_partials(o_b, lse_b, ob, lb)
            # Rotate unconditionally (cp rotations == identity): keeps the
            # collective out of lax.cond, which XLA requires to be uniform.
            kv = _rotate(kv, axis_name, cp * inner_size, inner_size)
            return (o_a, lse_a, o_b, lse_b, kv), None

        (o_a, lse_a, o_b, lse_b, kv_last), _ = jax.lax.scan(
            step_fn, (o_a, lse_a, o_b, lse_b, kv), jnp.arange(cp)
        )
        if not _overlap_collectives():
            # The final rotation's result is discarded, so that permute can
            # dangle past the scan and overlap downstream collectives —
            # fine on TPU (one compile-time order), rendezvous-hazardous on
            # the CPU thunk executor. Tie the outputs to its completion.
            o_a, lse_a, o_b, lse_b, _ = jax.lax.optimization_barrier(
                (o_a, lse_a, o_b, lse_b, kv_last)
            )
    else:
        # double ring: inner sweeps of `win` steps; the cross-window jump of
        # the sweep-start KV is issued BEFORE the sweep so it overlaps the
        # whole sweep's compute. The LAST sweep issues no jump (its result
        # would be discarded — a full-KV long hop per layer saved).
        def inner_sweep(acc, kv, o):
            o_a, lse_a, o_b, lse_b = acc

            def istep(c2, i):
                o_a, lse_a, o_b, lse_b, kv = c2
                w = (
                    jax.lax.rem(r // win - o + n_win, n_win) * win
                    + jax.lax.rem(r % win - i + win, win)
                )
                is_diag = jnp.logical_and(o == 0, i == 0)
                oa, la, ob, lb = _fwd_compute(
                    q_a, q_b, qs_a, qs_b, kv, w, r, is_diag, have_segs
                )
                o_a, lse_a = merge_partials(o_a, lse_a, oa, la)
                o_b, lse_b = merge_partials(o_b, lse_b, ob, lb)
                kv = _rotate_inner_window(
                    kv, axis_name, cp * inner_size, inner_size, win
                )
                return (o_a, lse_a, o_b, lse_b, kv), None

            (o_a, lse_a, o_b, lse_b, kv_f), _ = jax.lax.scan(
                istep, (o_a, lse_a, o_b, lse_b, kv), jnp.arange(win)
            )
            if not _overlap_collectives():
                # last inner rotation dangles (result discarded) — order it
                o_a, lse_a, o_b, lse_b, _ = jax.lax.optimization_barrier(
                    (o_a, lse_a, o_b, lse_b, kv_f)
                )
            return (o_a, lse_a, o_b, lse_b)

        def sweep_fn(carry, o):
            o_a, lse_a, o_b, lse_b, kv = carry
            if _overlap_collectives():
                # issue the long hop FIRST: XLA's async collective-permute
                # overlaps it with the whole inner sweep's compute on TPU
                kv_next = _rotate_window_jump(
                    kv, axis_name, cp * inner_size, inner_size, win
                )
                acc = inner_sweep((o_a, lse_a, o_b, lse_b), kv, o)
            else:
                # CPU gate: total-order the collectives. Sweep first; the
                # jump may not START until the sweep is done (barrier in),
                # and nothing downstream may start until it is DONE
                # (barrier out) — at most one collective in flight.
                acc = inner_sweep((o_a, lse_a, o_b, lse_b), kv, o)
                acc, kv = jax.lax.optimization_barrier((acc, kv))
                kv_next = _rotate_window_jump(
                    kv, axis_name, cp * inner_size, inner_size, win
                )
                acc, kv_next = jax.lax.optimization_barrier((acc, kv_next))
            return (*acc, kv_next), None

        (o_a, lse_a, o_b, lse_b, kv), _ = jax.lax.scan(
            sweep_fn, (o_a, lse_a, o_b, lse_b, kv), jnp.arange(n_win - 1)
        )
        o_a, lse_a, o_b, lse_b = inner_sweep(
            (o_a, lse_a, o_b, lse_b), kv, jnp.asarray(n_win - 1)
        )

    o = jnp.concatenate([o_a, o_b], axis=1)
    lse = jnp.concatenate([lse_a, lse_b], axis=2)
    return o, lse


def _ring_vjp_fwd(q, k, v, axis_name, have_segs, inner_size, q_seg, kv_seg,
                  window=0):
    o, lse = _ring_fwd(
        q, k, v, axis_name, have_segs, inner_size, q_seg, kv_seg, window
    )
    # Under jax.checkpoint with the "flash" policy (qwen2._remat_policy)
    # these tags keep (o, lse) saved, so the backward skips the ENTIRE
    # forward ring pass (kernel grid + one full ppermute KV rotation per
    # layer) — without them the flash policy silently degraded to full
    # recompute on cp meshes. o is 160 MB/layer/chip at 1M cp8xtp8;
    # stage-4 AOT with remat=flash stays GREEN (PERF.md).
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, o, lse, q_seg, kv_seg)


def _bwd_compute(
    q_a, q_b, g_a, g_b, lse_a, lse_b, delta_a, delta_b,
    qs_a, qs_b, kv, w, r, is_diag, have_segs,
):
    """One backward ring step: partial (dq_a, dq_b, dk, dv) for this kv."""
    kc, vc, sc = kv
    k_c, k_d = _split2(kc)
    v_c, v_d = _split2(vc)
    s_c, s_d = _split2(sc)
    wrap = w > r

    def seg_or_none(s):
        return s if have_segs else None

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

    return jax.lax.cond(is_diag, diag_step, off_diag_step, None)


def _ring_vjp_bwd(axis_name, have_segs, inner_size, window, res, g):
    q, k, v, o, lse, q_seg, kv_seg = res
    cp = _axis_size(axis_name) // inner_size
    r = jax.lax.axis_index(axis_name) // inner_size
    b, two_c, hq, d = q.shape
    c = two_c // 2

    win = window if window and 0 < window < cp else cp
    n_win = cp // win

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

    dq = _pvary(jnp.zeros(q.shape, jnp.float32), q)
    # (k, v, seg) and (dk, dv) travel together around the ring.
    kv_seg_arr = (
        kv_seg if have_segs else _pvary(jnp.zeros((b, two_c), jnp.int32), q)
    )
    kv = (k, v, kv_seg_arr)
    dkv = (
        _pvary(jnp.zeros(k.shape, jnp.float32), q),
        _pvary(jnp.zeros(v.shape, jnp.float32), q),
    )

    def body(dq, kv, dkv, w, is_diag):
        dqa_f, dqb_f, dk_new, dv_new = _bwd_compute(
            q_a, q_b, g_a, g_b, lse_a, lse_b, delta_a, delta_b,
            qs_a, qs_b, kv, w, r, is_diag, have_segs,
        )
        dq = dq + jnp.concatenate([dqa_f, dqb_f], axis=1)
        dkv = (dkv[0] + dk_new, dkv[1] + dv_new)
        return dq, dkv

    if n_win == 1:
        def step_fn(carry, step):
            dq, kv, dkv = carry
            w = jax.lax.rem(r - step + cp, cp)
            dq, dkv = body(dq, kv, dkv, w, step == 0)
            # Rotate every step (cp total): after the last rotation each dkv
            # accumulator lands back on the rank that owns its kv chunks.
            kv, dkv = _rotate(
                (kv, dkv), axis_name, cp * inner_size, inner_size
            )
            return (dq, kv, dkv), None

        (dq, kv_f, dkv), _ = jax.lax.scan(
            step_fn, (dq, kv, dkv), jnp.arange(cp)
        )
        if not _overlap_collectives():
            # final kv rotation is discarded — order it (see _ring_fwd)
            dq, _, dkv = jax.lax.optimization_barrier((dq, kv_f, dkv))
    else:
        # uniform double-ring schedule: win-1 inner hops then one diagonal
        # (inner+1, window+1) hop per sweep — cp steps compose to identity,
        # so dkv lands home with no fix-up permutation.
        def sweep_fn(carry, o):
            dq, kv, dkv = carry

            def istep(c2, i):
                dq, kv, dkv = c2
                w = (
                    jax.lax.rem(r // win - o + n_win, n_win) * win
                    + jax.lax.rem(r % win - i + win, win)
                )
                dq, dkv = body(
                    dq, kv, dkv, w, jnp.logical_and(o == 0, i == 0)
                )
                kv, dkv = _rotate_inner_window(
                    (kv, dkv), axis_name, cp * inner_size, inner_size, win
                )
                return (dq, kv, dkv), None

            (dq, kv, dkv), _ = jax.lax.scan(
                istep, (dq, kv, dkv), jnp.arange(win - 1)
            )
            # last inner step of the sweep, then the diagonal jump
            w = (
                jax.lax.rem(r // win - o + n_win, n_win) * win
                + jax.lax.rem(r % win - (win - 1) + win, win)
            )
            dq, dkv = body(
                dq, kv, dkv, w,
                jnp.logical_and(o == 0, jnp.asarray(win - 1 == 0)),
            )
            kv, dkv = _rotate_diagonal(
                (kv, dkv), axis_name, cp * inner_size, inner_size, win
            )
            return (dq, kv, dkv), None

        (dq, kv_f, dkv), _ = jax.lax.scan(
            sweep_fn, (dq, kv, dkv), jnp.arange(n_win)
        )
        if not _overlap_collectives():
            dq, _, dkv = jax.lax.optimization_barrier((dq, kv_f, dkv))

    dk = dkv[0].astype(k.dtype)
    dv = dkv[1].astype(v.dtype)
    return dq.astype(q.dtype), dk, dv, None, None


ring_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)
