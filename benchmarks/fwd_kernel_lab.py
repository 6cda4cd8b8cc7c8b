"""Forward flash-kernel lab (round 5, VERDICT #4).

Benchmarks the production forward kernel against (a) the official JAX
Pallas splash-attention kernel (the public state of the art on TPU) and
(b) scratch variants isolating two hypotheses about the ~47%-of-peak
flash ceiling at the 16K/40h/D128 bench shape:

  * cheap-mask: the production kernel builds TWO [BQ, BK] int32
    broadcasted_iotas + compares + and + select per block; 1-D iotas
    ([BQ,1] vs [1,BK]) broadcast-compared cost ~BQ+BK vector elements
    instead of 2*BQ*BK.
  * fastpath: interior causal blocks (fully below the diagonal, fully
    inside kv_len) need no mask at all — splash-style full/partial block
    separation; at 16K/1024 blocks, 120 of 136 computed blocks per head
    are interior.

Run on the real chip: python benchmarks/fwd_kernel_lab.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Variant kernel
# ---------------------------------------------------------------------------


def _variant_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, sm_scale, block_q, block_kv, n_kv, cheap_mask, fastpath, wide_ml,
):
    iq = pl.program_id(2)
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_blk_max = (iq + 1) * block_q - 1
    kv_blk_min = jk * block_kv
    kv_blk_max = (jk + 1) * block_kv - 1
    compute = kv_blk_min <= q_blk_max
    interior = kv_blk_max < iq * block_q  # strictly below the diagonal band

    def _step(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        if masked:
            if cheap_mask:
                q_pos = iq * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 1), 0
                )
                kv_pos = jk * block_kv + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_kv), 1
                )
                mask = kv_pos <= q_pos  # broadcast [BQ, BK]
            else:
                q_pos = iq * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 0
                )
                kv_pos = jk * block_kv + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 1
                )
                mask = kv_pos <= q_pos
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        if wide_ml:
            m_cur = jnp.broadcast_to(m_cur, m_prev.shape)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - (m_new[:, :1] if wide_ml else m_new))
        l_cur = jnp.sum(p, axis=1, keepdims=True)
        if wide_ml:
            l_cur = jnp.broadcast_to(l_cur, m_prev.shape)
        l_ref[...] = l_ref[...] * alpha + l_cur
        m_ref[...] = m_new

        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * (alpha[:, :1] if wide_ml else alpha) + pv

    if fastpath:
        @pl.when(jnp.logical_and(compute, interior))
        def _fast():
            _step(False)

        @pl.when(jnp.logical_and(compute, jnp.logical_not(interior)))
        def _slow():
            _step(True)
    else:
        @pl.when(compute)
        def _all():
            _step(True)

    @pl.when(jk == n_kv - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(l_safe)
        lse_ref[0, 0, 0] = jnp.where(l == 0.0, NEG_INF, lse)


def variant_flash(q, k, v, *, block_q, block_kv, cheap_mask, fastpath,
                  wide_ml=False):
    """q [B,Hq,S,D] head-major; causal, no segments, no offsets."""
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    group = hq // hkv
    n_q = sq // block_q
    n_kv = skv // block_kv

    def q_index(b_, h, iq, jk):
        return (b_, h, iq, 0)

    def kv_index(b_, h, iq, jk):
        if True:  # clamp past-diagonal jk to the diagonal block (DMA elide)
            diag = jax.lax.div((iq + 1) * block_q - 1, block_kv)
            jk = jnp.clip(jnp.minimum(jk, diag), 0, n_kv - 1)
        return (b_, h // group, jk, 0)

    ml_w = 128 if wide_ml else 1
    kernel = functools.partial(
        _variant_kernel, sm_scale=1.0 / (d ** 0.5), block_q=block_q,
        block_kv=block_kv, n_kv=n_kv, cheap_mask=cheap_mask,
        fastpath=fastpath, wide_ml=wide_ml,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(b, hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_index),
            pl.BlockSpec((1, 1, block_kv, d), kv_index),
            pl.BlockSpec((1, 1, block_kv, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_index),
            pl.BlockSpec((1, 1, 1, block_q, 1),
                         lambda b_, h, iq, jk: (b_, h, iq, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, hq, n_q, block_q, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, ml_w), jnp.float32),
            pltpu.VMEM((block_q, ml_w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * sq * skv * d * 0.5),
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=b * hq * sq * skv,
        ),
    )(q, k, v)
    return o


# ---------------------------------------------------------------------------
# Contenders
# ---------------------------------------------------------------------------


def time_fn(fn, q, k, v, iters=8, reps=3):
    """fn(q, k, v) -> o with o.shape == q.shape. Chains `iters` calls in
    one lax.scan (carry feeds q) so remote-dispatch overhead amortizes and
    XLA cannot CSE the repeats; forces with a device_get of a scalar."""

    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            o = fn(c, k, v).astype(q.dtype)
            return o, ()

        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    _ = jax.device_get(loop(q, k, v))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(loop(q, k, v))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main():
    from long_vita_tpu.utils.compile_cache import enable
    enable()
    from long_vita_tpu.ops import flash_attention as fa

    b, hq, hkv, sq, d = 1, 40, 8, 16384, 128
    rng = np.random.default_rng(0)
    q_sm = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.bfloat16)
    k_sm = jnp.asarray(rng.standard_normal((b, sq, hkv, d)), jnp.bfloat16)
    v_sm = jnp.asarray(rng.standard_normal((b, sq, hkv, d)), jnp.bfloat16)
    q_hm = jnp.transpose(q_sm, (0, 2, 1, 3))
    k_hm = jnp.transpose(k_sm, (0, 2, 1, 3))
    v_hm = jnp.transpose(v_sm, (0, 2, 1, 3))

    flops = 4 * b * hq * sq * sq * d * 0.5
    results = {}

    def report(name, dt, out=None, ref=None):
        tf = flops / dt / 1e12
        err = ""
        if out is not None and ref is not None:
            e = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
            err = f" | max|err| {e:.4f}"
        log(f"{name:44s} {dt*1e3:7.2f} ms  {tf:6.1f} TF/s{err}")
        results[name] = round(tf, 1)

    # reference output for parity (production kernel)
    ours = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v, causal=True))
    dt = time_fn(ours, q_sm, k_sm, v_sm)
    ref_out = ours(q_sm, k_sm, v_sm)
    report("ours (production, 1024x1024)", dt)

    # variants (head-major in/out; transpose cost excluded — the production
    # wrapper pays the same transposes)
    for name, kw in [
        ("variant base (2D-iota mask everywhere)",
         dict(cheap_mask=False, fastpath=False)),
        ("variant cheap-mask", dict(cheap_mask=True, fastpath=False)),
        ("variant fastpath", dict(cheap_mask=False, fastpath=True)),
        ("variant cheap-mask+fastpath",
         dict(cheap_mask=True, fastpath=True)),
        ("variant cheap+fast wide-ml",
         dict(cheap_mask=True, fastpath=True, wide_ml=True)),
        ("variant cheap+fast bq2048 bk512",
         dict(cheap_mask=True, fastpath=True, block_q=2048, block_kv=512)),
        ("variant cheap+fast bq1024 bk2048",
         dict(cheap_mask=True, fastpath=True, block_q=1024, block_kv=2048)),
        ("variant cheap+fast bq512 bk1024",
         dict(cheap_mask=True, fastpath=True, block_q=512, block_kv=1024)),
    ]:
        kw.setdefault("block_q", 1024)
        kw.setdefault("block_kv", 1024)
        fn = jax.jit(functools.partial(variant_flash, **kw))
        try:
            dt = time_fn(fn, q_hm, k_hm, v_hm)
            out = jnp.transpose(fn(q_hm, k_hm, v_hm), (0, 2, 1, 3))
            report(name, dt, out, ref_out)
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {str(e)[:120]}")

    # official splash attention (GQA via one MQA kernel per kv head)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )
        group = hq // hkv

        for bqs, bkvs in [(1024, 1024), (2048, 2048), (512, 1024)]:
            mask = sm.MultiHeadMask(
                [sm.CausalMask((sq, sq)) for _ in range(group)]
            )
            kernel = sk.make_splash_mqa_single_device(
                mask,
                block_sizes=sk.BlockSizes(block_q=bqs, block_kv=bkvs,
                                          block_kv_compute=bkvs),
            )

            def splash(q, k, v, kernel=kernel):
                # q [B,Hq,S,D] -> [B,Hkv,G,S,D]; kernel over (B, Hkv)
                qg = q.reshape(b, hkv, group, sq, d) * (1.0 / d ** 0.5)
                og = jax.vmap(jax.vmap(kernel))(qg, k, v)
                return og.reshape(b, hq, sq, d)

            fn = jax.jit(splash)
            dt = time_fn(fn, q_hm, k_hm, v_hm)
            out = jnp.transpose(fn(q_hm, k_hm, v_hm), (0, 2, 1, 3))
            report(f"official splash mqa {bqs}x{bkvs}", dt, out, ref_out)
    except Exception as e:  # noqa: BLE001
        log(f"splash: FAILED {str(e)[:200]}")

    # ------------------------------------------------------------------
    # Backward: ours (fused one-pass) vs splash fused, same scan timing.
    # Chain: q_{t+1} = dq_t (same shape); k/v fixed. Reported TF/s uses a
    # 7-matmul-unit fwd+bwd model (2 fwd + 5 bwd block-matmuls, causal
    # 0.5) for BOTH kernels — ms is the honest unit, TF/s the scale.
    # ------------------------------------------------------------------
    bwd_flops = flops * (7.0 / 2.0)

    def time_bwd(attn, q0, k0, v0, iters=8, reps=3):
        @jax.jit
        def loop(q, k, v):
            def body(c, _):
                g = jax.grad(lambda qq: jnp.sum(attn(qq, k, v)
                                                .astype(jnp.float32)))(c)
                return g.astype(q.dtype), ()

            c, _ = jax.lax.scan(body, q, None, length=iters)
            return jnp.sum(c.astype(jnp.float32))

        _ = jax.device_get(loop(q0, k0, v0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = jax.device_get(loop(q0, k0, v0))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters

    def report_bwd(name, dt):
        tf = bwd_flops / dt / 1e12
        log(f"{name:44s} {dt*1e3:7.2f} ms  {tf:6.1f} TF/s (7-unit model)")
        results[name] = round(tf, 1)

    try:
        dt = time_bwd(
            lambda q, k, v: fa.flash_attention(q, k, v, causal=True),
            q_sm, k_sm, v_sm,
        )
        report_bwd("ours fwd+bwd (fused one-pass)", dt)
    except Exception as e:  # noqa: BLE001
        log(f"ours bwd: FAILED {str(e)[:160]}")

    try:
        fa._FUSED_BWD = False
        dt = time_bwd(
            lambda q, k, v: fa.flash_attention(q, k, v, causal=True),
            q_sm, k_sm, v_sm,
        )
        report_bwd("ours fwd+bwd (two-pass)", dt)
    finally:
        fa._FUSED_BWD = True

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )
        group = hq // hkv
        for fused in (True, False):
            mask = sm.MultiHeadMask(
                [sm.CausalMask((sq, sq)) for _ in range(group)]
            )
            kernel = sk.make_splash_mqa_single_device(
                mask,
                block_sizes=sk.BlockSizes(
                    block_q=1024, block_kv=1024, block_kv_compute=1024,
                    block_q_dkv=1024, block_kv_dkv=1024,
                    block_kv_dkv_compute=1024,
                    block_q_dq=None if fused else 1024,
                    block_kv_dq=None if fused else 1024,
                    use_fused_bwd_kernel=fused,
                ),
            )

            def splash(q, k, v, kernel=kernel):
                qg = q.reshape(b, hkv, group, sq, d) * (1.0 / d ** 0.5)
                og = jax.vmap(jax.vmap(kernel))(qg, k, v)
                return og.reshape(b, hq, sq, d)

            dt = time_bwd(splash, q_hm, k_hm, v_hm)
            report_bwd(
                f"splash fwd+bwd ({'fused' if fused else 'two-pass'})", dt
            )
    except Exception as e:  # noqa: BLE001
        log(f"splash bwd: FAILED {str(e)[:200]}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
