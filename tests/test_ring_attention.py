"""Ring attention over an 8-device CPU mesh vs single-device full attention."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from long_vita_tpu.ops.attention import xla_attention
from long_vita_tpu.ops.ring_attention import ring_attention
from long_vita_tpu.parallel.zigzag import (
    zigzag_permute,
    zigzag_unpermute,
    zigzag_permutation,
)

CP = 4


def _mesh(cp=CP):
    return Mesh(np.asarray(jax.devices()[:cp]), ("cp",))


def _ring(q, k, v, mesh, seg=None):
    spec = P(None, "cp", None, None)
    if seg is None:
        fn = shard_map(
            lambda q, k, v: ring_attention(q, k, v, "cp", False, 1, None, None),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )
        return fn(q, k, v)
    sspec = P(None, "cp")
    fn = shard_map(
        lambda q, k, v, s: ring_attention(q, k, v, "cp", True, 1, s, s),
        mesh=mesh, in_specs=(spec, spec, spec, sspec), out_specs=spec,
    )
    return fn(q, k, v, seg)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 4)])
@pytest.mark.slow
def test_ring_matches_full_attention(hq, hkv):
    mesh = _mesh()
    rng = np.random.default_rng(0)
    b, s, d = 2, 8 * CP, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)

    want = xla_attention(q, k, v, causal=True)

    qz = zigzag_permute(q, CP)
    kz = zigzag_permute(k, CP)
    vz = zigzag_permute(v, CP)
    oz = _ring(qz, kz, vz, mesh)
    got = zigzag_unpermute(oz, CP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ring_gradients_match_full_attention():
    mesh = _mesh()
    rng = np.random.default_rng(1)
    b, s, hq, hkv, d = 1, 8 * CP, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    wts = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)

    def loss_full(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True) * wts)

    def loss_ring(q, k, v):
        qz, kz, vz = (zigzag_permute(x, CP) for x in (q, k, v))
        oz = _ring(qz, kz, vz, mesh)
        return jnp.sum(zigzag_unpermute(oz, CP) * wts)

    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gr, gf, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5,
            err_msg=f"d{name}",
        )


@pytest.mark.slow
def test_ring_with_segment_ids():
    mesh = _mesh()
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 8 * CP, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 3, size=(b, s)).cumsum(axis=1) // 7,
                      jnp.int32)

    want = xla_attention(q, k, v, causal=True, q_segment_ids=seg,
                         kv_segment_ids=seg)
    qz, kz, vz = (zigzag_permute(x, CP) for x in (q, k, v))
    segz = zigzag_permute(seg, CP)
    oz = _ring(qz, kz, vz, mesh, seg=segz)
    got = zigzag_unpermute(oz, CP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_zigzag_round_trip():
    x = jnp.arange(32.0).reshape(1, 32)
    z = zigzag_permute(x, 4)
    assert np.all(np.asarray(zigzag_unpermute(z, 4)) == np.asarray(x))
    perm = zigzag_permutation(32, 4)
    # rank 0 holds chunks 0 and 7
    np.testing.assert_array_equal(perm[:8], [0, 1, 2, 3, 28, 29, 30, 31])


# ---------------------------------------------------------------------------
# Double-ring windows (reference --cp-window-size, parallel_state.py:379-472)
# ---------------------------------------------------------------------------


def _ring_win(q, k, v, mesh, window, seg=None):
    spec = P(None, "cp", None, None)
    if seg is None:
        fn = shard_map(
            lambda q, k, v: ring_attention(
                q, k, v, "cp", False, 1, None, None, window
            ),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )
        return fn(q, k, v)
    sspec = P(None, "cp")
    fn = shard_map(
        lambda q, k, v, s: ring_attention(
            q, k, v, "cp", True, 1, s, s, window
        ),
        mesh=mesh, in_specs=(spec, spec, spec, sspec), out_specs=spec,
    )
    return fn(q, k, v, seg)


@pytest.mark.slow
@pytest.mark.parametrize("window", [2, 4])
def test_double_ring_matches_full_attention(window):
    """cp=8 with window=2/4 inner rings == plain full attention."""
    cp = 8
    mesh = _mesh(cp)
    rng = np.random.default_rng(7)
    b, s, hq, hkv, d = 1, 8 * cp, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)

    want = xla_attention(q, k, v, causal=True)
    qz, kz, vz = (zigzag_permute(x, cp) for x in (q, k, v))
    got = zigzag_unpermute(_ring_win(qz, kz, vz, mesh, window), cp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_double_ring_gradients_match_plain_ring():
    """Window=2 gradients == plain-ring gradients == full attention."""
    cp = 8
    mesh = _mesh(cp)
    rng = np.random.default_rng(8)
    b, s, hq, hkv, d = 1, 8 * cp, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    wts = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)

    def loss_full(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True) * wts)

    def loss_win(q, k, v):
        qz, kz, vz = (zigzag_permute(x, cp) for x in (q, k, v))
        oz = _ring_win(qz, kz, vz, mesh, 2)
        return jnp.sum(zigzag_unpermute(oz, cp) * wts)

    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    gw = jax.grad(loss_win, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gw, gf, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5,
            err_msg=f"d{name}",
        )


@pytest.mark.slow
def test_double_ring_with_segments():
    cp = 8
    mesh = _mesh(cp)
    rng = np.random.default_rng(9)
    b, s, hq, hkv, d = 1, 8 * cp, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    seg = jnp.sort(jnp.asarray(rng.integers(0, 3, (b, s)), jnp.int32), axis=1)

    want = xla_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
    )
    qz, kz, vz = (zigzag_permute(x, cp) for x in (q, k, v))
    segz = zigzag_permute(seg, cp)
    got = zigzag_unpermute(_ring_win(qz, kz, vz, mesh, 2, seg=segz), cp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_adaptive_segment_skipping_exact():
    """Adaptive pair skipping (segment-overlap cond) is numerically exact:
    a heavily packed batch matches full attention bit-for-tolerance."""
    mesh = _mesh()
    rng = np.random.default_rng(10)
    b, s, hq, hkv, d = 2, 16 * CP, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    # many short segments -> most ring pairs are pure cross-segment
    seg = jnp.sort(
        jnp.asarray(rng.integers(0, 16, (b, s)), jnp.int32), axis=1
    )

    want = xla_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
    )
    qz, kz, vz = (zigzag_permute(x, CP) for x in (q, k, v))
    segz = zigzag_permute(seg, CP)
    got = zigzag_unpermute(_ring(qz, kz, vz, mesh, seg=segz), CP)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
