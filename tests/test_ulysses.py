"""Ulysses CP vs full attention on the 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from long_vita_tpu.ops.attention import xla_attention
from long_vita_tpu.ops.ulysses import ulysses_attention

CP = 4


def _mesh():
    return Mesh(np.asarray(jax.devices()[:CP]), ("cp",))


def _run(q, k, v, seg=None):
    mesh = _mesh()
    spec = P(None, "cp", None, None)
    if seg is None:
        fn = shard_map(
            lambda q_, k_, v_: ulysses_attention(q_, k_, v_, "cp"),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )
        return fn(q, k, v)
    sspec = P(None, "cp")
    fn = shard_map(
        lambda q_, k_, v_, s_: ulysses_attention(
            q_, k_, v_, "cp", q_segment_ids=s_, kv_segment_ids=s_
        ),
        mesh=mesh, in_specs=(spec, spec, spec, sspec), out_specs=spec,
    )
    return fn(q, k, v, seg)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.slow
def test_ulysses_matches_full(hq, hkv):
    rng = np.random.default_rng(0)
    b, s, d = 1, 8 * CP, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    got = _run(q, k, v)
    want = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ulysses_segments_and_grad():
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 8 * CP, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    seg = jnp.asarray((np.arange(s) // 10)[None], jnp.int32)

    got = _run(q, k, v, seg)
    want = xla_attention(q, k, v, causal=True, q_segment_ids=seg,
                         kv_segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    gf = jax.grad(lambda q_: jnp.sum(_run(q_, k, v) ** 2))(q)
    gx = jax.grad(
        lambda q_: jnp.sum(xla_attention(q_, k, v, causal=True) ** 2)
    )(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=2e-5, atol=2e-5)
