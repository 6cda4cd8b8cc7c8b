"""Hybrid CP (ulysses-inner x ring-outer) vs full attention, 8-dev mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from long_vita_tpu.ops.attention import xla_attention
from long_vita_tpu.ops.hybrid_cp import hybrid_attention
from long_vita_tpu.parallel.zigzag import zigzag_permute, zigzag_unpermute

CP = 8
INNER = 2
GROUPS = CP // INNER


def _mesh():
    return Mesh(np.asarray(jax.devices()[:CP]), ("cp",))


def _run(q, k, v, seg=None):
    mesh = _mesh()
    spec = P(None, "cp", None, None)
    if seg is None:
        fn = shard_map(
            lambda q_, k_, v_: hybrid_attention(q_, k_, v_, "cp", INNER),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )
        return fn(q, k, v)
    sspec = P(None, "cp")
    fn = shard_map(
        lambda q_, k_, v_, s_: hybrid_attention(
            q_, k_, v_, "cp", INNER, q_segment_ids=s_, kv_segment_ids=s_
        ),
        mesh=mesh, in_specs=(spec, spec, spec, sspec), out_specs=spec,
    )
    return fn(q, k, v, seg)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.slow
def test_hybrid_matches_full(hq, hkv):
    rng = np.random.default_rng(0)
    b, s, d = 1, 16 * CP, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)

    want = xla_attention(q, k, v, causal=True)
    # zigzag over RING GROUPS; lanes split contiguously by P("cp")
    qz, kz, vz = (zigzag_permute(x, GROUPS) for x in (q, k, v))
    oz = _run(qz, kz, vz)
    got = zigzag_unpermute(oz, GROUPS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_hybrid_grad_and_segments():
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 16 * CP, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    seg = jnp.asarray((np.arange(s) // 40)[None], jnp.int32)

    want = xla_attention(q, k, v, causal=True, q_segment_ids=seg,
                         kv_segment_ids=seg)
    qz, kz, vz = (zigzag_permute(x, GROUPS) for x in (q, k, v))
    segz = zigzag_permute(seg, GROUPS)
    got = zigzag_unpermute(_run(qz, kz, vz, segz), GROUPS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss_h(q_):
        qz = zigzag_permute(q_, GROUPS)
        return jnp.sum(zigzag_unpermute(
            _run(qz, kz, vz), GROUPS) ** 2)

    def loss_x(q_):
        return jnp.sum(xla_attention(q_, k, v, causal=True) ** 2)

    gh = jax.grad(loss_h)(q)
    gx = jax.grad(loss_x)(q)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gx),
                               rtol=2e-5, atol=2e-5)
