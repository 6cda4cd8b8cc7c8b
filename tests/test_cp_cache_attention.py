"""CP-sharded-cache attention vs single-device cached attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from long_vita_tpu.ops.attention import xla_attention
from long_vita_tpu.ops.cp_cache_attention import cp_cached_attention

CP = 4


def _mesh():
    return Mesh(np.asarray(jax.devices()[:CP]), ("cp",))


def _run(q, k, v, q_offset, cache_len):
    mesh = _mesh()
    qspec = P(None, None, None, None)
    cspec = P(None, "cp", None, None)
    fn = shard_map(
        lambda q_, k_, v_: cp_cached_attention(
            q_, k_, v_, q_offset, cache_len, "cp"
        ),
        mesh=mesh, in_specs=(qspec, cspec, cspec), out_specs=qspec,
    )
    return fn(q, k, v)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.slow
def test_chunked_prefill_step(hq, hkv):
    """A query chunk mid-prefill attends the sharded cache correctly."""
    rng = np.random.default_rng(0)
    b, smax, sq, d = 1, 64, 16, 16
    cache_len = 40  # valid prefix (chunk being written at 24..40)
    q_offset = 24
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, smax, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, smax, hkv, d)), jnp.float32)

    got = _run(q, k, v, q_offset, cache_len)

    want = xla_attention(
        q, k, v, causal=True,
        q_positions=jnp.arange(q_offset, q_offset + sq)[None],
        kv_positions=jnp.arange(smax)[None],
        kv_valid_len=jnp.asarray([cache_len]),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_decode_step():
    """Single-token decode against the sharded cache."""
    rng = np.random.default_rng(1)
    b, smax, hq, hkv, d = 1, 64, 4, 2, 16
    cache_len = 50
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, smax, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, smax, hkv, d)), jnp.float32)

    got = _run(q, k, v, cache_len - 1, cache_len)
    want = xla_attention(
        q, k, v, causal=True,
        q_positions=jnp.asarray([[cache_len - 1]]),
        kv_positions=jnp.arange(smax)[None],
        kv_valid_len=jnp.asarray([cache_len]),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
