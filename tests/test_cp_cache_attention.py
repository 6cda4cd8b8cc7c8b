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


def test_quant_prefill_chunk_shards():
    """int8 shards + scales through the cp merge == dequantized reference
    (VERDICT #3: the quant prefill chunk must stay shard-local)."""
    from long_vita_tpu.models.qwen2 import quantize_kv

    rng = np.random.default_rng(2)
    b, smax, sq, hq, hkv, d = 1, 64, 16, 8, 2, 16
    cache_len, q_offset = 40, 24
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, smax, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, smax, hkv, d)), jnp.float32)
    k_q, k_sc = quantize_kv(k)
    v_q, v_sc = quantize_kv(v)

    mesh = _mesh()
    qspec = P(None, None, None, None)
    cspec = P(None, "cp", None, None)
    fn = shard_map(
        lambda q_, kq_, ks_, vq_, vs_: cp_cached_attention(
            q_, kq_, vq_, q_offset, cache_len, "cp", k_scale=ks_, v_scale=vs_
        ),
        mesh=mesh, in_specs=(qspec, cspec, cspec, cspec, cspec),
        out_specs=qspec,
    )
    got = fn(q, k_q, k_sc, v_q, v_sc)

    k_dq = (k_q.astype(jnp.float32) * k_sc)
    v_dq = (v_q.astype(jnp.float32) * v_sc)
    want = xla_attention(
        q, k_dq, v_dq, causal=True,
        q_positions=jnp.arange(q_offset, q_offset + sq)[None],
        kv_positions=jnp.arange(smax)[None],
        kv_valid_len=jnp.asarray([cache_len]),
    )
    # fallback folds scales through bf16 matmuls -> bf16-level tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


def test_ragged_decode_vector_lengths():
    """Per-row frontiers: each batch row attends up to its own cache_len
    and writes its token into the right shard (VERDICT #4)."""
    from long_vita_tpu.ops.cp_cache_attention import cp_cache_update_attend

    rng = np.random.default_rng(3)
    b, smax, hq, hkv, d = 3, 64, 4, 2, 16
    lengths = jnp.asarray([10, 33, 50], jnp.int32)  # frontiers per row
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)), jnp.float32)
    # stacked single-layer caches [L=1, B, S, H, D]
    k = jnp.asarray(rng.standard_normal((1, b, smax, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, b, smax, hkv, d)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)

    mesh = _mesh()
    qspec = P(None, None, None, None)
    cspec = P(None, None, "cp", None, None)
    uspec = P(None, None, None, None)

    def body(q_, ck_, cv_, kn_, vn_):
        out, ck2, cv2, _, _ = cp_cache_update_attend(
            q_, ck_, cv_, kn_, vn_, None, None, None, None,
            jnp.asarray(0), lengths, lengths, "cp",
        )
        return out, ck2, cv2

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(qspec, cspec, cspec, uspec, uspec),
        out_specs=(qspec, cspec, cspec),
    )
    got, k2, v2 = fn(q, k, v, k_new, v_new)

    # reference: per-row dense update + causal attention at the frontier
    k_ref, v_ref = np.array(k, copy=True), np.array(v, copy=True)
    for row in range(b):
        k_ref[0, row, int(lengths[row])] = np.asarray(k_new[row, 0])
        v_ref[0, row, int(lengths[row])] = np.asarray(v_new[row, 0])
    np.testing.assert_allclose(np.asarray(k2), k_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), v_ref, rtol=1e-6, atol=1e-6)
    want = xla_attention(
        q, jnp.asarray(k_ref[0]), jnp.asarray(v_ref[0]), causal=True,
        q_positions=lengths[:, None],
        kv_positions=jnp.broadcast_to(jnp.arange(smax), (b, smax)),
        kv_valid_len=lengths + 1,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_cp_quant_prefill_hlo_no_cache_allgather():
    """Compiled HLO of a cp4 int8 prefill chunk must not all-gather
    anything cache-sized (the GSPMD pathology the shard_map path exists to
    avoid; VERDICT #3 'Done' criterion)."""
    import re

    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.models.qwen2 import KVCache, ParallelConfig
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh

    cfg = tiny_test_config()
    mesh = make_mesh(MeshConfig(dp=1, cp=4, tp=1), devices=jax.devices()[:4])
    parallel = ParallelConfig(mesh)
    params = qwen2.init_qwen2_params(
        jax.random.PRNGKey(0), cfg.text, jnp.float32
    )
    b, s, smax = 1, 16, 256
    cache = KVCache.zeros(cfg.text, b, smax, quantize=True)
    cspec = NamedSharding(mesh, P(None, None, "cp", None, None))
    cache = KVCache(
        jax.device_put(cache.k, cspec), jax.device_put(cache.v, cspec),
        cache.length,
        k_scale=jax.device_put(cache.k_scale, cspec),
        v_scale=jax.device_put(cache.v_scale, cspec),
    )
    embeds = jnp.zeros((b, s, cfg.text.hidden_size), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s), (b, s))

    def fn(p, e, pos, c):
        return qwen2.qwen2_decoder(
            p, e, pos, cfg.text, kv_cache=c, parallel=parallel
        )

    txt = (
        jax.jit(fn).lower(params, embeds, positions, cache).compile()
        .as_text()
    )
    cache_elems = cache.k.size  # per-buffer element count
    for m in re.finditer(r"= \w+\[([0-9,]*)\][^=]* all-gather", txt):
        dims = [int(x) for x in m.group(1).split(",") if x]
        numel = int(np.prod(dims)) if dims else 1
        assert numel < cache_elems // 2, (
            f"cache-sized all-gather in HLO: {m.group(0)[:120]}"
        )
