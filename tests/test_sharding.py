"""Parameter sharding rules across mesh configurations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.config import tiny_test_config
from long_vita_tpu.models.long_vita import init_long_vita_params
from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
from long_vita_tpu.parallel.sharding import shard_params


def _local_shape(x):
    return x.addressable_shards[0].data.shape


def test_tp_sharding_shapes():
    cfg = tiny_test_config(vocab_size=512)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    sharded = shard_params(params, mesh)

    t = cfg.text
    # column-parallel q kernel: out dim split over tp
    full = sharded["text"]["layers"]["q_proj"]["kernel"]
    assert _local_shape(full)[-1] == full.shape[-1] // 2
    # row-parallel o kernel: in dim split
    o = sharded["text"]["layers"]["o_proj"]["kernel"]
    assert _local_shape(o)[1] == o.shape[1] // 2
    # vocab-parallel embedding
    e = sharded["text"]["embed"]["embedding"]
    assert _local_shape(e)[0] == t.vocab_size // 2
    # vision replicated
    v = sharded["vision"]["layers"]["qkv"]["kernel"]
    assert _local_shape(v) == v.shape


def test_fsdp_and_pp_layer_sharding():
    cfg = tiny_test_config(vocab_size=512)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    mesh = make_mesh(MeshConfig(dp=2), devices=jax.devices()[:2])
    sharded = shard_params(params, mesh, fsdp=True)
    # fsdp shards an INTERIOR dim, never the layer dim: the scan's
    # per-layer slice stays shard-local and XLA streams ONE layer's
    # weights per step (layer-dim sharding makes XLA materialize the
    # whole gathered stack inside the loop — ~18 GB/chip at 72B)
    k = sharded["text"]["layers"]["q_proj"]["kernel"]
    assert _local_shape(k)[0] == k.shape[0]  # layer dim intact
    assert _local_shape(k)[1] == k.shape[1] // 2  # in dim over dp
    o = sharded["text"]["layers"]["o_proj"]["kernel"]
    assert _local_shape(o)[-1] == o.shape[-1] // 2  # out dim over dp

    mesh = make_mesh(MeshConfig(pp=2), devices=jax.devices()[:2])
    sharded = shard_params(params, mesh, pp=True)
    k = sharded["text"]["layers"]["q_proj"]["kernel"]
    assert _local_shape(k)[0] == k.shape[0] // 2  # layer dim over pp


def test_factor_mesh_odd_counts():
    from __graft_entry__ import _factor_mesh

    for n in (1, 2, 3, 4, 5, 6, 8):
        dp, cp, tp = _factor_mesh(n)
        assert dp * cp * tp == n
