"""MoE / expert-parallelism correctness (reference plumbs MoE unused:
SURVEY.md §2b EP groups parallel_state.py:123-169)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from long_vita_tpu.ops.moe import init_moe_params, moe_mlp, _expert_mlp


@pytest.mark.slow
def test_single_expert_equals_dense():
    """E=1, k=1, ample capacity -> exactly the expert's SwiGLU."""
    rng = jax.random.PRNGKey(0)
    params = init_moe_params(rng, num_experts=1, hidden=32, intermediate=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    out, aux = moe_mlp(params, x, top_k=1, capacity_factor=4.0)
    want = _expert_mlp(params["experts"], x.reshape(1, 32, 32)).reshape(
        2, 16, 32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
    # one expert: balanced by construction -> aux loss == 1.0
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-5)


@pytest.mark.slow
def test_topk_rows_are_weighted_expert_mix():
    """Each output row = sum_k gate_k * expert_k(x) when nothing drops."""
    rng = jax.random.PRNGKey(2)
    e, h, i = 4, 16, 32
    params = init_moe_params(rng, e, h, i)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, h))
    out, _ = moe_mlp(params, x, top_k=2, capacity_factor=8.0)

    xe = x.reshape(-1, h)
    probs = jax.nn.softmax(
        (xe @ params["router"]["kernel"]).astype(jnp.float32), axis=-1
    )
    gates, ids = jax.lax.top_k(probs, 2)
    per_expert = _expert_mlp(
        params["experts"], jnp.broadcast_to(xe[None], (e, xe.shape[0], h))
    )  # [E, N, H]: every expert applied to every token
    want = sum(
        gates[:, k][:, None] * jnp.take_along_axis(
            per_expert, ids[:, k][None, :, None], axis=0
        )[0]
        for k in range(2)
    )
    np.testing.assert_allclose(
        np.asarray(out.reshape(-1, h)), np.asarray(want), atol=1e-4
    )


@pytest.mark.slow
def test_capacity_drops_fall_through_to_zero():
    """Over-capacity copies contribute nothing (residual handles them)."""
    rng = jax.random.PRNGKey(4)
    params = init_moe_params(rng, num_experts=2, hidden=8, intermediate=16)
    # force all tokens to expert 0 via a huge router column
    k = params["router"]["kernel"]
    params["router"]["kernel"] = k.at[:, 0].set(0.0).at[:, 1].set(-100.0)
    params["router"]["kernel"] = params["router"]["kernel"].at[0, 0].add(100.0)
    x = jnp.ones((1, 16, 8))
    out, _ = moe_mlp(params, x, top_k=1, capacity_factor=0.25)
    # capacity = 16*1*0.25/2 = 2 slots: only 2 of 16 rows are nonzero-ish
    nonzero = np.abs(np.asarray(out.reshape(16, 8))).sum(-1) > 1e-9
    assert nonzero.sum() == 2


@pytest.mark.slow
def test_expert_parallel_matches_local():
    """shard_map EP (experts + tokens over 8 ranks) == single-process MoE."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    e, h, i, b, s = 8, 16, 32, 8, 4
    params = init_moe_params(jax.random.PRNGKey(5), e, h, i)
    x = jax.random.normal(jax.random.PRNGKey(6), (b, s, h))

    want, _ = moe_mlp(params, x, top_k=2, capacity_factor=float(e))

    mesh = Mesh(np.array(jax.devices()[:8]), ("ep",))
    specs = {
        "router": {"kernel": P()},
        "experts": {"gate": P("ep"), "up": P("ep"), "down": P("ep")},
    }

    def fn(p, xs):
        out, _ = moe_mlp(
            p, xs, top_k=2, capacity_factor=float(e), axis_name="ep"
        )
        return out

    got = shard_map(
        fn, mesh=mesh,
        in_specs=(specs, P("ep")), out_specs=P("ep"),
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


# ---------------------------------------------------------------------------
# MoE wired into the decoder (VERDICT round-1 #9)
# ---------------------------------------------------------------------------


def _moe_cfg(num_experts=4, cap=4.0):
    import dataclasses

    from long_vita_tpu.config import tiny_test_config

    cfg = tiny_test_config(num_experts=num_experts)
    return dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, moe_capacity_factor=cap)
    )


@pytest.mark.slow
def test_moe_decoder_forward_and_aux():
    from long_vita_tpu.models import qwen2

    cfg = _moe_cfg()
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg.text)
    assert "router" in params["layers"] and "gate_proj" not in params["layers"]
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 500)
    embeds = qwen2.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(32), (2, 32))
    hidden, cache, aux = qwen2.qwen2_decoder(
        params, embeds, pos, cfg.text, return_aux=True
    )
    assert np.all(np.isfinite(np.asarray(hidden)))
    assert float(aux) > 0.0  # load-balancing term accumulated over layers
    # default 2-tuple return stays intact for inference callers
    hidden2, cache2 = qwen2.qwen2_decoder(params, embeds, pos, cfg.text)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(hidden2))


@pytest.mark.slow
def test_moe_decode_with_cache_matches_forward():
    """Chunked cache decode through the MoE decoder == one-shot forward."""
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.models.qwen2 import KVCache

    cfg = _moe_cfg()
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg.text)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 0, 500)
    pos = jnp.broadcast_to(jnp.arange(24), (1, 24))
    embeds = qwen2.embed_tokens(params, ids)
    full, _ = qwen2.qwen2_decoder(params, embeds, pos, cfg.text, attn_impl="xla")

    cache = KVCache.zeros(cfg.text, batch=1, max_len=32, dtype=jnp.float32)
    outs = []
    for t in range(24):
        h, cache = qwen2.qwen2_decoder(
            params, embeds[:, t : t + 1], pos[:, t : t + 1], cfg.text,
            kv_cache=cache, attn_impl="xla",
        )
        outs.append(h)
    step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(step), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_moe_train_step_ep_over_dp():
    """Tiny MoE train step on a dp2 x tp2 mesh: experts shard over dp (EP),
    gradients flow into the expert stacks, loss tracks single-device."""
    from long_vita_tpu.models.long_vita import init_long_vita_params
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
    from long_vita_tpu.training.optimizer import OptimizerConfig, make_optimizer
    from long_vita_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    cfg = _moe_cfg(num_experts=4, cap=8.0)  # ample capacity: no drops
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tx = make_optimizer(params, OptimizerConfig(lr=1e-3, total_steps=4))

    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng.integers(0, 500, (2, 64)), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(64), (2, 64)).astype(jnp.int32),
        "segment_ids": jnp.zeros((2, 64), jnp.int32),
        "logit_positions": jnp.broadcast_to(jnp.arange(32), (2, 32)).astype(jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 500, (2, 32)), jnp.int32),
    }

    experts0 = jax.tree.map(
        np.asarray, params["text"]["layers"]["experts"]
    )  # host copy (train_step donates its input state)

    # single device reference
    state0 = init_train_state(jax.tree.map(jnp.copy, params), tx)
    step0 = make_train_step(cfg, tx, remat=False)
    _, m0 = step0(state0, batch)

    # dp2 (EP) x tp2 mesh
    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    state = init_train_state(params, tx, mesh)
    step = make_train_step(cfg, tx, mesh, remat=False)
    new_state, m = step(state, batch)

    assert np.isfinite(float(m["loss"]))
    # EP loss tracks the local-MoE loss (aux stats are shard-mean vs global
    # mean, so allow small slack)
    np.testing.assert_allclose(float(m["loss"]), float(m0["loss"]), atol=5e-3)
    # expert weights actually trained
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(np.asarray(a) - b))),
        new_state.params["text"]["layers"]["experts"],
        experts0,
    )
    assert all(v > 0 for v in jax.tree.leaves(d)), d


@pytest.mark.slow
def test_moe_with_ring_cp_and_ep():
    """EPxCP coexistence: dp2 (EP) x cp2 ring attention in one step."""
    from long_vita_tpu.models.long_vita import init_long_vita_params
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
    from long_vita_tpu.parallel.zigzag import zigzag_permute
    from long_vita_tpu.training.optimizer import OptimizerConfig, make_optimizer
    from long_vita_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    cfg = _moe_cfg(num_experts=4, cap=8.0)
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tx = make_optimizer(params, OptimizerConfig(lr=1e-3, total_steps=4))

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 500, (2, 64)).astype(np.int32)
    positions = np.broadcast_to(np.arange(64), (2, 64)).astype(np.int32)
    segs = np.zeros((2, 64), np.int32)
    batch = {
        "tokens": jnp.asarray(zigzag_permute(jnp.asarray(tokens), 2)),
        "positions": jnp.asarray(zigzag_permute(jnp.asarray(positions), 2)),
        "segment_ids": jnp.asarray(zigzag_permute(jnp.asarray(segs), 2)),
        "logit_positions": jnp.broadcast_to(jnp.arange(32), (2, 32)).astype(jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 500, (2, 32)), jnp.int32),
    }
    mesh = make_mesh(MeshConfig(dp=2, cp=2, tp=2), devices=jax.devices()[:8])
    state = init_train_state(params, tx, mesh)
    step = make_train_step(cfg, tx, mesh, use_ring=True, remat=False)
    _, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
