"""MoE / expert-parallelism correctness (reference plumbs MoE unused:
SURVEY.md §2b EP groups parallel_state.py:123-169)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from long_vita_tpu.ops.moe import init_moe_params, moe_mlp, _expert_mlp


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
