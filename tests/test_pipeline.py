"""GPipe pipeline over a pp axis vs sequential layer application."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from long_vita_tpu.parallel.pipeline import (
    interleave_permutation,
    pipeline_apply,
    pipeline_apply_interleaved,
)

PP = 4


def _mesh():
    return Mesh(np.asarray(jax.devices()[:PP]), ("pp",))


def test_pipeline_matches_sequential():
    rng = np.random.default_rng(0)
    n_layers, h = 8, 16
    weights = jnp.asarray(
        rng.standard_normal((n_layers, h, h)) * 0.3, jnp.float32
    )
    m, b = 6, 2  # microbatches
    x = jnp.asarray(rng.standard_normal((m, b, h)), jnp.float32)

    def body(stage_w, xx):
        def layer(carry, w):
            return jnp.tanh(carry @ w), None
        out, _ = jax.lax.scan(layer, xx, stage_w)
        return out

    # sequential reference
    want = body(weights, x.reshape(m * b, h).reshape(m, b, h))
    want = jax.vmap(lambda mb: body(weights, mb))(x)

    mesh = _mesh()
    fn = shard_map(
        lambda w, xx: pipeline_apply(w, xx, body, "pp"),
        mesh=mesh,
        in_specs=(P("pp", None, None), P()),
        out_specs=P(),
    )
    got = fn(weights, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pipeline_grad():
    rng = np.random.default_rng(1)
    n_layers, h, m, b = 4, 8, 4, 1
    weights = jnp.asarray(rng.standard_normal((n_layers, h, h)) * 0.3)
    x = jnp.asarray(rng.standard_normal((m, b, h)))

    def body(stage_w, xx):
        def layer(carry, w):
            return jnp.tanh(carry @ w), None
        out, _ = jax.lax.scan(layer, xx, stage_w)
        return out

    mesh = _mesh()
    fn = shard_map(
        lambda w, xx: pipeline_apply(w, xx, body, "pp"),
        mesh=mesh, in_specs=(P("pp", None, None), P()), out_specs=P(),
    )

    g_pipe = jax.grad(lambda w: jnp.sum(fn(w, x) ** 2))(weights)
    g_seq = jax.grad(
        lambda w: jnp.sum(jax.vmap(lambda mb: body(w, mb))(x) ** 2)
    )(weights)
    np.testing.assert_allclose(np.asarray(g_pipe), np.asarray(g_seq),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pp,v,m", [(4, 2, 8), (2, 4, 2), (2, 2, 6)])
def test_interleaved_matches_sequential(pp, v, m):
    """Interleaved (virtual-chunk) schedule == sequential stack, fwd+grad.

    Megatron-core interleaved-PP equivalent (reference
    --num-layers-per-virtual-pipeline-stage); chunk-major layer
    permutation + round-robin ring schedule."""
    rng = np.random.default_rng(2)
    n_layers, h, b = 8, 16, 2
    weights = jnp.asarray(
        rng.standard_normal((n_layers, h, h)) * 0.3, jnp.float32
    )
    x = jnp.asarray(rng.standard_normal((m, b, h)), jnp.float32)

    def body(stage_w, xx):
        def layer(carry, w):
            return jnp.tanh(carry @ w), None
        out, _ = jax.lax.scan(layer, xx, stage_w)
        return out

    want = jax.vmap(lambda mb: body(weights, mb))(x)
    mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))
    perm = jnp.asarray(interleave_permutation(n_layers, pp, v))
    # jit wraps the shard_map: the tick checkpoint (recompute-the-chunk-
    # slice policy) lowers via closed_call, which eager shard_map cannot
    # evaluate — and everything runs under jit in the framework anyway
    fn = jax.jit(shard_map(
        lambda w, xx: pipeline_apply_interleaved(
            w, xx, body, "pp", virtual=v
        ),
        mesh=mesh, in_specs=(P("pp", None, None), P()), out_specs=P(),
        check_vma=False,
    ))
    got = fn(jnp.take(weights, perm, 0), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    g_pipe = jax.grad(
        lambda w: jnp.sum(fn(jnp.take(w, perm, 0), x) ** 2)
    )(weights)
    g_seq = jax.grad(
        lambda w: jnp.sum(jax.vmap(lambda mb: body(w, mb))(x) ** 2)
    )(weights)
    np.testing.assert_allclose(np.asarray(g_pipe), np.asarray(g_seq),
                               rtol=1e-5, atol=1e-5)


def test_interleaved_decoder_matches_plain():
    """virtual_pp=2 decoder (pp=2) == plain scan decoder."""
    import dataclasses

    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.models.qwen2 import ParallelConfig
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh

    cfg = dataclasses.replace(tiny_test_config().text, num_hidden_layers=4)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, s = 2, 16
    embeds = jnp.asarray(rng.standard_normal((b, s, cfg.hidden_size)),
                         jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))

    want, _ = qwen2.qwen2_decoder(params, embeds, pos, cfg, attn_impl="xla")

    mesh = make_mesh(MeshConfig(pp=2), devices=jax.devices()[:2])
    parallel = ParallelConfig(mesh, microbatches=2, virtual_pp=2)
    # pre-permuted storage contract: the interleaved decoder expects the
    # layer stack chunk-major (init_train_state applies this in training)
    from long_vita_tpu.parallel.pipeline import permute_layer_stack

    pparams = {**params, "layers": permute_layer_stack(
        params["layers"], pp=2, virtual=2)}
    # jit: eager partial-manual shard_map trips a jax-internal spec check
    got, _ = jax.jit(
        lambda p, e: qwen2.qwen2_decoder(
            p, e, pos, cfg, attn_impl="xla", parallel=parallel
        )
    )(pparams, embeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_decoder_pipeline_matches_plain():
    """PP decoder (pp=4, microbatches=4) == plain scan decoder."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.models import qwen2
    from long_vita_tpu.models.qwen2 import ParallelConfig
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh

    cfg = tiny_test_config().text  # 2 layers... need divisible by pp
    import dataclasses
    cfg = dataclasses.replace(cfg, num_hidden_layers=4)
    params = qwen2.init_qwen2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, s = 4, 16
    embeds = jnp.asarray(rng.standard_normal((b, s, cfg.hidden_size)),
                         jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))

    want, _ = qwen2.qwen2_decoder(params, embeds, pos, cfg, attn_impl="xla")

    mesh = make_mesh(MeshConfig(pp=4), devices=jax.devices()[:4])
    parallel = ParallelConfig(mesh, microbatches=4)
    # jit: eager partial-manual shard_map trips a jax-internal spec check
    got, _ = jax.jit(
        lambda p, e: qwen2.qwen2_decoder(
            p, e, pos, cfg, attn_impl="xla", parallel=parallel
        )
    )(params, embeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_permute_layer_stack_roundtrip():
    """Pre-permuted storage relayout: forward take matches
    interleave_permutation; inverse restores canonical order."""
    from long_vita_tpu.parallel.pipeline import permute_layer_stack

    rng = np.random.default_rng(0)
    stack = {"w": jnp.asarray(rng.standard_normal((8, 3)))}
    out = permute_layer_stack(stack, pp=2, virtual=2)
    perm = interleave_permutation(8, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(out["w"]), np.asarray(stack["w"])[perm]
    )
    back = permute_layer_stack(out, pp=2, virtual=2, inverse=True)
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(stack["w"]))
    # virtual=1 is the identity (GPipe keeps canonical storage)
    assert permute_layer_stack(stack, pp=4, virtual=1) is stack


def test_interleaved_train_step_matches_gpipe():
    """Full train step at (pp2, v2) == (pp2 GPipe): canonical params in,
    init_train_state applies the chunk-major relayout ONCE, the step
    itself moves no weights across stages, and loss + updated params
    (compared in canonical order) match the GPipe schedule."""
    import dataclasses as dc

    import optax

    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.models.long_vita import init_long_vita_params
    from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
    from long_vita_tpu.parallel.pipeline import permute_layer_stack
    from long_vita_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    base = tiny_test_config()
    cfg = dc.replace(base, text=dc.replace(base.text, num_hidden_layers=4))
    params = init_long_vita_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    b, s, budget = 2, 32, 8
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.text.vocab_size, size=(b, s))
    batch = {
        "tokens": jnp.asarray(tokens, jnp.int32),
        "positions": jnp.broadcast_to(
            jnp.arange(s), (b, s)
        ).astype(jnp.int32),
        "segment_ids": jnp.zeros((b, s), jnp.int32),
        "logit_positions": jnp.tile(
            jnp.arange(budget, dtype=jnp.int32), (b, 1)
        ),
        "labels": jnp.asarray(tokens[:, 1 : budget + 1], jnp.int32),
        "images": None,
        "image_indices": None,
    }
    mesh = make_mesh(MeshConfig(pp=2), devices=jax.devices()[:2])

    def run(v):
        tx = optax.sgd(1e-2)
        state = init_train_state(
            jax.tree.map(np.array, params), tx, mesh, virtual_pp=v
        )
        step = make_train_step(cfg, tx, mesh, virtual_pp=v, remat=False)
        state, metrics = step(state, batch)
        layers = state.params["text"]["layers"]
        if v > 1:
            layers = permute_layer_stack(layers, 2, v, inverse=True)
        return float(metrics["loss"]), jax.tree.map(np.asarray, layers)

    def run_plain():
        tx = optax.sgd(1e-2)
        from long_vita_tpu.training.train_step import init_train_state as its

        state = its(jax.tree.map(np.array, params), tx, None)
        step = make_train_step(cfg, tx, None, remat=False)
        state, metrics = step(state, batch)
        return float(metrics["loss"]), jax.tree.map(
            np.asarray, state.params["text"]["layers"]
        )

    loss_p, layers_p = run_plain()
    for v in (1, 2):
        # both schedules vs the plain decoder: loss AND updated params.
        # This is the oracle that caught the nested-shard_map transpose
        # bug (gradients psum'd across pipeline stages): GPipe pp grads
        # were silently corrupted, not just the interleaved schedule.
        loss_v, layers_v = run(v)
        assert abs(loss_p - loss_v) < 1e-5, (v, loss_p, loss_v)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                a, b_, rtol=2e-5, atol=2e-6
            ),
            layers_p, layers_v,
        )
