"""w4a16 packed-int4 matmul (ops/quant_matmul.py).

Pins: pack/unpack exact inverse; the jnp fallback equals the dequant
formula; the Pallas kernel (interpret mode on CPU) equals the fallback
bit-for-bit math (f32 accumulation both sides)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_vita_tpu.ops.quant_matmul import (
    GROUP,
    pack_int4,
    quantize_int4_grouped,
    unpack_int4,
    w4_matmul,
    w4_matmul_xla,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(512, 96), dtype=np.int8)
    packed = pack_int4(q)
    assert packed.shape == (256, 96) and packed.dtype == np.int8
    np.testing.assert_array_equal(unpack_int4(packed), q)


def test_quantize_grouped_error_bound():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((2 * GROUP * 2, 64)).astype(np.float32)
    packed, scales = quantize_int4_grouped(w)
    q = unpack_int4(packed).astype(np.float32)
    deq = (
        q.reshape(-1, GROUP, 64) * scales[:, None, :]
    ).reshape(w.shape)
    err = np.abs(deq - w)
    bound = np.repeat(scales, GROUP, axis=0) / 2 + 1e-6
    assert (err <= bound).all()


def test_xla_fallback_matches_dequant_formula():
    rng = np.random.default_rng(2)
    n_in, n_out = 2 * GROUP * 2, 128
    w = rng.standard_normal((n_in, n_out)).astype(np.float32)
    packed, scales = quantize_int4_grouped(w)
    x = rng.standard_normal((3, n_in)).astype(np.float32)

    got = w4_matmul_xla(
        jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scales)
    )
    q = unpack_int4(packed).astype(np.float32)
    xg = x.reshape(3, n_in // GROUP, GROUP)
    qg = q.reshape(n_in // GROUP, GROUP, n_out)
    want = np.einsum(
        "bgi,gio,go->bo", xg, qg, scales, optimize=True
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rows", [1, 5])
def test_pallas_interpret_matches_xla(rows):
    rng = np.random.default_rng(3)
    n_in, n_out = 2 * GROUP * 2, 512  # block_out-divisible
    w = rng.standard_normal((n_in, n_out)).astype(np.float32)
    packed, scales = quantize_int4_grouped(w)
    x = jnp.asarray(
        rng.standard_normal((rows, n_in)), jnp.float32
    )
    want = w4_matmul_xla(x, jnp.asarray(packed), jnp.asarray(scales))
    got = w4_matmul(
        x, jnp.asarray(packed), jnp.asarray(scales), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_leading_dims_and_fallback_shapes():
    rng = np.random.default_rng(4)
    n_in, n_out = 2 * GROUP, 96  # NOT block_out-divisible -> jnp path
    w = rng.standard_normal((n_in, n_out)).astype(np.float32)
    packed, scales = quantize_int4_grouped(w)
    x = jnp.asarray(rng.standard_normal((2, 3, n_in)), jnp.float32)
    got = w4_matmul(x, jnp.asarray(packed), jnp.asarray(scales))
    assert got.shape == (2, 3, n_out)
