"""w4a16 matmul: packed-int4 weights, group-wise scales, bf16 activations.

Why int4 needs a kernel at all: decode is floored by the per-token HBM
weight read, and int4 halves it AGAIN over w8 — but there is no XLA path
that actually moves int4 bytes here. `jnp.int4` arrays cannot cross the
host->device boundary on this stack (device_put recurses — see
.claude/skills/verify round-4 notes), and any jnp unpack formulation
either materializes the unpacked weight in HBM or reads the packed
buffer once per nibble, paying int8 traffic for int4 storage. The
Pallas kernel reads each packed byte exactly once into VMEM, splits the
nibbles on the VPU, applies the per-group scale, and feeds the MXU bf16
blocks — so HBM moves in*out/2 bytes + scales, full stop.

Packing layout (host side, `pack_int4`): SPLIT-HALF, not interleaved —
byte p of `packed[in/2, out]` holds int4 row p of the TOP half of the
original [in, out] kernel in its LOW nibble and row in/2 + p (BOTTOM
half) in its HIGH nibble. Unpacking is then two shifts and NO row
shuffle (a row interleave would be a sublane permute on the VPU);
the matmul just runs top and bottom halves as two accumulated GEMMs
against the matching halves of x.

Scales are per (128-row input group, output channel): f32
[in/128, out]. Group 0..G/2-1 cover the top half in order, G/2..G-1
the bottom half, so packed-row block k maps to scale rows (k, G/2+k).

Math pinned by tests: out = sum_g scale[g] * (x[:, g*128:(g+1)*128] @
q[g]) with f32 accumulation — `w4_matmul_xla` is the same formula in
plain jnp (the oracle; also the CPU/interpret path), and the host
`unpack_int4` round-trips `pack_int4` exactly.

The reference has no quantized serving at all (Megatron bf16,
long_vita_megatron/inference/text_generation_server.py); this op is
what lets the full 48-layer 14B geometry decode on ONE 16 GB v5e
(see benchmarks/long_context.py --full-model).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from long_vita_tpu.ops._target import target_is_tpu

GROUP = 128  # input rows per scale group == one MXU contraction tile


# ---- host-side pack/quantize -------------------------------------------


def quantize_int4_grouped(
    w: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """f32 [..., in, out] -> (packed int8 [..., in/2, out],
    f32 scales [..., in/128, out]).

    Symmetric per-(group, out-channel): scale = max|w_group|/7 (int4
    range -8..7; the symmetric grid uses +-7 so dequant stays unbiased).
    """
    w = np.asarray(w, np.float32)
    n_in, n_out = w.shape[-2], w.shape[-1]
    # production dims tile the 128-row MXU group; tiny test dims fall
    # back to one group per packed half (the jnp path derives the group
    # size from the scale shape, the Pallas path requires 128)
    group = GROUP if n_in % (2 * GROUP) == 0 else n_in // 2
    if n_in % (2 * group) != 0:
        raise ValueError(f"in dim {n_in} not divisible by 2*{group}")
    lead = w.shape[:-2]
    g = w.reshape(*lead, n_in // group, group, n_out)
    a = np.max(np.abs(g), axis=-2)
    scales = np.where(a > 0, a / np.float32(7.0), np.float32(1.0))
    q = np.clip(
        np.rint(g / scales[..., None, :]), -8, 7
    ).astype(np.int8).reshape(*lead, n_in, n_out)
    return pack_int4(q), scales.astype(np.float32)


def pack_int4(q: np.ndarray) -> np.ndarray:
    """int8 values in -8..7, [..., in, out] -> packed int8 [..., in/2, out].

    Low nibble = top half row p; high nibble = bottom half row in/2+p."""
    n_in = q.shape[-2]
    top = q[..., : n_in // 2, :].astype(np.uint8) & 0xF
    bot = q[..., n_in // 2:, :].astype(np.uint8) & 0xF
    return ((bot << 4) | top).astype(np.uint8).view(np.int8)


def unpack_int4(packed: np.ndarray) -> np.ndarray:
    """Exact inverse of pack_int4 (tests / the XLA fallback's oracle)."""
    p = np.asarray(packed).view(np.uint8).astype(np.int32)
    top = ((p & 0xF) ^ 8) - 8  # sign-extend low nibble
    bot = ((p >> 4) ^ 8) - 8
    return np.concatenate([top, bot], axis=-2).astype(np.int8)


# ---- XLA fallback (CPU tests, prefill oracle) ---------------------------


def w4_matmul_xla(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    out_dtype=None,
) -> jnp.ndarray:
    """Same math in plain jnp. Materializes the dequantized weight
    (one transient [in, out] x.dtype array — NOT a [rows, groups, out]
    partial: at prefill chunk sizes that partial is rows*G*out f32 =
    18 GB, a real OOM), so it pays bf16-weight HBM traffic — correct
    everywhere, fast nowhere."""
    p = packed.astype(jnp.int32)
    # mask BEFORE the sign-extend trick: the int8->int32 cast already
    # sign-extended the byte, so (p >> 4) carries high bits for
    # negative bytes
    top = ((p & 0xF) ^ 8) - 8
    bot = (((p >> 4) & 0xF) ^ 8) - 8
    w_q = jnp.concatenate([top, bot], axis=-2).astype(jnp.float32)
    n_in, n_out = w_q.shape[-2], w_q.shape[-1]
    ngroups = scales.shape[-2]
    group = n_in // ngroups
    w = (
        w_q.reshape(ngroups, group, n_out)
        * scales.astype(jnp.float32)[..., None, :]
    ).reshape(n_in, n_out).astype(x.dtype)
    out = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    return out.astype(out_dtype or x.dtype)


# ---- Pallas kernels ------------------------------------------------------


def _w4_matmul_pallas_u(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    *,
    block_out: int,
    interpret: bool,
    out_dtype,
) -> jnp.ndarray:
    """Whole-contraction variant: grid only over out-blocks; the packed
    column block [in/2, block_out] loads ONCE per step and the per-group
    dots unroll in-kernel. The (j, k) grid's 20-180 tiny steps leave the
    MXU idle between steps at decode row counts (each step is a [rows,
    128] x [128, bo] dot behind a VMEM swap barrier); one big step lets
    Mosaic schedule all the group dots back-to-back while the NEXT
    out-block's bytes stream in. Same math: scale-after-dot per group,
    f32 accumulation."""
    import jax.experimental.pallas as pl

    rows, n_in = x.shape
    half, n_out = packed.shape
    ngroups = scales.shape[0]
    half_groups = ngroups // 2
    grid = (n_out // block_out,)

    def kernel(x_ref, p_ref, s_ref, o_ref):
        acc = jnp.zeros((rows, block_out), jnp.float32)
        for g in range(half_groups):
            p = p_ref[g * GROUP:(g + 1) * GROUP, :].astype(jnp.int32)
            top = (((p & 0xF) ^ 8) - 8).astype(x_ref.dtype)
            bot = ((((p >> 4) & 0xF) ^ 8) - 8).astype(x_ref.dtype)
            xt = x_ref[:, g * GROUP:(g + 1) * GROUP]
            xb = x_ref[:, (half_groups + g) * GROUP:
                       (half_groups + g + 1) * GROUP]
            pt = jax.lax.dot(xt, top, preferred_element_type=jnp.float32)
            pb = jax.lax.dot(xb, bot, preferred_element_type=jnp.float32)
            st = s_ref[pl.dslice(g, 1), :]
            sb = s_ref[pl.dslice(half_groups + g, 1), :]
            acc = acc + pt * st + pb * sb
        o_ref[:] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, n_in), lambda j: (0, 0)),
            pl.BlockSpec((half, block_out), lambda j: (0, j)),
            pl.BlockSpec((ngroups, block_out), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((rows, block_out), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((rows, n_out), out_dtype or x.dtype),
        interpret=interpret,
    )(x, packed, scales)


def _w4_matmul_pallas(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    *,
    block_out: int,
    interpret: bool,
    out_dtype,
) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n_in = x.shape
    half, n_out = packed.shape
    ngroups = scales.shape[0]
    half_groups = ngroups // 2
    bk = GROUP  # one packed block row-range == one scale group per half
    grid = (n_out // block_out, half // bk)

    def kernel(xt_ref, xb_ref, p_ref, s_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        p = p_ref[:].astype(jnp.int32)
        # nibbles, sign-extended on the VPU (mask the high nibble before
        # the ^8-8 trick — the int8 byte was sign-extended by the int32
        # cast); int4 values are exact in bf16/f32, so match the
        # activation dtype (bf16 serving feeds the MXU bf16; f32 tests
        # stay bit-comparable to the jnp oracle)
        top = (((p & 0xF) ^ 8) - 8).astype(xt_ref.dtype)
        bot = ((((p >> 4) & 0xF) ^ 8) - 8).astype(xt_ref.dtype)
        pt = jax.lax.dot(
            xt_ref[:], top, preferred_element_type=jnp.float32
        )
        pb = jax.lax.dot(
            xb_ref[:], bot, preferred_element_type=jnp.float32
        )
        # the scale block carries ALL groups for this out-block (a
        # (1, bo) slice per step would violate the >=8-sublane block
        # minimum); dynamic-slice this step's top/bottom group rows
        kidx = pl.program_id(1)
        st = s_ref[pl.dslice(kidx, 1), :]
        sb = s_ref[pl.dslice(half_groups + kidx, 1), :]
        acc_ref[:] += pt * st + pb * sb

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _finalize():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # x top half / bottom half: same array, two block views
            pl.BlockSpec((rows, bk), lambda j, k: (0, k)),
            pl.BlockSpec(
                (rows, bk), lambda j, k: (0, half // bk + k)
            ),
            pl.BlockSpec((bk, block_out), lambda j, k: (k, j)),
            pl.BlockSpec((ngroups, block_out), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((rows, block_out), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((rows, n_out), out_dtype or x.dtype),
        scratch_shapes=[pltpu.VMEM((rows, block_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, x, packed, scales)


def w4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    *,
    block_out: int = 0,
    interpret: bool | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """out = x @ dequant(packed, scales); x [..., in] -> [..., out].

    Pallas on TPU (packed bytes read once), jnp fallback elsewhere or
    when the shape doesn't tile (block divisibility).

    Sharding: the Pallas path has no GSPMD partitioning rule — on a
    tp/cp-sharded mesh XLA would gather/replicate the packed weights per
    call. Int4 serving is SINGLE-CHIP-ONLY for now; mesh deployments use
    w8a16 (models/quantize.py), whose matmuls shard like bf16. interpret:
    None = auto (Pallas iff on TPU), True = Pallas in interpreter mode
    (tests), False = force the jnp fallback."""
    n_out = packed.shape[-1]
    if not block_out:
        # bigger out-blocks amortize the per-step x/scale refetch and
        # grid overhead (measured on v5e: bo=1536 beats 512 by 26% on
        # the 5120x13824 matvec); pick the largest that tiles n_out
        block_out = next(
            (b for b in (1536, 1024, 512, 256, 128) if n_out % b == 0),
            512,
        )
    lead, n_in = x.shape[:-1], x.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    # interpret=False means "no Pallas" off-TPU (a compiled Pallas TPU
    # kernel cannot run on the CPU/GPU backends); only interpret=True
    # (interpreter mode) forces the kernel path off-TPU
    use_pallas = target_is_tpu() or interpret is True
    if (
        not use_pallas
        or packed.ndim != 2
        or n_out % block_out
        or (n_in // 2) % GROUP
        or scales.shape[-2] != n_in // GROUP
        # prefill-sized row counts: the f32 accumulator (rows x
        # block_out) would blow VMEM, and prefill is compute-bound
        # anyway — the jnp path's transient unpacked weight is fine
        # there. The kernel is for DECODE (small rows), where the
        # weight read is the floor.
        or rows > 512
    ):
        return w4_matmul_xla(x, packed, scales, out_dtype)
    x2 = x.reshape(-1, n_in)
    import os

    variant = os.environ.get("LVT_W4_KERNEL", "u")
    impl = _w4_matmul_pallas_u if variant == "u" else _w4_matmul_pallas
    out = impl(
        x2, packed, scales,
        block_out=block_out, interpret=bool(interpret),
        out_dtype=out_dtype,
    )
    return out.reshape(*lead, n_out)
