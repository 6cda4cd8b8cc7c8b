"""Zigzag sequence permutation for causal context parallelism.

Replaces the reference's per-rank zigzag batch slicing
(long_vita_megatron/training/utils.py:252-341: seq split into 2*cp chunks,
rank r takes chunks [r, 2cp-1-r]) with a single GLOBAL permutation applied
before sharding: after permuting, a plain P(..., "cp") sharding hands each
rank exactly its zigzag chunk pair, so the data pipeline, RoPE (which takes
explicit per-token positions) and the loss all stay oblivious to CP.

Image-tile routing across CP ranks (reference training/utils.py:279-325)
becomes unnecessary: vision features are scattered into token embeddings by
global (batch, seq) indices BEFORE the zigzag permutation is applied (or
equivalently the indices are permuted with the tokens).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def zigzag_order(num_chunks_half: int) -> np.ndarray:
    """Chunk order [r0, last, r1, last-1, ...] for cp ranks (2*cp chunks)."""
    cp = num_chunks_half
    order = []
    for r in range(cp):
        order += [r, 2 * cp - 1 - r]
    return np.asarray(order)


def zigzag_permutation(seq_len: int, cp: int) -> np.ndarray:
    """Index permutation: x_zigzag = x[perm]."""
    assert seq_len % (2 * cp) == 0, (seq_len, cp)
    c = seq_len // (2 * cp)
    chunks = np.arange(seq_len).reshape(2 * cp, c)
    return chunks[zigzag_order(cp)].reshape(-1)


def inverse_zigzag_permutation(seq_len: int, cp: int) -> np.ndarray:
    perm = zigzag_permutation(seq_len, cp)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(seq_len)
    return inv


def zigzag_permute(x: jnp.ndarray, cp: int, axis: int = 1) -> jnp.ndarray:
    """Apply the zigzag permutation along `axis` (static gather)."""
    if cp == 1:
        return x
    perm = zigzag_permutation(x.shape[axis], cp)
    return jnp.take(x, jnp.asarray(perm), axis=axis)


def zigzag_unpermute(x: jnp.ndarray, cp: int, axis: int = 1) -> jnp.ndarray:
    if cp == 1:
        return x
    inv = inverse_zigzag_permutation(x.shape[axis], cp)
    return jnp.take(x, jnp.asarray(inv), axis=axis)


def zigzag_positions(seq_len: int, cp: int) -> np.ndarray:
    """Position ids in zigzag order (what RoPE sees per shard)."""
    return zigzag_permutation(seq_len, cp)
