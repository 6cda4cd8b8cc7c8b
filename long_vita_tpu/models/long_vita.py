"""LongVITA VLM: InternViT encoder + pixel-shuffle projector + Qwen2.5 decoder.

Behavioral parity target: reference modeling_long_vita.py:74-160 —
encode image tiles only on prefill (empty KV cache), strip the CLS token,
project, then scatter the projected features into the token embedding table
at `image_indices` (a [2, N_img, image_token_length] (batch, seq) index pair,
:143-147). The decoder then runs as plain Qwen2.

The reference's fake-image `*0.0` autograd trick (:110-116,140-141) is not
needed: JAX differentiates pure functions, there are no DDP bucket hooks to
keep alive.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig
from long_vita_tpu.models import qwen2
from long_vita_tpu.models.intern_vit import init_vit_params, intern_vit
from long_vita_tpu.models.projector import init_projector_params, project_features
from long_vita_tpu.models.qwen2 import KVCache, init_qwen2_params, qwen2_decoder

Params = dict[str, Any]


def encode_images(
    params: Params,
    images: jnp.ndarray,
    cfg: LongVITAConfig,
    *,
    chunk: int = 0,
    remat: bool = False,
    attn_impl: str = "auto",
    parallel=None,
    freeze_tower: bool = False,
) -> jnp.ndarray:
    """[N_tiles, H, W, 3] -> [N_tiles, image_token_length, lm_hidden].

    `chunk` > 0 splits the tile batch through lax.map to bound ViT activation
    memory at 4k-frame scale (replacing the reference's 256-image chunked
    forward, pretrain_long_vita.py:522-533). attn_impl "short" selects the
    single-pass ViT attention kernel (forward-only surfaces).

    With `parallel` (a qwen2.ParallelConfig) and cp > 1, the TOWER runs
    tile-BATCH-PARALLEL over the cp axis inside a shard_map — two reasons:
    GSPMD cannot auto-partition Mosaic kernels (the 64-chip stage-4 AOT
    fails to lower without this), and it gives the tower cp-fold
    parallelism — the same degree (8) as the reference's TP-sharded ViT
    (ckpt_converter_intern_vit.py), arranged the TPU way. The cp path
    requires freeze_tower (long_vita_forward routes trainable-ViT cp
    meshes to the XLA impl): the tower is stop_gradient'd INSIDE the
    shard_map so AD never transposes it, and the trainable PROJECTOR runs
    OUTSIDE under plain GSPMD (auto-partitioned GEMMs, standard psum'd
    param grads) — the same split as the reference, whose torch.no_grad
    covers tower+pixel-shuffle only (pretrain_long_vita.py:486-502).
    """

    def _chunked(fn, tiles, n_local):
        if chunk and n_local > chunk:
            pad = -n_local % chunk
            if pad:
                tiles = jnp.concatenate(
                    [tiles,
                     jnp.zeros((pad, *tiles.shape[1:]), tiles.dtype)],
                    axis=0,
                )
            batched = tiles.reshape(
                (n_local + pad) // chunk, chunk, *tiles.shape[1:]
            )
            out = jax.lax.map(fn, batched)
            return out.reshape(-1, *out.shape[2:])[:n_local]
        return fn(tiles)

    def _tower(vision_p, t, stop_grad):
        feats = intern_vit(
            vision_p, t, cfg.vision, remat=remat, attn_impl=attn_impl
        )
        if stop_grad:
            # the reference's --vision-model-freeze wraps ONLY the tower
            # (+pixel-shuffle) in torch.no_grad
            # (pretrain_long_vita.py:486-502); the projector keeps its own
            # grads — it is the ONLY trainable module in stage 1.
            # stop_gradient here (not on the projector output) skips the
            # ViT backward while the projector still trains.
            feats = jax.lax.stop_gradient(feats)
        # strip CLS (reference modeling_long_vita.py:97)
        return feats[:, 1:, :]

    def _encode_chunked(vision_p, projector_p, tiles):
        fn = lambda vp, pp, t: project_features(
            pp, _tower(vp, t, freeze_tower), cfg
        )
        if remat == "vit" and not freeze_tower:
            # chunk-level tower remat (the reference's --recompute-* family
            # extended to the vision tower): save only each chunk's tile
            # pixels and replay tower+projector once in backward. Without
            # it, a trainable tower saves one [tiles, 1025, vit_h] residual
            # per ViT layer REGARDLESS of chunking (3.0 GB at 60 tiles —
            # the stage-2 depth-sweep OOM) plus the projector's f32
            # layer-norm saves; chunk remat trades those for ~1 extra
            # tower forward.
            fn = jax.checkpoint(fn)
        return _chunked(
            lambda t: fn(vision_p, projector_p, t),
            tiles, tiles.shape[0],
        )

    n = images.shape[0]
    # tile-parallel axes: every non-pipeline axis with size > 1 (dp, cp
    # AND tp — a dp8xtp8 72B mesh, a cp8xtp8 stage-4 mesh and a tp8
    # stage-1/2 mesh all tile-shard the tower; a Mosaic kernel outside a
    # shard_map cannot lower on ANY multi-device mesh). Sharding tiles
    # over tp gives the tower the reference's ViT-TP parallel degree
    # (ckpt_converter_intern_vit.py) arranged batch-parallel.
    tile_axes = tuple(
        a for a in (
            (parallel.axis_dp, parallel.axis_cp, parallel.axis_tp)
            if parallel else ()
        )
        if parallel.mesh.shape.get(a, 1) > 1
    )
    nshard = 1
    for a in tile_axes:
        nshard *= parallel.mesh.shape[a]
    if nshard > 1:
        from jax.sharding import PartitionSpec as P

        pad = -n % nshard
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad, *images.shape[1:]), images.dtype)],
                axis=0,
            )
        rep = lambda tree: jax.tree.map(lambda _: P(), tree)
        # the tower is ALWAYS stop_gradient'd on this path — tile-sharding
        # is a frozen/forward-only surface (training routes trainable-ViT
        # multi-device meshes to the XLA impl in long_vita_forward), and
        # AD must never transpose the shard_map'd Mosaic kernels
        feats = jax.shard_map(
            lambda vp, tiles: _chunked(
                lambda t: _tower(vp, t, True), tiles, tiles.shape[0]
            ),
            mesh=parallel.mesh,
            in_specs=(rep(params["vision"]), P(tile_axes)),
            out_specs=P(tile_axes),
            check_vma=False,
        )(params["vision"], images)
        out = _chunked(
            lambda f: project_features(params["projector"], f, cfg),
            feats, feats.shape[0],
        )
        return out[:n]
    return _encode_chunked(params["vision"], params["projector"], images)


def merge_image_embeddings(
    inputs_embeds: jnp.ndarray,
    image_embeds: jnp.ndarray,
    image_indices: jnp.ndarray,
) -> jnp.ndarray:
    """Scatter projected tile features into token embeddings.

    inputs_embeds: [B, S, H]; image_embeds: [N_tiles, T, H];
    image_indices: [2, N_tiles, T] of (batch, seq) positions
    (reference modeling_long_vita.py:143-147).
    """
    b_idx = image_indices[0].reshape(-1)
    s_idx = image_indices[1].reshape(-1)
    flat = image_embeds.reshape(-1, image_embeds.shape[-1]).astype(
        inputs_embeds.dtype
    )
    return inputs_embeds.at[b_idx, s_idx].set(flat)


def merge_image_embeddings_chunked(
    inputs_embeds: jnp.ndarray,
    image_embeds: jnp.ndarray,
    image_indices: jnp.ndarray,
    chunk: int,
    constrain=None,
) -> jnp.ndarray:
    """merge_image_embeddings as a lax.scan over tile chunks.

    On a mesh, image_embeds are tile-sharded and inputs_embeds
    seq-sharded; GSPMD implements the scatter by all-gathering the
    UPDATES — at 4096 frames x 256 tokens that is the full [1M, 5120]
    (10.7 GB bf16) alive in the forward and saved transposes
    (aot_fullscale --case train-mm measured it as the largest
    collective). Scanning over chunks bounds the gathered transient to
    one chunk (~0.7 GB at 256 tiles) with identical semantics: JAX
    scatter drops out-of-bounds rows, so the zero/OOB padding tiles are
    inert. Indices are assumed COLLISION-FREE — every (b, s) cell is
    written by at most one tile token, which the data pipeline guarantees
    (each <IMG_CONTEXT> position belongs to exactly one tile). With
    duplicates, XLA scatter ordering is implementation-defined in BOTH
    the one-shot and chunked forms, so no parity is claimed for them.
    `constrain` (optional) re-pins the carry's sharding each step so the
    scan does not drift off the SP layout.
    """
    n, t, h = image_embeds.shape
    if n <= chunk:
        return merge_image_embeddings(
            inputs_embeds, image_embeds, image_indices
        )
    pad = -n % chunk
    if pad:
        image_embeds = jnp.concatenate(
            [image_embeds, jnp.zeros((pad, t, h), image_embeds.dtype)],
            axis=0,
        )
        # out-of-bounds seq index -> scatter drops the padding rows
        oob = jnp.full((2, pad, t), inputs_embeds.shape[1], jnp.int32)
        image_indices = jnp.concatenate(
            [image_indices, oob.at[0].set(0)], axis=1
        )
    c = (n + pad) // chunk
    feats = image_embeds.reshape(c, chunk, t, h)
    idx = jnp.moveaxis(image_indices.reshape(2, c, chunk, t), 1, 0)

    def body(carry, xs):
        f, ix = xs
        carry = merge_image_embeddings(carry, f, ix)
        if constrain is not None:
            carry = constrain(carry)
        return carry, None

    out, _ = jax.lax.scan(body, inputs_embeds, (feats, idx))
    return out


def long_vita_forward(
    params: Params,
    input_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    cfg: LongVITAConfig,
    *,
    images: Optional[jnp.ndarray] = None,
    image_indices: Optional[jnp.ndarray] = None,
    kv_cache: Optional[KVCache] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    logit_positions: Optional[jnp.ndarray] = None,
    vision_chunk: int = 0,
    attn_impl: str = "auto",
    remat: bool = False,
    parallel=None,
    return_aux: bool = False,
    freeze_vision: bool = False,
    head: bool = True,
):
    """Full VLM forward.

    logit_positions: optional [B, M] seq positions at which to compute logits
    — the logits-masked LM head (reference tensor_parallel/layers.py:402-407
    and gpt_vl_model.py:371-382): gather the M supervised/needed rows before
    the vocab GEMM so the [S, vocab] tensor never materializes at S=1M.

    head=False skips the vocab GEMM and returns the (gathered) hidden rows
    instead of logits — the vocab-parallel loss (training/loss.py
    vocab_parallel_ce) fuses the GEMM into a tp-sharded CE so the lm_head
    weight is never all-gathered.

    Returns (logits [B, S or M, vocab] f32 — or hidden rows when
    head=False, updated kv cache).
    """
    # pin the training-forward activation layout ONCE: batch over dp, seq
    # over cp x tp (Megatron sequence parallelism over the tp group —
    # reference tensor_parallel/layers.py:389-484). GSPMD usually
    # propagates this on its own, but the multimodal scatter below can
    # seed a cp-only layout, un-sharding the 48-layer remat stack over
    # tp: +52 GB/chip at 1M, caught by aot_fullscale --case train-mm.
    constrain = None
    vp_embed = False
    if parallel is not None and kv_cache is None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shape = parallel.mesh.shape
        # 2-D TP (tq > 1): the SP layout additionally shards hidden over
        # tq — halved activation residency and two-stage (SUMMA-style)
        # GEMM collectives, the reference's vestigial tp_x/tp_y design
        # (parallel_state.py:1010-1060) realized through GSPMD.
        _hdim = "tq" if shape.get("tq", 1) > 1 else None
        _sp = NamedSharding(
            parallel.mesh,
            P(parallel.axis_dp, (parallel.axis_cp, parallel.axis_tp), _hdim),
        )
        constrain = lambda x: jax.lax.with_sharding_constraint(x, _sp)
        cptp = (
            shape.get(parallel.axis_cp, 1) * shape.get(parallel.axis_tp, 1)
        )
        # vocab-parallel lookup (reference VocabParallelEmbedding + SP):
        # the embed table stays tp-sharded; output lands in the SP layout
        vp_embed = (
            shape.get(parallel.axis_tp, 1) > 1
            and shape.get("pp", 1) == 1
            and shape.get("tq", 1) == 1  # 2-D TP: plain lookup (the
            # psum_scatter shard_map doesn't mention tq; GSPMD reshards)
            and input_ids.shape[1] % cptp == 0
            and input_ids.shape[0] % shape.get(parallel.axis_dp, 1) == 0
        )
    if vp_embed:
        inputs_embeds = qwen2.embed_tokens_vp(
            params["text"], input_ids, parallel
        )
    else:
        inputs_embeds = qwen2.embed_tokens(params["text"], input_ids)
    if constrain is not None:
        inputs_embeds = constrain(inputs_embeds)
    if images is not None:
        # freeze_vision (stage-3/4): no gradient flows into the tower, so
        # (a) stop_gradient skips the ENTIRE ViT backward — the reference
        # wraps the frozen tower in torch.no_grad (pretrain_long_vita.py
        # :485-491); our scale-0 optimizer freeze alone would still compute
        # and discard the grads — and (b) the forward-only single-pass
        # attention kernel + cp tile-sharding apply.
        multi = (
            parallel is not None and parallel.mesh.devices.size > 1
        )
        if freeze_vision:
            vit_impl, vit_parallel = "short", parallel
        elif multi:
            # trainable ViT on a multi-device mesh (stage-2 on tp8, or a
            # cp mesh): the tile shard_map's backward would need manual
            # psums for the replicated params, and GSPMD cannot
            # auto-partition (or even lower) Mosaic kernels outside a
            # shard_map — take the XLA (auto-partitionable) path
            vit_impl, vit_parallel = "xla", None
        else:
            vit_impl, vit_parallel = attn_impl, None
        image_embeds = encode_images(
            params, images, cfg, chunk=vision_chunk, remat=remat,
            attn_impl=vit_impl, parallel=vit_parallel,
            freeze_tower=freeze_vision,
        )
        merge_chunk = (
            (vision_chunk or 256) if constrain is not None
            else image_embeds.shape[0]  # single chip: one fused scatter
        )
        inputs_embeds = merge_image_embeddings_chunked(
            inputs_embeds, image_embeds, image_indices,
            chunk=merge_chunk, constrain=constrain,
        )
        if constrain is not None:
            inputs_embeds = constrain(inputs_embeds)

    hidden, new_cache, aux = qwen2_decoder(
        params["text"],
        inputs_embeds,
        position_ids,
        cfg.text,
        kv_cache=kv_cache,
        segment_ids=segment_ids,
        attn_impl=attn_impl,
        remat=remat,
        parallel=parallel,
        return_aux=True,
    )

    if logit_positions is not None:
        if (
            parallel is not None
            and kv_cache is None
            and parallel.mesh.shape.get(parallel.axis_cp, 1) > 1
        ):
            hidden = _cp_gather_rows(hidden, logit_positions, parallel)
        else:
            hidden = jnp.take_along_axis(
                hidden, logit_positions[:, :, None], axis=1
            )
    logits = qwen2.lm_head(params["text"], hidden) if head else hidden
    if return_aux:
        return logits, new_cache, aux
    return logits, new_cache


def _cp_gather_rows(hidden, logit_positions, parallel):
    """Budget-row gather from the cp-SHARDED hidden sequence.

    A plain take_along_axis at traced positions makes GSPMD all-gather the
    whole [B, S, H] hidden (671M elements / 1.34 GB bf16 at the stage-4
    1M shape — AOT-verified, benchmarks/aot_fullscale.py). Inside
    shard_map each cp rank contributes its local rows and the [B, M, H]
    results psum — M=8192 rows (84 MB) instead of the full sequence."""
    from jax.sharding import PartitionSpec as P

    def body(h, pos):
        r = jax.lax.axis_index(parallel.axis_cp)
        c = h.shape[1]
        local = pos - r * c  # [B, M] position within this rank's shard
        ok = jnp.logical_and(local >= 0, local < c)
        idx = jnp.clip(local, 0, c - 1)
        rows = jnp.take_along_axis(h, idx[:, :, None], axis=1)
        rows = jnp.where(ok[:, :, None], rows, 0)
        return jax.lax.psum(rows, parallel.axis_cp)

    return jax.shard_map(
        body,
        mesh=parallel.mesh,
        in_specs=(
            P(parallel.axis_dp, parallel.axis_cp, None),
            P(parallel.axis_dp, None),
        ),
        out_specs=P(parallel.axis_dp, None, None),
        check_vma=False,
    )(hidden, logit_positions)


def init_long_vita_params(
    rng: jax.Array, cfg: LongVITAConfig, dtype=jnp.float32
) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    params: Params = {"text": init_qwen2_params(k1, cfg.text, dtype)}
    if cfg.vision is not None:
        params["vision"] = init_vit_params(k2, cfg.vision, dtype)
        params["projector"] = init_projector_params(k3, cfg, dtype)
    return params
