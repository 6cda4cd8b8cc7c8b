"""Image processor + tag expansion tests (token-structure parity with the
reference's get_external_inputs, tools/inference_long_vita.py:568-775)."""
import os

import numpy as np
import pytest
from PIL import Image

from long_vita_tpu import constants as C
from long_vita_tpu.data.image_processor import ImageProcessor
from long_vita_tpu.data.multimodal import MultimodalTokenizer

REF_TOK = "/root/reference/long_vita/models/long_vita_qwen2_intern"


@pytest.fixture(scope="module")
def mm():
    transformers = pytest.importorskip("transformers")
    if not os.path.isdir(REF_TOK):
        pytest.skip("tokenizer assets unavailable")
    tok = transformers.Qwen2Tokenizer(
        vocab_file=f"{REF_TOK}/vocab.json", merges_file=f"{REF_TOK}/merges.txt"
    )
    return MultimodalTokenizer(tok)


def test_expand2square_and_normalize():
    proc = ImageProcessor()
    img = Image.new("RGB", (100, 50), (255, 0, 0))
    out = proc.process_images([img])
    assert out.shape == (1, 448, 448, 3)
    # center rows are red, top/bottom are mean-padding (normalizes to ~0)
    top = out[0, 10, 224]
    assert np.allclose(top, 0.0, atol=0.05)
    mid_r = out[0, 224, 224, 0]
    assert mid_r > 2.0  # (1.0 - 0.485) / 0.229


def test_dynamic_tiling_grid_selection():
    proc = ImageProcessor()
    wide = Image.new("RGB", (1000, 450))
    tiles, (gw, gh) = proc.process_dynamic(wide)
    cols, rows = gw // 448, gh // 448
    assert cols > rows  # wide image gets a wide grid
    assert tiles.shape[0] == cols * rows + 1  # + thumbnail
    square_small = Image.new("RGB", (100, 100))
    tiles, _ = proc.process_dynamic(square_small)
    assert tiles.shape[0] == 1  # single tile, no thumbnail


def test_image_tag_expansion_structure(mm):
    ids = mm.tokenizer("describe <image> please", add_special_tokens=False).input_ids
    img = Image.new("RGB", (900, 440))
    out = mm.expand(ids, images=[img])
    t = mm.image_token_length
    n_ctx = sum(1 for x in out.input_ids if x == mm.img_ctx)
    n_patch_ctx = sum(1 for x in out.input_ids if x == mm.patch_ctx)
    assert n_ctx == t  # one <img> block (thumbnail)
    grid_tiles = out.images.shape[0] - 1
    assert n_patch_ctx == grid_tiles * t
    assert out.image_indices.shape == (2, out.images.shape[0], t)
    # every index points at a context token
    ids_arr = np.asarray(out.input_ids)
    pointed = ids_arr[out.image_indices[1].reshape(-1)]
    assert set(pointed.tolist()) <= {mm.img_ctx, mm.patch_ctx}
    # tag removed, original text preserved around it
    assert mm.img_tag not in out.input_ids


def test_single_tile_image_no_patches(mm):
    ids = mm.tokenizer("x <image>", add_special_tokens=False).input_ids
    out = mm.expand(ids, images=[Image.new("RGB", (80, 80))])
    assert out.images.shape[0] == 1
    assert sum(1 for x in out.input_ids if x == mm.patch_ctx) == 0
    assert out.input_ids.count(mm.img_start) == 1
    assert out.input_ids.count(mm.img_end) == 1


def test_video_frame_expansion(mm):
    ids = mm.tokenizer("watch <video> now", add_special_tokens=False).input_ids
    frames = [Image.new("RGB", (64, 64)) for _ in range(5)]
    out = mm.expand(ids, videos=[frames])
    t = mm.image_token_length
    assert out.images.shape[0] == 5
    assert sum(1 for x in out.input_ids if x == mm.vid_ctx) == 5 * t
    assert out.input_ids.count(mm.vid_start) == 5
    ids_arr = np.asarray(out.input_ids)
    pointed = ids_arr[out.image_indices[1].reshape(-1)]
    assert set(pointed.tolist()) == {mm.vid_ctx}


def test_mixed_image_and_video(mm):
    ids = mm.tokenizer(
        "a <image> b <video> c", add_special_tokens=False
    ).input_ids
    out = mm.expand(
        ids,
        images=[Image.new("RGB", (50, 50))],
        videos=[[Image.new("RGB", (50, 50))] * 2],
    )
    assert out.images.shape[0] == 3  # 1 tile + 2 frames
    assert out.image_indices.shape[1] == 3
    ids_arr = np.asarray(out.input_ids)
    pointed = ids_arr[out.image_indices[1].reshape(-1)]
    assert set(pointed.tolist()) == {mm.img_ctx, mm.vid_ctx}


def test_anyres_tiling():
    proc = ImageProcessor(process_type="anyres", max_patch_grid=6)
    wide = Image.new("RGB", (1000, 450))
    tiles, (cw, ch) = proc.process_anyres(wide)
    assert cw % 448 == 0 and ch % 448 == 0
    n_crops = (cw // 448) * (ch // 448)
    assert tiles.shape[0] == n_crops + 1  # full image first
    # square small image -> single tile
    tiles, best = proc.process_anyres(Image.new("RGB", (100, 100)))
    assert tiles.shape[0] == 1 and best == (448, 448)
    # dispatcher respects process_type
    t2, _ = proc.process_images_with_subpatch(wide)
    assert t2.shape == tiles.shape or t2.shape[0] == n_crops + 1


@pytest.mark.slow
def test_special_token_ids_match_reference_runtime():
    """Production loader: Qwen built-ins (<=151664) from tokenizer_config,
    then the 17 multimodal tokens appended at 151665+ exactly as the
    reference's update_tokenizer assigns them at runtime."""
    from long_vita_tpu.tokenizer import SPECIAL_TOKENS, load_tokenizer

    tok = load_tokenizer(REF_TOK)
    assert tok.convert_tokens_to_ids("<|im_start|>") == 151644
    assert tok.convert_tokens_to_ids("<|im_end|>") == 151645
    ids = [tok.convert_tokens_to_ids(t) for t in SPECIAL_TOKENS]
    assert ids == list(range(151665, 151665 + len(SPECIAL_TOKENS))), ids
    # within the released embedding table (vocab_size 152064)
    assert max(ids) < 152064
