"""Native C++ feedworker vs the PIL reference path."""
import numpy as np
import pytest
from PIL import Image

from long_vita_tpu.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
from long_vita_tpu.data import native
from long_vita_tpu.data.image_processor import ImageProcessor

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _pil_reference(frame: np.ndarray, size: int) -> np.ndarray:
    proc = ImageProcessor(image_size=size)
    img = proc._expand2square(Image.fromarray(frame))
    img = img.resize((size, size), Image.Resampling.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - proc.mean) / proc.std


@pytest.mark.parametrize("h,w", [(448, 448), (720, 1280), (100, 80)])
def test_native_u8_matches_pil_exactly(h, w):
    """The default (u8 fixed-point) path is BIT-EXACT vs the reference's
    actual uint8 PIL pipeline: same int32 weights at 2^22, same uint8-
    clipped intermediate between the passes. The residual ~5e-7 is float32
    rounding in the final normalize, not a pixel difference."""
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, h, w, 3), dtype=np.uint8)
    got = native.preprocess_frames(
        frames, 448, IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
    )
    assert got.shape == (3, 448, 448, 3)
    for i in range(3):
        want = _pil_reference(frames[i], 448)
        np.testing.assert_allclose(got[i], want, rtol=0, atol=1e-6, err_msg=f"{h}x{w}")


@pytest.mark.parametrize("h,w", [(448, 448), (720, 1280), (100, 80)])
def test_native_float_matches_pil_closely(h, w):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, h, w, 3), dtype=np.uint8)
    got = native.preprocess_frames(
        frames, 448, IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD,
        precision="float",
    )
    for i in range(3):
        # uint8-mode PIL quantizes filter weights and rounds/clips between
        # the two passes; the float path matches PIL FLOAT mode exactly
        # (below), so only mean error vs uint8 PIL is comparable here.
        want = _pil_reference(frames[i], 448)
        assert np.abs(got[i] - want).mean() < 0.01, (h, w)


def test_native_matches_float_pil_exactly():
    """Against float-mode PIL (no fixed-point), the float path is exact."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(100, 100, 3), dtype=np.uint8)
    got = native.preprocess_frames(
        img[None], 448, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
        precision="float",
    )[0]
    want = np.stack(
        [
            np.asarray(
                Image.fromarray(img[:, :, c].astype(np.float32)).resize(
                    (448, 448), Image.Resampling.BICUBIC
                ),
                np.float32,
            )
            for c in range(3)
        ],
        axis=-1,
    ) / 255.0
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_process_images_uses_native_for_frame_batches():
    rng = np.random.default_rng(1)
    frames = [
        rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    proc = ImageProcessor()
    out = proc.process_images(frames)
    assert out.shape == (4, 448, 448, 3)
    # the u8 native path is now the default: exact vs the PIL pipeline
    want = _pil_reference(frames[0], 448)
    np.testing.assert_allclose(out[0], want, rtol=0, atol=1e-6)


def test_crop_tiles():
    rng = np.random.default_rng(2)
    tile = 32
    img = rng.integers(0, 256, size=(2 * tile, 3 * tile, 3), dtype=np.uint8)
    out = native.crop_tiles(
        img, 2, 3, tile, IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
    )
    assert out.shape == (6, tile, tile, 3)
    mean = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32)
    std = np.asarray(IMAGENET_DEFAULT_STD, np.float32)
    want = (img[:tile, :tile].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out[0], want, rtol=1e-5, atol=1e-5)
    want5 = (
        img[tile:, 2 * tile :].astype(np.float32) / 255.0 - mean
    ) / std
    np.testing.assert_allclose(out[5], want5, rtol=1e-5, atol=1e-5)
