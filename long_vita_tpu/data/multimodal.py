"""Tag expansion: turn <image>/<video> placeholders into context-token runs
and build the (images, image_indices) scatter inputs.

Behavioral parity target: reference get_external_inputs
(tools/inference_long_vita.py:568-775, same logic as
long_vita_megatron/tasks/inference/module.py:493):

  <image>  ->  <img> IMG_CONTEXT*256 </img>
               [if >1 tile: per grid row: "\n", then per tile:
                <patch> PATCH_CONTEXT*256 </patch>]
  <video>  ->  per frame: <vid> VID_CONTEXT*256 </vid>

The tile stack order is [thumbnail, row-major grid tiles] (thumbnail feeds
the <img> block); image_indices is [2, N_tiles, 256] of (batch, seq)
positions aimed at the context-token runs. Images are expanded first, then
videos, matching the reference's two passes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from long_vita_tpu import constants as C
from long_vita_tpu.data.image_processor import ImageProcessor


@dataclasses.dataclass
class ExpandedInputs:
    input_ids: list[int]
    images: Optional[np.ndarray]  # [N, 448, 448, 3] f32 or None
    image_indices: Optional[np.ndarray]  # [2, N, T] int64 or None


class MultimodalTokenizer:
    """HF tokenizer + ImageProcessor + tag expansion."""

    def __init__(
        self,
        tokenizer,
        image_processor: Optional[ImageProcessor] = None,
        image_token_length: int = C.IMAGE_TOKEN_LENGTH,
        max_num_frame: int = 4096,
        max_fps: float = 1.0,
    ):
        from long_vita_tpu.tokenizer import update_tokenizer

        self.tokenizer = update_tokenizer(tokenizer)
        self.processor = image_processor or ImageProcessor()
        self.image_token_length = image_token_length
        self.max_num_frame = max_num_frame
        self.max_fps = max_fps

        def one_id(tok: str) -> int:
            ids = self.tokenizer(tok, add_special_tokens=False).input_ids
            assert len(ids) == 1, (tok, ids)
            return ids[0]

        self.img_tag = one_id(C.IMG_TAG_TOKEN)
        self.vid_tag = one_id(C.VID_TAG_TOKEN)
        self.img_start = one_id(C.IMG_START_TOKEN)
        self.img_end = one_id(C.IMG_END_TOKEN)
        self.img_ctx = one_id(C.IMG_CONTEXT_TOKEN)
        self.vid_start = one_id(C.VID_START_TOKEN)
        self.vid_end = one_id(C.VID_END_TOKEN)
        self.vid_ctx = one_id(C.VID_CONTEXT_TOKEN)
        self.patch_start = one_id(C.PATCH_START_TOKEN)
        self.patch_end = one_id(C.PATCH_END_TOKEN)
        self.patch_ctx = one_id(C.PATCH_CONTEXT_TOKEN)
        self.nl_tokens = self.tokenizer("\n", add_special_tokens=False).input_ids

    # -- block builders -------------------------------------------------

    def _block(self, ids: list[int], start: int, ctx: int, end: int,
               indices: list[np.ndarray]) -> None:
        t = self.image_token_length
        ids.append(start)
        seq = np.arange(len(ids), len(ids) + t, dtype=np.int64)
        indices.append(np.stack([np.zeros(t, np.int64), seq]))
        ids.extend([ctx] * t)
        ids.append(end)

    def _expand_image(self, ids: list[int], image, indices, images) -> None:
        tiles, (grid_w, grid_h) = self.processor.process_dynamic(image)
        images.append(tiles)
        self._block(ids, self.img_start, self.img_ctx, self.img_end, indices)
        if len(tiles) > 1:
            for _row in range(0, grid_h, self.processor.patch_size):
                ids.extend(self.nl_tokens)
                for _col in range(0, grid_w, self.processor.patch_size):
                    self._block(
                        ids, self.patch_start, self.patch_ctx,
                        self.patch_end, indices,
                    )

    def _expand_video(self, ids: list[int], video, indices, images) -> None:
        if isinstance(video, str):
            frames = self.processor.process_video(
                video, self.max_num_frame, self.max_fps
            )
        else:  # pre-extracted frame list
            frames = self.processor.process_images(video)
        images.append(frames)
        for _ in range(len(frames)):
            self._block(ids, self.vid_start, self.vid_ctx, self.vid_end, indices)

    # -- public API ------------------------------------------------------

    def expand(
        self,
        input_ids: Sequence[int],
        images: Sequence = (),
        videos: Sequence = (),
    ) -> ExpandedInputs:
        """Expand tags in a tokenized prompt.

        images: list of paths / PIL images / arrays, one per <image> tag.
        videos: list of video paths (or frame lists), one per <video> tag.
        """
        ids = list(input_ids)
        tile_stacks: list[np.ndarray] = []
        indices: list[np.ndarray] = []

        # pass 1: images
        img_positions = [i for i, x in enumerate(ids) if x == self.img_tag]
        assert len(img_positions) == len(images), (img_positions, len(images))
        if img_positions:
            new_ids: list[int] = []
            cursor = 0
            for tag_pos, image in zip(img_positions, images):
                new_ids.extend(ids[cursor:tag_pos])
                self._expand_image(new_ids, image, indices, tile_stacks)
                cursor = tag_pos + 1
            new_ids.extend(ids[cursor:])
            ids = new_ids

        # pass 2: videos
        vid_positions = [i for i, x in enumerate(ids) if x == self.vid_tag]
        assert len(vid_positions) == len(videos), (vid_positions, len(videos))
        if vid_positions:
            new_ids = []
            cursor = 0
            for tag_pos, video in zip(vid_positions, videos):
                new_ids.extend(ids[cursor:tag_pos])
                self._expand_video(new_ids, video, indices, tile_stacks)
                cursor = tag_pos + 1
            new_ids.extend(ids[cursor:])
            ids = new_ids

        if not tile_stacks:
            return ExpandedInputs(ids, None, None)
        return ExpandedInputs(
            ids,
            np.concatenate(tile_stacks, axis=0),
            np.stack(indices, axis=1),  # [2, N_tiles, T]
        )

    def encode_chat(
        self, messages: list[dict], add_generation_prompt: bool = True
    ) -> list[int]:
        """ChatML render via the HF chat template (Qwen2.5 format)."""
        return self.tokenizer.apply_chat_template(
            messages, add_generation_prompt=add_generation_prompt, tokenize=True
        )
