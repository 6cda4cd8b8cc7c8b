"""Host feedworker benchmark: native u8 / native float / PIL, fps per core.

Measures the three preprocessing paths on the same 720p->448 workload
(expand2square + antialiased bicubic + normalize). best-of-N isolates this
container's erratic CPU quota (see PERF.md "Host feedworker").

Usage: python benchmarks/feedworker_bench.py [--frames 64] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--h", type=int, default=720)
    parser.add_argument("--w", type=int, default=1280)
    args = parser.parse_args()

    from PIL import Image

    from long_vita_tpu.constants import (
        IMAGENET_DEFAULT_MEAN as MEAN, IMAGENET_DEFAULT_STD as STD,
    )
    from long_vita_tpu.data import native
    from long_vita_tpu.data.image_processor import ImageProcessor

    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 256, size=(args.frames, args.h, args.w, 3), dtype=np.uint8
    )
    out = {}

    if native.available():
        for prec in ("u8", "float"):
            native.preprocess_frames(
                frames[:2], 448, MEAN, STD, num_threads=1, precision=prec
            )
            best = 1e9
            for _ in range(args.reps):
                t0 = time.time()
                native.preprocess_frames(
                    frames, 448, MEAN, STD, num_threads=1, precision=prec
                )
                best = min(best, time.time() - t0)
            out[f"native_{prec}_fps_per_core"] = round(args.frames / best, 1)
            log(f"native {prec}: {args.frames/best:.1f} fps/core")
    else:
        log("native library unavailable")

    proc = ImageProcessor(image_size=448)

    def pil_one(f):
        img = proc._expand2square(Image.fromarray(f))
        img = img.resize((448, 448), Image.Resampling.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - proc.mean) / proc.std

    n_pil = min(16, args.frames)
    best = 1e9
    for _ in range(args.reps):
        t0 = time.time()
        for f in frames[:n_pil]:
            pil_one(f)
        best = min(best, time.time() - t0)
    out["pil_fps"] = round(n_pil / best, 1)
    log(f"PIL: {n_pil/best:.1f} fps")

    out["metric"] = "feedworker_fps_per_core"
    out["value"] = out.get("native_u8_fps_per_core", out["pil_fps"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
