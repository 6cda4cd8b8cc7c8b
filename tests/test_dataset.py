"""Corpus loading, ChatML supervision, greedy packing, collation."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from long_vita_tpu.constants import IGNORE_INDEX
from long_vita_tpu.data.dataset import (
    ChatMLSupervision,
    PackedDataset,
    collate_packs,
    load_corpus,
)
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
    return MultimodalTokenizer(
        tok, image_processor=ImageProcessor(image_size=56),
        image_token_length=4,
    )


def test_load_corpus(tmp_path):
    rows_a = [{"messages": [{"role": "user", "content": f"a{i}"}]}
              for i in range(10)]
    rows_b = [{"messages": [{"role": "user", "content": f"b{i}"}]}
              for i in range(10)]
    (tmp_path / "a.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows_a)
    )
    (tmp_path / "b.json").write_text(json.dumps(rows_b))
    cfg = {
        "dataset": {
            "A": {"ratio": 0.5, "data_paths": [str(tmp_path / "a.jsonl")]},
            "B": {"ratio": 2, "num": 15, "data_paths": [str(tmp_path / "b.json")]},
            "C": {"ratio": 0, "data_paths": [str(tmp_path / "a.jsonl")]},
        }
    }
    import yaml

    (tmp_path / "corpus.yaml").write_text(yaml.safe_dump(cfg))
    corpus = load_corpus(str(tmp_path / "corpus.yaml"), seed=0)
    srcs = [r["source"] for r in corpus]
    assert srcs.count("A") == 5
    assert srcs.count("B") == 15
    assert "C" not in srcs


def test_chatml_supervision_masks(mm):
    sup = ChatMLSupervision(mm)
    sample = {
        "messages": [
            {"role": "user", "content": "What is 2+2?"},
            {"role": "assistant", "content": "4"},
        ]
    }
    ex = sup.render(sample)
    ids, labels = ex.input_ids, ex.labels
    assert len(ids) == len(labels)
    tok = mm.tokenizer
    # user turn fully masked
    supervised = [i for i, l in enumerate(labels) if l != IGNORE_INDEX]
    text_supervised = tok.decode([ids[i] for i in supervised])
    assert "4" in text_supervised
    assert "2+2" not in text_supervised
    # supervised rows are exactly the assistant content + <|im_end|> + \n
    for i in supervised:
        assert labels[i] == ids[i]


def test_supervision_with_image(mm):
    sup = ChatMLSupervision(mm)
    sample = {
        "messages": [
            {"role": "user", "content": "<image>\nWhat?"},
            {"role": "assistant", "content": "A cat."},
        ],
        "images": [Image.new("RGB", (64, 64))],
    }
    ex = sup.render(sample)
    assert ex.images is not None
    # all context tokens masked
    ids = np.asarray(ex.input_ids)
    labels = np.asarray(ex.labels)
    assert np.all(labels[ids == mm.img_ctx] == IGNORE_INDEX)
    # indices point at context tokens
    assert np.all(ids[ex.image_indices[1].reshape(-1)] == mm.img_ctx)


def test_greedy_packing_and_collate(mm):
    sup = ChatMLSupervision(mm)
    samples = [
        {
            "source": "s1",
            "messages": [
                {"role": "user", "content": f"question {i} " + "x " * (i % 7)},
                {"role": "assistant", "content": f"answer {i}"},
            ],
        }
        for i in range(30)
    ]
    ds = PackedDataset(samples, sup, max_len=128, pad_token_id=0)
    packs = list(ds)
    assert len(packs) >= 2
    for p in packs:
        assert p.tokens.shape == (128,)
        assert p.segment_ids.shape == (128,)
        # positions restart at each segment boundary
        seg_starts = np.nonzero(np.diff(p.segment_ids))[0] + 1
        for s in seg_starts:
            if p.tokens[s] != 0:  # not padding
                assert p.position_ids[s] == 0
        # every segment's labels include at least one supervised token
        # (except padding segment)
        n_seg = p.segment_ids.max()
        for seg in range(n_seg):
            seg_labels = p.labels[p.segment_ids == seg]
            assert np.any(seg_labels != IGNORE_INDEX)

    batch = collate_packs(packs[:2], logit_budget=32)
    assert batch["tokens"].shape == (2, 128)
    assert batch["logit_positions"].shape == (2, 32)
    assert batch["labels"].shape == (2, 32)
    # shifted labels: label at logit_position p equals token at p+1
    for b in range(2):
        for j in range(32):
            lab = batch["labels"][b, j]
            if lab != IGNORE_INDEX:
                pos = batch["logit_positions"][b, j]
                assert lab == batch["tokens"][b, pos + 1]


def test_cross_dataset_joint_packing(mm):
    sup = ChatMLSupervision(mm)
    samples = [
        {
            "source": f"s{i % 3}",
            "messages": [
                {"role": "user", "content": "q " * 5},
                {"role": "assistant", "content": "a " * 5},
            ],
        }
        for i in range(12)
    ]
    ds = PackedDataset(
        samples, sup, max_len=96, pad_token_id=0, cross_dataset_joint=True
    )
    packs = list(ds)
    total_real = sum(
        int(np.sum(p.tokens != 0)) for p in packs
    )
    assert total_real > 0
    assert all(p.tokens.shape == (96,) for p in packs)


def test_prefetch_iterator():
    from long_vita_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    import pytest as _pytest

    it = prefetch(boom())
    assert next(it) == 1
    with _pytest.raises(ValueError):
        list(it)
