"""Recipe guardrails: geometry validation + logit-budget fail-loud.

VERDICT round-1 #10: a dense-SFT run must not silently train on a fraction
of its supervised tokens, and a 72B tp8/pp8 recipe must be geometry-checked
before any compile.
"""
import numpy as np
import pytest
import yaml

from long_vita_tpu.config import long_vita_72b, long_vita_14b
from long_vita_tpu.parallel.mesh import MeshConfig, validate_geometry

REPO = "/root/repo"


def test_72b_tp8pp8_geometry_valid():
    cfg = long_vita_72b()
    # 64 q heads / 8, 8 kv heads / 8, vocab 152064 / 8, mlp 29568 / 8,
    # 80 layers / 8 — the tp8/pp8 recipe class must divide cleanly
    validate_geometry(cfg.text, MeshConfig(dp=1, pp=8, tp=8), seq_len=32768)


def test_14b_stage4_geometry_valid():
    validate_geometry(
        long_vita_14b().text, MeshConfig(cp=8, tp=8), seq_len=1048576
    )


def test_geometry_rejects_bad_splits():
    cfg = long_vita_72b()
    with pytest.raises(ValueError, match="layers"):
        validate_geometry(cfg.text, MeshConfig(pp=3))
    with pytest.raises(ValueError, match="heads"):
        validate_geometry(cfg.text, MeshConfig(tp=48))
    with pytest.raises(ValueError, match="mutually exclusive"):
        validate_geometry(cfg.text, MeshConfig(pp=2, cp=2))
    with pytest.raises(ValueError, match="zigzag"):
        validate_geometry(cfg.text, MeshConfig(cp=8), seq_len=1000)


def test_72b_recipe_parses_and_validates():
    with open(f"{REPO}/configs/stage1_72b_tp8pp8.yaml") as f:
        r = yaml.safe_load(f)
    mesh = MeshConfig(**r["mesh"])
    assert mesh.tp == 8 and mesh.pp == 8
    validate_geometry(
        long_vita_72b().text, mesh, seq_len=r["data"]["seq_len"]
    )
    # GPipe microbatching needs batch % pp == 0
    assert r["run"]["global_batch"] % mesh.pp == 0
    # dense alignment stage: the budget must cover the whole sequence
    assert r["data"]["logit_budget"] >= r["data"]["seq_len"]


def test_all_stage_recipes_pass_geometry():
    import glob

    for path in glob.glob(f"{REPO}/configs/stage*.yaml"):
        with open(path) as f:
            r = yaml.safe_load(f)
        mesh = MeshConfig(**r.get("mesh", {}))
        cfg = long_vita_72b() if "72b" in path else long_vita_14b()
        validate_geometry(cfg.text, mesh, seq_len=r["data"]["seq_len"])


def test_logit_budget_drop_raises_by_default():
    from long_vita_tpu.data.dataset import Pack, collate_packs

    n = 64
    tokens = np.arange(n, dtype=np.int32)
    labels = tokens.copy()  # fully dense supervision
    pack = Pack(
        tokens=tokens, labels=labels,
        position_ids=np.arange(n, dtype=np.int32),
        segment_ids=np.zeros(n, np.int32),
        images=None, image_indices=None, actual_seq_len=[n],
    )
    with pytest.raises(ValueError, match="logit budget"):
        collate_packs([pack], logit_budget=8)
    # explicit opt-in keeps the old warn-and-drop behavior
    batch = collate_packs([pack], logit_budget=8, on_drop="warn")
    assert batch["labels"].shape == (1, 8)
    # a sufficient budget never raises
    batch = collate_packs([pack], logit_budget=n)
    assert batch["labels"].shape == (1, n)


def test_72b_fsdp_recipe_geometry():
    with open(f"{REPO}/configs/stage1_72b_tp8fsdp8.yaml") as f:
        r = yaml.safe_load(f)
    mesh = MeshConfig(**r["mesh"])
    cfg = long_vita_72b()
    validate_geometry(cfg.text, mesh, seq_len=r["data"]["seq_len"])
    assert r["run"]["fsdp"] is True
    # fsdp shards an INTERIOR weight dim over dp (never the layer dim —
    # that makes the layer scan's slice cross-shard and XLA gathers the
    # whole stack in-loop; parallel/sharding.py): the hidden and mlp
    # dims must divide dp for clean per-layer streaming
    assert cfg.text.hidden_size % mesh.dp == 0
    assert cfg.text.intermediate_size % mesh.dp == 0
    assert r["run"]["global_batch"] % mesh.dp == 0
