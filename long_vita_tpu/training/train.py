"""Training entry point: `python -m long_vita_tpu.training.train --config ...`.

Replaces the reference's pretrain_long_vita.py __main__ + per-stage bash
scripts (SURVEY.md C19/C26). See configs/stage*.yaml for the four released
stage recipes translated to this schema.
"""
from __future__ import annotations

import argparse
import logging

import yaml

import jax
import jax.numpy as jnp

from long_vita_tpu.data.image_processor import ImageProcessor
from long_vita_tpu.data.multimodal import MultimodalTokenizer
from long_vita_tpu.parallel.mesh import MeshConfig
from long_vita_tpu.training.optimizer import OptimizerConfig
from long_vita_tpu.training.trainer import (
    Trainer,
    TrainerConfig,
    make_data_pipeline,
)

logger = logging.getLogger(__name__)


def load_recipe(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def build_from_recipe(recipe: dict):
    model_cfg = recipe.get("model", {})
    data_cfg = recipe.get("data", {})
    mesh_cfg = MeshConfig(**recipe.get("mesh", {}))
    optim_cfg = OptimizerConfig(**{
        k: (tuple(v) if k == "betas" else v)
        for k, v in recipe.get("optim", {}).items()
    })
    run = recipe.get("run", {})

    tcfg = TrainerConfig(
        seq_len=data_cfg.get("seq_len", 16384),
        logit_budget=data_cfg.get("logit_budget", 4096),
        global_batch=run.get("global_batch", 1),
        micro_batch=run.get("micro_batch", 0),
        steps=run.get("steps", 100),
        log_interval=run.get("log_interval", 1),
        save_interval=run.get("save_interval", 0),
        save_dir=run.get("save_dir"),
        mesh=mesh_cfg,
        optim=optim_cfg,
        remat=run.get("remat", True),
        vision_chunk=data_cfg.get("vision_chunk", 256),
        seed=run.get("seed", 42),
        cp_algo=run.get("cp_algo", "ring"),
        cp_inner=run.get("cp_inner", 1),
        cp_window=run.get("cp_window_size", 0),
        virtual_pp=run.get("virtual_pp", 1),
        output_dir=run.get("output_dir"),
        fsdp=run.get("fsdp", False),
        profile_steps=(
            tuple(run["profile_steps"]) if run.get("profile_steps") else None
        ),
        allow_logit_drop=data_cfg.get("allow_logit_drop", False),
    )

    from long_vita_tpu.tokenizer import load_tokenizer

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        model_cfg.get("dtype", "bfloat16")
    ]
    if model_cfg.get("graft"):
        # stage-1 bootstrap: stock Qwen2 + stock InternViT (reference
        # finetune_long_vita.py:480-530 grafting)
        from long_vita_tpu.utils.graft import graft_checkpoints

        g = model_cfg["graft"]
        params, cfg = graft_checkpoints(g["llm"], g["vit"], dtype=dtype)
        tokenizer = load_tokenizer(g["llm"])
    else:
        from long_vita_tpu.utils.checkpoint_io import load_long_vita_checkpoint

        ckpt = model_cfg["checkpoint"]
        params, cfg = load_long_vita_checkpoint(ckpt, dtype=dtype)
        tokenizer = load_tokenizer(ckpt)

    if model_cfg.get("load_stage"):  # stage handoff: params from prev stage
        from long_vita_tpu.training.checkpoint import restore_params_only

        params = restore_params_only(model_cfg["load_stage"], params)

    if model_cfg.get("lora"):
        # parameter-efficient finetuning (reference --lora-r/-alpha/
        # -target-modules); base weights freeze via optim.lora_only
        import dataclasses as _dc

        from long_vita_tpu.training.lora import LoraConfig, add_lora_params

        lspec = model_cfg["lora"]
        lcfg = LoraConfig(
            r=lspec.get("r", 16),
            alpha=lspec.get("alpha", 32),
            targets=tuple(lspec.get(
                "targets", ("q_proj", "k_proj", "v_proj", "o_proj")
            )),
        )
        params, text_cfg = add_lora_params(
            params, cfg.text, lcfg, jax.random.PRNGKey(tcfg.seed),
            dtype=dtype,
        )
        cfg = _dc.replace(cfg, text=text_cfg)
        if lspec.get("lora_only", True):
            tcfg = _dc.replace(
                tcfg, optim=_dc.replace(tcfg.optim, lora_only=True)
            )

    mm = MultimodalTokenizer(
        tokenizer,
        image_processor=ImageProcessor(
            min_patch_grid=data_cfg.get("min_patch_grid", 1),
            max_patch_grid=data_cfg.get("max_patch_grid", 12),
        ),
        max_num_frame=data_cfg.get("max_num_frame", 4096),
        max_fps=data_cfg.get("max_fps", 1.0),
    )

    trainer = Trainer(params, cfg, tcfg)
    batches = make_data_pipeline(
        data_cfg["corpus"], mm, tcfg,
        pad_token_id=tokenizer.pad_token_id or 151643,
        default_system_message=data_cfg.get("system_message"),
        cross_dataset_joint=data_cfg.get("cross_dataset_joint", False),
    )
    return trainer, batches, tokenizer


def main(argv=None):
    from long_vita_tpu.training.distributed import maybe_initialize
    from long_vita_tpu.utils.compile_cache import enable as _enable_cache

    maybe_initialize()  # multi-host pods: LVT_COORDINATOR/.. env contract
    _enable_cache()
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    args = parser.parse_args(argv)
    trainer, batches, tokenizer = build_from_recipe(load_recipe(args.config))
    trainer.train(batches, tokenizer=tokenizer)


if __name__ == "__main__":
    main()
