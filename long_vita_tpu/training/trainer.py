"""Training driver: stage recipes -> data pipeline -> sharded train loop.

Replaces the reference's entry glue (pretrain_long_vita.py + the bash stage
scripts of SURVEY.md C26). A stage recipe is one YAML file (configs/*.yaml
in this repo) instead of a 240-line bash script + Megatron argparse fork:

    model: {checkpoint: ..., load_stage: ...}   # or random init for tests
    data:  {corpus: path.yaml, seq_len: 1048576, logit_budget: 8192,
            max_num_frame: 4096, max_patch_grid: 12, ...}
    mesh:  {dp: 1, cp: 8, tp: 8}
    optim: {lr: 5e-6, warmup_steps: 10, total_steps: 500,
            freeze_vision: true, vit_lr_mult: 0.1, ...}
    run:   {global_batch: 8, save_interval: 20, save_dir: ..., steps: 500}

Auxiliary behaviors mirrored from the reference: NaN tripwire per step
(pretrain_long_vita.py:822-827), first-batch decode dump
(print_batch semantics :699-774), throughput logging (--log-throughput).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from long_vita_tpu.config import LongVITAConfig
from long_vita_tpu.data.dataset import (
    ChatMLSupervision,
    PackedDataset,
    collate_packs,
    load_corpus,
)
from long_vita_tpu.data.multimodal import MultimodalTokenizer
from long_vita_tpu.parallel.mesh import MeshConfig, make_mesh
from long_vita_tpu.parallel.zigzag import (
    inverse_zigzag_permutation,
    zigzag_permute,
)
from long_vita_tpu.training.optimizer import OptimizerConfig, make_optimizer
from long_vita_tpu.training.train_step import init_train_state, make_train_step

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    seq_len: int = 16384
    logit_budget: int = 4096
    global_batch: int = 1
    micro_batch: int = 0  # rows per device step; 0 = global_batch (no
    # accumulation). GBS 8 @ mbs 1 (stage-4) runs 8 accumulation
    # micro-steps per optimizer step, like the reference's Megatron loop.
    steps: int = 100
    log_interval: int = 1
    save_interval: int = 0
    save_dir: Optional[str] = None
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    optim: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    remat: bool | str = True  # True/"full" | "dots" | False
    vision_chunk: int = 64  # ViT tile batch: 64 is the v5e sweet spot
    # (97 fps vs 84 at 128 — benchmarks/vit_throughput.py); the reference's
    # 256-image chunking (pretrain_long_vita.py:522-533) is a memory bound,
    # not a throughput optimum
    seed: int = 42
    cp_algo: str = "ring"  # "ring" | "ulysses" | "hybrid"
    cp_inner: int = 1  # hybrid: ulysses lanes per ring group
    cp_window: int = 0  # double-ring window size (reference --cp-window-size)
    virtual_pp: int = 1  # interleaved-pipeline chunks per pp stage
    fsdp: bool = False  # shard layer-stacked params over dp (ZeRO-3 style)
    resume: bool = True  # auto-resume from save_dir's latest checkpoint
    straggler_threshold: float = 2.0  # warn when a step takes > thr x median
    output_dir: Optional[str] = None  # metrics.jsonl / print_batch / profile
    profile_steps: Optional[tuple[int, int]] = None  # (start, stop) trace
    allow_logit_drop: bool = False  # True: warn (not fail) when the logit
    # budget drops supervised rows — only for deliberately-sparse recipes


def batch_iterator(
    packs: Iterator,
    batch_size: int,
    logit_budget: int,
    cp: int,
    cp_algo: str = "ring",
    cp_inner: int = 1,
    on_drop: str = "error",
) -> Iterator[dict]:
    """Group packs into batches; zigzag-permute for ring context
    parallelism. Ulysses keeps contiguous shards; hybrid zigzags over the
    ring GROUPS (cp // cp_inner)."""
    if cp_algo == "ulysses":
        cp = 1  # no permutation needed
    elif cp_algo == "hybrid":
        cp = cp // cp_inner
    buf = []
    inv = None
    for pack in packs:
        buf.append(pack)
        if len(buf) < batch_size:
            continue
        batch = collate_packs(buf, logit_budget, on_drop=on_drop)
        buf = []
        if cp > 1:
            seq_len = batch["tokens"].shape[1]
            if inv is None:
                inv = inverse_zigzag_permutation(seq_len, cp)
            for key in ("tokens", "positions", "segment_ids"):
                batch[key] = np.asarray(
                    zigzag_permute(jnp.asarray(batch[key]), cp)
                )
            batch["logit_positions"] = inv[batch["logit_positions"]]
            if batch["image_indices"] is not None:
                idx = batch["image_indices"].copy()
                idx[1] = inv[idx[1]]
                batch["image_indices"] = idx
        yield batch


class Trainer:
    def __init__(
        self,
        params: Any,
        cfg: LongVITAConfig,
        tcfg: TrainerConfig,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        from long_vita_tpu.parallel.mesh import validate_geometry

        validate_geometry(
            cfg.text, tcfg.mesh, seq_len=tcfg.seq_len,
            virtual_pp=tcfg.virtual_pp,
        )
        self.mesh = make_mesh(tcfg.mesh) if tcfg.mesh.size > 1 else None
        self.tx = make_optimizer(
            params, tcfg.optim,
            num_vit_layers=(cfg.vision.num_hidden_layers if cfg.vision else 0),
        )
        self.state = init_train_state(
            params, self.tx, self.mesh, fsdp=tcfg.fsdp,
            virtual_pp=tcfg.virtual_pp,
        )
        # interleaved-pp runs hold layer stacks chunk-major; checkpoints
        # record the layout so a restore into a different geometry fails
        # loudly instead of silently scrambling layer order
        self.layer_layout = (
            (tcfg.mesh.pp, tcfg.virtual_pp)
            if tcfg.mesh.pp > 1 and tcfg.virtual_pp > 1 else (1, 1)
        )
        self.start_step = 0
        if tcfg.resume and tcfg.save_dir:
            # recovery = relaunch + resume (reference --save-interval flow)
            from long_vita_tpu.training.checkpoint import (
                latest_step,
                load_checkpoint,
            )

            step = latest_step(tcfg.save_dir)
            if step is not None:
                logger.info("resuming from %s step %d", tcfg.save_dir, step)
                self.state = load_checkpoint(
                    tcfg.save_dir, self.state,
                    layer_layout=self.layer_layout,
                )
                self.start_step = step
        self.accum = 1
        if tcfg.micro_batch and tcfg.micro_batch < tcfg.global_batch:
            if tcfg.global_batch % tcfg.micro_batch:
                raise ValueError(
                    f"global_batch {tcfg.global_batch} % micro_batch "
                    f"{tcfg.micro_batch} != 0"
                )
            self.accum = tcfg.global_batch // tcfg.micro_batch
        step_kw = dict(
            use_ring=tcfg.mesh.cp > 1 or tcfg.mesh.pp > 1,
            cp_algo=tcfg.cp_algo,
            cp_inner=tcfg.cp_inner,
            cp_window=tcfg.cp_window,
            virtual_pp=tcfg.virtual_pp,
            remat=tcfg.remat,
            vision_chunk=tcfg.vision_chunk,
            freeze_vision=tcfg.optim.freeze_vision,
            # stop-gradient the whole text tree (skips every frozen dW,
            # the reference's requires_grad=False semantics) — UNLESS LoRA
            # adapters live inside it (lora_only freezes base weights via
            # the optimizer mask; adapters must keep their grads)
            freeze_text=(
                tcfg.optim.freeze_text and not tcfg.optim.lora_only
            ),
        )
        if self.accum > 1:
            from long_vita_tpu.training.train_step import (
                make_grad_accum_steps,
            )

            self.grad_fn, self.accum_fn, self.apply_fn = (
                make_grad_accum_steps(cfg, self.tx, self.mesh, **step_kw)
            )
            self.step_fn = None
        else:
            self.step_fn = make_train_step(
                cfg, self.tx, self.mesh, **step_kw
            )

    def evaluate(self, batches: Iterator[dict], max_steps: int = 0) -> dict:
        """Mean loss over a validation stream (reference valid datasets)."""
        import jax

        from long_vita_tpu.training.train_step import (
            loss_fn,
            make_parallel_config,
        )

        parallel = make_parallel_config(
            self.mesh, cp_algo=self.tcfg.cp_algo,
            cp_inner=self.tcfg.cp_inner, cp_window=self.tcfg.cp_window,
        )
        eval_fn = jax.jit(
            lambda p, b: loss_fn(
                p, b, self.cfg, parallel, False, self.tcfg.vision_chunk
            )
        )
        total, count = 0.0, 0.0
        for step, batch in enumerate(batches):
            if max_steps and step >= max_steps:
                break
            batch = {
                k: (jnp.asarray(v) if v is not None else None)
                for k, v in batch.items()
            }
            loss, tokens = eval_fn(self.state.params, batch)
            total += float(loss) * float(tokens)
            count += float(tokens)
        return {"loss": total / max(count, 1.0), "tokens": count}

    def train(self, batches: Iterator[dict], tokenizer=None) -> dict:
        tcfg = self.tcfg
        history = []
        step_times: list[float] = []
        metrics_log = profiler = None
        if tcfg.output_dir:
            from long_vita_tpu.utils.metrics import MetricsLogger, Profiler

            metrics_log = MetricsLogger(tcfg.output_dir)
            if tcfg.profile_steps:
                profiler = Profiler(tcfg.output_dir, *tcfg.profile_steps)
        first_batch_dumped = False
        t_last = time.time()

        def device_batch(batch):
            if jax.process_count() > 1 and self.mesh is not None:
                # multi-controller: this host's dp rows -> global arrays
                # (the reference's TP-rank-0 read + broadcast analogue,
                # training/utils.py:410-481)
                from long_vita_tpu.training.distributed import (
                    make_global_batch,
                )

                rows = tcfg.micro_batch or tcfg.global_batch
                return make_global_batch(
                    batch, self.mesh, rows, tcfg.seq_len
                )
            return {
                k: (jnp.asarray(v) if v is not None else None)
                for k, v in batch.items()
            }

        batches = iter(batches)
        for step in range(self.start_step, tcfg.steps):
            micros = []
            for _ in range(self.accum):
                nxt = next(batches, None)
                if nxt is None:
                    break
                micros.append(nxt)
            if len(micros) < self.accum:
                break  # stream exhausted mid-accumulation window
            if profiler:
                profiler.step(step)
            if not first_batch_dumped and tcfg.output_dir and tokenizer:
                from long_vita_tpu.data.observability import dump_first_batch

                dump_first_batch(tcfg.output_dir, micros[0], tokenizer)
                first_batch_dumped = True
            if self.accum == 1:
                self.state, metrics = self.step_fn(
                    self.state, device_batch(micros[0])
                )
            else:
                grads = loss_sum = count_sum = None
                for mb in micros:
                    g, loss_mb, count_mb = self.grad_fn(
                        self.state.params, device_batch(mb)
                    )
                    if grads is None:
                        grads, loss_sum, count_sum = g, loss_mb, count_mb
                    else:
                        grads = self.accum_fn(grads, g)
                        loss_sum = loss_sum + loss_mb
                        count_sum = count_sum + count_mb
                self.state, metrics = self.apply_fn(
                    self.state, grads, loss_sum, count_sum,
                    jnp.asarray(float(self.accum)),
                )
            loss = float(metrics["loss"])
            if not np.isfinite(loss):  # reference NaN tripwire
                raise FloatingPointError(f"non-finite loss at step {step}")
            dt = time.time() - t_last
            t_last = time.time()
            # straggler tripwire (reference wraps batch-gen/fwd with
            # Megatron's StragglerDetector; here: step-time anomaly log)
            step_times.append(dt)
            if len(step_times) > 4:
                median = sorted(step_times[-64:])[len(step_times[-64:]) // 2]
                if dt > tcfg.straggler_threshold * median:
                    logger.warning(
                        "straggler step %d: %.2fs (median %.2fs)",
                        step, dt, median,
                    )
            if step % tcfg.log_interval == 0:
                tokens = float(metrics["tokens"])
                logger.info(
                    "step %d | loss %.4f | grad_norm %.3f | %.1f supervised "
                    "tok | %.2fs/step",
                    step, loss, float(metrics["grad_norm"]), tokens, dt,
                )
            if metrics_log:
                metrics_log.log(
                    step, loss=loss, grad_norm=float(metrics["grad_norm"]),
                    supervised_tokens=float(metrics["tokens"]),
                    step_time_s=round(dt, 4),
                )
            history.append(loss)
            if (
                tcfg.save_interval
                and tcfg.save_dir
                and (step + 1) % tcfg.save_interval == 0
            ):
                from long_vita_tpu.training.checkpoint import save_checkpoint

                save_checkpoint(tcfg.save_dir, self.state,
                                layer_layout=self.layer_layout)
        if tcfg.save_dir:
            from long_vita_tpu.training.checkpoint import save_checkpoint

            save_checkpoint(tcfg.save_dir, self.state,
                            layer_layout=self.layer_layout)
        if metrics_log:
            metrics_log.close()
        if profiler:
            profiler.close()
        return {"losses": history}


def make_data_pipeline(
    corpus_yaml: str,
    mm: MultimodalTokenizer,
    tcfg: TrainerConfig,
    pad_token_id: int,
    default_system_message: Optional[str] = None,
    cross_dataset_joint: bool = False,
) -> Iterator[dict]:
    samples = load_corpus(corpus_yaml, seed=tcfg.seed)
    supervision = ChatMLSupervision(mm, default_system_message)
    report = None
    if tcfg.output_dir:
        from long_vita_tpu.data.observability import DataReport

        report = DataReport(tcfg.output_dir, tokenizer=mm.tokenizer)
    packs = PackedDataset(
        samples, supervision, tcfg.seq_len, pad_token_id,
        cross_dataset_joint=cross_dataset_joint, report=report,
    )
    from long_vita_tpu.data.prefetch import prefetch

    rows = tcfg.micro_batch or tcfg.global_batch
    it = batch_iterator(
        iter(packs), rows, tcfg.logit_budget, tcfg.mesh.cp,
        tcfg.cp_algo, tcfg.cp_inner,
        on_drop="warn" if tcfg.allow_logit_drop else "error",
    )
    import jax as _jax

    if _jax.process_count() > 1 and tcfg.mesh.size > 1:
        # multi-controller: every host walks the same pack stream and keeps
        # only its dp rows (tokenization repeats per host — the same trade
        # the reference's TP-rank-0 re-read+broadcast makes — but device
        # feeding is 1/dp); make_global_batch reassembles in Trainer.train
        from long_vita_tpu.parallel.mesh import make_mesh
        from long_vita_tpu.training.distributed import local_rows

        mesh = make_mesh(tcfg.mesh)
        it = (local_rows(b, mesh, rows) for b in it)
    return prefetch(it, depth=2)
