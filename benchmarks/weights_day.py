"""Weights-day runbook: the ONE command to run when real Long-VITA-*_HF
weights land on a machine (VERDICT r4 next #9; closes Missing #1).

    python benchmarks/weights_day.py --ckpt /path/Long-VITA-16K_HF
    python benchmarks/weights_day.py --oracle        # dry-run, tiny oracle

Runs, in order, and appends a "Weights-day parity" section to
PARITY_WEIGHTS.md:

  1. loader        — checkpoint_io.load_long_vita_checkpoint on the dir
  2. golden gen    — N greedy tokens from our engine vs the HF torch path
                     (the released checkpoints' own modeling_long_vita.py,
                     reference modeling_long_vita.py:227) on the same
                     prompt; tokens must match. Use --hf-tokens FILE (json
                     list of ids recorded on a torch machine) if torch
                     cannot load the model here.
  3. eval smoke    — eval/simple_eval.py over a 3-question builtin set
                     (real weights should score 3/3 contains; the oracle
                     dry-run just exercises the path)
  4. w8a16 A/B     — same rollout under weight_quant="int8" (+int8 KV):
                     token agreement + per-step timing

Dry-run (--oracle) builds the tiny reference-oracle torch model
(tests/ref_oracle.py) + tokenizer assets from /root/reference, so every
step runs end-to-end without the released weights.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMOKE_QA = [
    {"prompt": "What is 2+2? Answer with just the number.", "answer": "4"},
    {"prompt": "Name the capital of France in one word.",
     "answer": "Paris"},
    {"prompt": "Repeat exactly: tpu", "answer": "tpu"},
]

PROMPT = "Describe the number forty-two."


def _build_oracle(tmp: str):
    """Tiny oracle: reference torch model + our params + ref tokenizer."""
    import jax
    import jax.numpy as jnp
    from safetensors.torch import save_file

    sys.path.insert(0, REPO)  # tests/ package
    import transformers

    from long_vita_tpu.config import tiny_test_config
    from long_vita_tpu.tokenizer import QWEN_CHATML_TEMPLATE, update_tokenizer
    from long_vita_tpu.utils.checkpoint_io import load_long_vita_checkpoint
    from tests.ref_oracle import make_tiny_reference

    ref_tok = "/root/reference/long_vita/models/long_vita_qwen2_intern"
    tok = transformers.Qwen2Tokenizer(
        vocab_file=f"{ref_tok}/vocab.json",
        merges_file=f"{ref_tok}/merges.txt",
    )
    tok = update_tokenizer(tok)
    tok.chat_template = QWEN_CHATML_TEMPLATE

    # vocab must cover the real tokenizer's ids (the oracle model embeds
    # tokenized English prompts)
    cfg = tiny_test_config(vocab_size=-(-(len(tok) + 64) // 128) * 128)
    ref = make_tiny_reference(cfg)
    sd = {k: v.contiguous() for k, v in ref.state_dict().items()}
    save_file(sd, os.path.join(tmp, "model.safetensors"))
    params, _ = load_long_vita_checkpoint(tmp, cfg, dtype=jnp.float32)
    return params, cfg, tok, ref


def _build_real(ckpt: str, dtype_name: str):
    import jax.numpy as jnp

    from long_vita_tpu.tokenizer import load_tokenizer
    from long_vita_tpu.utils.checkpoint_io import load_long_vita_checkpoint

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
    params, cfg = load_long_vita_checkpoint(ckpt, dtype=dtype)
    tok = load_tokenizer(ckpt)
    return params, cfg, tok, None


def _engine(params, cfg, tok, *, image_size=None, **kw):
    import jax
    import jax.numpy as jnp

    from long_vita_tpu.data.image_processor import ImageProcessor
    from long_vita_tpu.data.multimodal import MultimodalTokenizer
    from long_vita_tpu.inference.engine import InferenceEngine

    proc = ImageProcessor(image_size=image_size) if image_size else None
    mm = MultimodalTokenizer(
        tok, image_processor=proc,
        image_token_length=cfg.image_token_length,
    )
    kw.setdefault("max_seq_len", 4096)
    kw.setdefault("chunk", 512)
    kw.setdefault("cache_dtype", jnp.float32)
    return InferenceEngine(
        jax.tree.map(np.copy, params), cfg, mm, **kw
    )


def _torch_rollout(ref_model, tok, prompt_ids, n: int) -> list[int]:
    """Greedy rollout through the HF torch path (full forward per step,
    the reference's no-cache mode — slow but the parity oracle)."""
    import torch

    ids = torch.tensor([prompt_ids])
    out = []
    with torch.no_grad():
        for _ in range(n):
            logits = ref_model(input_ids=ids, use_cache=False).logits
            nxt = int(torch.argmax(logits[0, -1]))
            out.append(nxt)
            ids = torch.cat([ids, torch.tensor([[nxt]])], dim=1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="Long-VITA-*_HF checkpoint dir")
    ap.add_argument("--oracle", action="store_true",
                    help="dry-run against the tiny reference oracle")
    ap.add_argument("--hf-tokens",
                    help="json file with the HF torch path's greedy tokens "
                         "for PROMPT (recorded elsewhere); skips the "
                         "in-process torch rollout")
    ap.add_argument("--tokens", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_WEIGHTS.md"))
    args = ap.parse_args(argv)
    if not args.ckpt and not args.oracle:
        ap.error("need --ckpt or --oracle")

    report: list[str] = []
    src = args.ckpt or "tiny oracle (tests/ref_oracle.py)"
    report.append(f"## Weights-day parity — {src}\n")

    # 1. loader ------------------------------------------------------------
    t0 = time.time()
    if args.oracle:
        import tempfile

        tmp = tempfile.mkdtemp(prefix="weights_day_")
        params, cfg, tok, ref_model = _build_oracle(tmp)
        image_size = cfg.vision.image_size
        dtype_name = "float32"
    else:
        params, cfg, tok, ref_model = _build_real(args.ckpt, args.dtype)
        image_size = None
        dtype_name = args.dtype
    n_params = sum(
        int(np.prod(x.shape))
        for x in __import__("jax").tree.leaves(params)
    )
    report.append(
        f"- loader: OK — {n_params/1e6:.1f}M params ({dtype_name}) in "
        f"{time.time()-t0:.1f}s"
    )
    print(report[-1])

    # 2. golden generation vs the HF torch path -----------------------------
    from long_vita_tpu.inference.sampler import SamplingParams

    eng = _engine(params, cfg, tok, image_size=image_size)
    prompt_ids = tok([PROMPT], add_special_tokens=False).input_ids[0]
    sp = SamplingParams(greedy=True, max_new_tokens=args.tokens)
    ours = eng.generate(input_ids=prompt_ids, sampling=sp).token_ids

    want = None
    if args.hf_tokens:
        want = json.load(open(args.hf_tokens))
    elif ref_model is not None:
        want = _torch_rollout(ref_model, tok, prompt_ids, args.tokens)
    else:
        try:
            import torch  # noqa: F401
            import transformers

            model = transformers.AutoModelForCausalLM.from_pretrained(
                args.ckpt, trust_remote_code=True,
                torch_dtype="bfloat16", device_map="cpu",
            )
            want = _torch_rollout(model, tok, prompt_ids, args.tokens)
        except Exception as e:  # noqa: BLE001
            report.append(
                f"- golden gen: SKIPPED (torch path unavailable: {e}); "
                "record tokens on a torch machine and pass --hf-tokens"
            )
    if want is not None:
        n = min(len(ours), len(want))
        ok = ours[:n] == want[:n] and n >= 1
        report.append(
            f"- golden gen: {'OK' if ok else 'MISMATCH'} — ours={ours} "
            f"hf={want}"
        )
        if not ok:
            print("\n".join(report))
            raise SystemExit("golden generation mismatch")
    print(report[-1])

    # 3. simple_eval smoke ---------------------------------------------------
    import tempfile

    from long_vita_tpu.eval.simple_eval import run_eval

    with tempfile.NamedTemporaryFile(
        "w", suffix=".jsonl", delete=False
    ) as f:
        for row in SMOKE_QA:
            f.write(json.dumps(row) + "\n")
        qa_path = f.name
    res = run_eval(qa_path, engine=eng, max_new_tokens=16)["summary"]
    report.append(
        f"- simple_eval smoke: contains={res['contains']:.2f} "
        f"exact={res['exact']:.2f} over n={res['n']}"
        + (" (oracle weights are random — score is not meaningful)"
           if args.oracle else "")
    )
    print(report[-1])

    # 4. w8a16 (+int8 KV) A/B -----------------------------------------------
    for label, kw in (
        ("w8a16", dict(weight_quant="int8")),
        ("w8a16+int8kv", dict(weight_quant="int8", kv_quant=True)),
    ):
        qeng = _engine(params, cfg, tok, image_size=image_size, **kw)
        t0 = time.time()
        qtoks = qeng.generate(input_ids=prompt_ids, sampling=sp).token_ids
        dt = time.time() - t0
        n = min(len(qtoks), len(ours))
        agree = sum(a == b for a, b in zip(qtoks[:n], ours[:n]))
        report.append(
            f"- {label}: {agree}/{n} tokens match fp rollout "
            f"({dt:.1f}s incl. compile); tokens={qtoks}"
        )
        print(report[-1])

    report.append("")
    with open(args.out, "a") as f:
        f.write("\n".join(report) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
