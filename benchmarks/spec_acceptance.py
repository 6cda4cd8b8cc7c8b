"""Speculative decoding: net throughput vs ACCEPTANCE, measured (VERDICT
r4 next #6 — the 1.73x claim was a full-acceptance context-quoting bench;
this sweeps the acceptance axis and measures the bf16 verify flip rate so
the claim can be stated honestly).

Random weights cannot exhibit a real paraphrase workload's acceptance (the
model IS the acceptance), so this bench separates mechanism from model:

  1. net pool tok/s at CONTROLLED accepted-draft length m (oracle drafts
     true for m tokens then corrupted) for k in {4, 8}, m in 0..k-1 —
     the speedup-vs-acceptance curve and its break-even point;
  2. ORGANIC prompt-lookup acceptance on non-quoting prompts (random ids)
     — the adversarial floor the scheduler must not regress under;
  3. bf16 flip rate: drafts = the plain pool's own trajectory, so every
     rejection is a batched-verify vs single-token argmax flip (the CPU
     f32 suite is the exactness oracle; on-chip bf16 reduction order can
     flip low-margin rows).

Real-workload acceptance itself must be measured on real weights — the
weights-day runbook (benchmarks/weights_day.py) is the vehicle.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/spec_acceptance.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class _IdTok:
    pad_token_id = 0

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(map(str, ids))

    def __call__(self, text, add_special_tokens=False):
        class R:
            input_ids = [1]

        return R()


class _MM:
    tokenizer = _IdTok()

    def expand(self, input_ids, images=(), videos=(), labels=None,
               max_num_frame=None):
        from long_vita_tpu.data.multimodal import ExpandedInputs

        return ExpandedInputs(list(input_ids), None, None, None)


def main():
    from long_vita_tpu.utils.compile_cache import enable

    enable()
    from long_vita_tpu.config import LongVITAConfig, TextConfig
    from long_vita_tpu.inference.continuous import ContinuousEngine
    from long_vita_tpu.inference.engine import InferenceEngine
    from long_vita_tpu.inference.sampler import SamplingParams
    from long_vita_tpu.models.qwen2 import init_qwen2_params
    import long_vita_tpu.inference.speculative as sd

    layers, ctx, new_tokens, batch = 4, 2048, 128, 4
    cfg = LongVITAConfig(
        text=TextConfig(
            vocab_size=152064, hidden_size=5120, intermediate_size=13824,
            num_hidden_layers=layers, num_attention_heads=40,
            num_key_value_heads=8, rope_theta=1e6,
        ),
        vision=None,
    )
    params = {"text": init_qwen2_params(jax.random.PRNGKey(0), cfg.text,
                                        jnp.bfloat16)}
    max_seq = ctx + new_tokens + 64
    rng = np.random.default_rng(0)
    sp = SamplingParams(greedy=True, max_new_tokens=new_tokens)
    prompts = [rng.integers(1, 50000, ctx - 7 * b).tolist()
               for b in range(batch)]

    def run_pool(engine, tick):
        ce = ContinuousEngine(engine, sp, max_slots=batch, tick=tick)
        rids = [ce.add_request(p) for p in prompts]
        t0 = time.time()
        done = dict(ce.run_to_completion())
        dt = time.time() - t0
        toks = sum(len(done[r].token_ids) for r in rids)
        return toks, dt, done, rids

    plain = InferenceEngine(params, cfg, _MM(), max_seq_len=max_seq,
                            chunk=512)
    run_pool(plain, tick=8)  # warm
    toks_p, dt_p, done_p, rids_p = run_pool(plain, tick=8)
    base = toks_p / dt_p
    log(f"plain pool: {base:.1f} tok/s aggregate "
        f"({toks_p} tokens / {dt_p:.2f}s)")

    # trajectory corpus for the draft oracle (keyed by prompt head).
    # Mutable: rejection bonuses come from the VERIFY kernel's bf16 argmax,
    # which can flip low-margin rows vs the single-token path, shifting the
    # trajectory — so each (k, m) point settles to the spec pool's OWN
    # fixed point before timing (same discipline as serving_throughput's
    # spec_bench).
    def corpus_from(done, rids):
        c = {}
        for p, rid in zip(prompts, rids):
            c[tuple(p[:16])] = np.concatenate(
                [p, done[rid].token_ids]
            ).astype(np.int32)
        return c

    corpus = corpus_from(done_p, rids_p)
    accept_m = [None]  # current target accepted-draft length (None = all)

    def oracle(history, kk, ngram_max=3):
        h = corpus.get(tuple(int(t) for t in history[:16]))
        if h is None:
            return np.empty(0, np.int32)
        out = h[len(history):len(history) + kk].copy()
        m = accept_m[0]
        if m is not None and m < len(out):
            out[m:] = (out[m:] + 1) % 152064  # corrupt the tail
        return out

    def settle_and_time(spec, k, m):
        nonlocal corpus
        accept_m[0] = m
        corpus = corpus_from(done_p, rids_p)
        out = run_pool(spec, tick=k)  # warm / trajectory 1
        corpus = corpus_from(out[2], out[3])
        out = run_pool(spec, tick=k)  # fixed point
        corpus = corpus_from(out[2], out[3])
        spec._spec_steps = 0
        return run_pool(spec, tick=k)

    real_draft = sd.draft_tokens
    results = {"plain_tok_s": round(base, 1), "curves": {}, "organic": {},
               "flip_rate": None}
    try:
        sd.draft_tokens = oracle
        for k in (4, 8):
            spec = InferenceEngine(params, cfg, _MM(), max_seq_len=max_seq,
                                   chunk=512, speculative_k=k)
            curve = []
            for m in list(range(k)) + [None]:  # None = uncorrupted drafts
                toks, dt, done, rids = settle_and_time(spec, k, m)
                steps = max(spec._spec_steps, 1)
                accepted = toks / steps - 1  # bonus token excluded
                net = toks / dt
                label = "full" if m is None else m
                point = {
                    "m": label, "tok_s": round(net, 1),
                    "speedup": round(net / base, 2),
                    "accepted_per_step": round(accepted, 2),
                }
                curve.append(point)
                log(f"k={k} m={label}: {net:.1f} tok/s ({net/base:.2f}x), "
                    f"accepted/step={accepted:.2f} ({steps} verify steps)")
                if k == 8 and m is None:
                    # full-true drafts vs the PLAIN trajectory: every
                    # first-divergence is a batched-verify bf16 argmax flip
                    flips = sum(
                        done_p[rp].token_ids != done[rs].token_ids
                        for rp, rs in zip(rids_p, rids)
                    )
                    pos_flips = sum(
                        a != b
                        for rp, rs in zip(rids_p, rids)
                        for a, b in zip(done_p[rp].token_ids,
                                        done[rs].token_ids)
                    )
                    total = sum(len(done_p[rp].token_ids) for rp in rids_p)
                    results["flip_rate"] = round(
                        pos_flips / max(total, 1), 4
                    )
                    results["rows_flipped"] = f"{flips}/{batch}"
                    log(f"  bf16 verify-vs-plain: {flips}/{batch} rows "
                        f"diverge, {pos_flips}/{total} positions differ")
            results["curves"][f"k{k}"] = curve

        # organic prompt-lookup on NON-quoting prompts (the floor)
        sd.draft_tokens = real_draft
        for k in (4, 8):
            spec = InferenceEngine(params, cfg, _MM(), max_seq_len=max_seq,
                                   chunk=512, speculative_k=k)
            run_pool(spec, tick=k)
            spec._spec_steps = 0
            toks, dt, done, rids = run_pool(spec, tick=k)
            steps = max(spec._spec_steps, 1)
            accepted = toks / steps - 1
            net = toks / dt
            results["organic"][f"k{k}"] = {
                "tok_s": round(net, 1), "speedup": round(net / base, 2),
                "accepted_per_step": round(accepted, 2),
            }
            log(f"organic k={k} (non-quoting prompts): {net:.1f} tok/s "
                f"({net/base:.2f}x), accepted/step={accepted:.2f}")
    finally:
        sd.draft_tokens = real_draft

    print(json.dumps(results))


if __name__ == "__main__":
    main()
