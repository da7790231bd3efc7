"""Perplexity CLI over a GGML model + text corpus (WikiText-2 style).

Usage::

    python -m llama_swift_tpu.tools.perplexity --model ggml-model-q4_0.bin \
        --text wiki.test.raw [--n-ctx 512] [--stride ...]

Prints running ppl per window and a final JSON summary.  This is the
Δppl-vs-reference harness BASELINE.md's target is phrased against (the
reference ships no evaluation tooling at all — SURVEY.md §4).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", required=True, help="raw text file")
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--max-windows", type=int, default=None)
    ap.add_argument("--param-dtype", default=None, choices=[None, "float32", "bfloat16"])
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ..formats.ggml import load_model_file
    from ..models.llama import params_from_tensors
    from ..tokenizer import Vocab
    from ..utils.perplexity import perplexity

    import dataclasses

    mf = load_model_file(args.model, n_ctx=args.n_ctx)
    vocab = Vocab(mf.vocab)
    dtype = jnp.dtype(args.param_dtype) if args.param_dtype else None
    # scoring wants exact-f32 prefill matmuls, not the serving bf16 fast path
    cfg = dataclasses.replace(mf.config, prefill_bf16=False)
    params = params_from_tensors(mf.tensors, cfg, param_dtype=dtype)

    with open(args.text, "rb") as f:
        text = f.read()
    ids = np.asarray(vocab.tokenize(text, bos=False), dtype=np.int32)
    if args.max_windows:
        ids = ids[: args.max_windows * args.n_ctx]
    print(f"tokenized {len(ids)} tokens -> {len(ids) // args.n_ctx} windows",
          file=sys.stderr)

    def progress(done, total, run_ppl):
        print(f"[{done}/{total}] ppl = {run_ppl:.4f}", file=sys.stderr, flush=True)

    out = perplexity(params, cfg, ids, progress=progress)
    print(json.dumps({
        "model": args.model, "n_ctx": args.n_ctx,
        "ppl": round(out["ppl"], 4), "nll": round(out["nll"], 6),
        "n_scored": out["n_scored"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
