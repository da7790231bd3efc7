"""Multi-host serving entry point — the ``serve.py`` the runbook in
``parallel/multihost.py`` describes.

One process per host, identical invocation everywhere except
``--process-id``::

    python serve.py --model ggml-model-q4_0.bin \
        --coordinator host0:8476 --num-processes 2 --process-id $HOST_INDEX \
        --prompt "..." [--tp 16]

``jax.distributed.initialize`` forms the process group (skipped when no
``--coordinator`` — single-process, any local device count); the global mesh
spans every chip; weights are TP-sharded with ``parallel/tp.py`` (shard_map:
each device runs its local fused Pallas kernels, collectives are explicit
all-gathers over ICI/DCN); every process drives the same jitted step in
lockstep and only process 0 samples and streams tokens.  The sampled id is
fed back identically on every process (same logits → same host-sampler state
→ same token), so no broadcast is needed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Optional


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="tpu-llama multi-host serving")
    ap.add_argument("--model", default=os.environ.get("MODEL_PATH"))
    ap.add_argument("--prompt", default="Once upon a time,")
    ap.add_argument("--n-tokens", type=int, default=128)
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--temp", type=float, default=0.80)
    ap.add_argument("--repeat-penalty", type=float, default=1.30)
    # multi-host process group (parallel/multihost.py runbook step 2)
    ap.add_argument("--coordinator", default=None,
                    help="host0:port of process 0; omit for single-process")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int,
                    default=int(os.environ.get("HOST_INDEX", "0")))
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel degree (default: all devices)")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if not args.model:
        print("Model path not specified - define in MODEL_PATH or --model")
        return 1
    if not os.path.exists(args.model):
        print("Invalid model path, make sure this is a file path")
        return 1

    # must run before any other jax call (multihost.init_distributed)
    from .parallel.multihost import init_distributed, is_primary

    init_distributed(
        args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id if args.coordinator else None,
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .config import SamplingConfig
    from .formats import ggml
    from .models import llama as model_lib
    from .parallel import tp as tp_lib
    from .parallel.mesh import make_mesh
    from .runtime.sampler import SamplerState
    from .tokenizer import Vocab

    tp = args.tp or len(jax.devices())
    mesh = make_mesh(tp=tp, dp=1)
    say = print if is_primary() else (lambda *a, **k: None)

    say(f"[serve] mesh tp={tp} over {len(jax.devices())} devices, "
        f"process {jax.process_index()}/{jax.process_count()}")
    t0 = time.perf_counter()
    mf = ggml.load_model_file(args.model, n_ctx=args.n_ctx)
    cfg = mf.config
    import dataclasses

    # fused wqkv/w13 (shard-interleaved) + per-shard flash decode: the TP
    # path runs the fast kernel stack (r4 VERDICT #5 — it used to force
    # fuse_layer_matmuls=False, use_flash_decode=False onto the slowest
    # attention and 3x the kernel launches)
    cfg = dataclasses.replace(cfg, fuse_layer_matmuls=True)
    vocab = Vocab(mf.vocab)
    if cfg.n_head % tp:
        print(f"n_head {cfg.n_head} not divisible by tp={tp}")
        return 1
    params = model_lib.params_from_tensors(
        mf.tensors, cfg,
        shard_pad=128 * tp if tp > 1 else 1,
        # "v" explicitly: the TP local forward runs the per-matmul V-layout
        # kernels per shard (the whole-stack W megakernel cannot span the
        # all-gather boundaries between attention/wo and gate/w2)
        q4_layout="v",
        fuse_shards=tp,
    )
    params = tp_lib.shard_params_tp(params, mesh)
    cache = tp_lib.shard_cache_tp(model_lib.init_cache(cfg), mesh)
    fwd = tp_lib.make_tp_forward(mesh, cfg, params, cache)
    say(f"[serve] model loaded+sharded in {time.perf_counter() - t0:.1f}s")

    sampling = SamplingConfig(
        seed=args.seed, top_k=args.top_k, top_p=args.top_p, temp=args.temp,
        repeat_penalty=args.repeat_penalty,
    )
    sampler = SamplerState(sampling)
    prompt_ids = vocab.tokenize(args.prompt, bos=True)
    if len(prompt_ids) >= cfg.n_ctx:
        prompt_ids = prompt_ids[: cfg.n_ctx - 1]
    n_predict = min(args.n_tokens, cfg.n_ctx - len(prompt_ids))

    padded, length = model_lib.pad_tokens(prompt_ids, 64)
    t0 = time.perf_counter()
    logits, cache = fwd(params, jnp.asarray(padded), jnp.int32(0), cache)
    logits = np.asarray(logits[length - 1])
    t_prefill = time.perf_counter() - t0
    for t in prompt_ids:
        sampler.observe(t)
        say(vocab.piece_str(t), end="", flush=True)

    n_past = length
    t0 = time.perf_counter()
    for _ in range(n_predict):
        tid = sampler.sample(logits)
        say(vocab.piece_str(tid), end="", flush=True)
        step_logits, cache = fwd(
            params, jnp.asarray([tid], jnp.int32), jnp.int32(n_past), cache
        )
        logits = np.asarray(step_logits[0])
        n_past += 1
    dt = time.perf_counter() - t0
    say(
        f"\n[serve] {n_predict} tokens, {n_predict / dt:.2f} tok/s decode, "
        f"prefill {t_prefill:.2f}s (p50 TTFT ~ prefill + 1 step)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
