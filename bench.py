"""Benchmark driver: the BASELINE.json measurement set on one chip.

Default run prints MULTIPLE JSON lines (one metric each), headline first
AND repeated last so any line-picking parser lands on it:

  decode_tok_per_s_*   batch-1 greedy decode, on-device scan loop (headline)
  ttft_p50_s_*         p50 time-to-first-token, 64- and 512-token prompts
  served_tok_per_s_*   the RUNNER path: sampled_decode_loop in 32-token
                       dispatch chunks incl. host fetch per chunk (the
                       product serving loop, not just the bench loop)
  decode_tok_per_s_13b_..._batchN   13B Q4_0 continuous-batching aggregate
                       (B=8,16 at 512 ctx; B=32 at 256 ctx — HBM bound)

``vs_baseline`` is the fraction of the weight-load-bound speed of light
(tokens/s at full HBM bandwidth streaming the packed Q4_0 weight bytes once
per token — the roofline the BASELINE.md north star is phrased against;
>=0.90 is the target).  The reference publishes no numbers (BASELINE.md), so
the roofline is the honest denominator.  NOTE the decode kernel is VPU-
compute-bound, not byte-bound: the exact int4 dot costs ~3.2 VPU ops/weight
vs the ~2.9 the 819 GB/s stream rate allows, so the achievable ceiling is
~0.92 of the byte roofline (r5 decode profile; see PARITY.md).

For TTFT, vs_baseline is the prefill MXU-FLOP-bound time over measured
time (2·n_params·prompt_len / 197 TFLOPs bf16 — the r4 bench divided by
the WEIGHT-STREAM time here, a mislabeled ~8x-too-strict denominator).

Weights are synthetic (random nibbles/scales generated on device — numerics
don't matter for bandwidth measurements; correctness is covered by tests/).

``--quick`` runs only the headline decode metric (the r1/r2 behavior).
"""

import argparse
import json
import os
import sys
import time

# persistent compile cache: repeat runs skip the (slow, remote) TPU compile.
# The env var alone is not reliably picked up on the axon backend; set the
# config explicitly once jax is imported (see _enable_compile_cache below).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _enable_compile_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth, GB/s
V5E_BF16_TFLOPS = 197.0  # v5e MXU peak, bf16


def model_param_count(cfg) -> int:
    """Unpadded 2-D weight element count (the prefill FLOP basis)."""
    from llama_swift_tpu.formats.ggml import expected_tensor_shapes

    return sum(
        s[0] * s[1] for s in expected_tensor_shapes(cfg).values()
        if len(s) == 2
    )


def synthetic_weight_bytes(cfg, layout="v"):
    """Packed Q4_0 HBM bytes for the whole model (incl. the layout's kernel
    in-dim padding) — the roofline denominator."""
    from llama_swift_tpu.formats.ggml import expected_tensor_shapes

    align = 1024 if layout == "t" else 4096
    total = 0
    for shape in expected_tensor_shapes(cfg).values():
        if len(shape) == 1:
            total += shape[0] * 4
        else:
            rows, cols = shape
            cols = -(-cols // align) * align
            total += rows * cols // 2 + rows * (cols // 32) * 4
    return total


def build_synthetic_q4_0_params_stacked(cfg, layout="v"):
    """Synthetic Q4_0 params generated DIRECTLY in the stacked [L, ...]
    device layout — the exact pytree ``params_from_tensors(...,
    stack_layers=True)`` produces, without ever materializing per-layer
    copies (a post-hoc ``jnp.stack`` doubles peak HBM and OOMs at 13B —
    the r3 bench failure).  Requires ``cfg.fuse_layer_matmuls``."""
    import jax
    import jax.numpy as jnp

    from llama_swift_tpu.ops.q4_fused_layer import Q4_0TensorW
    from llama_swift_tpu.ops.q4_matmul_pallas import Q4_0TensorT
    from llama_swift_tpu.ops.q4_vpu_pallas import Q4_0TensorV

    assert cfg.fuse_layer_matmuls, "stacked generator assumes fused wqkv/w13"
    D, V, F, L = cfg.n_embd, cfg.n_vocab, cfg.n_ff, cfg.n_layer
    align = 1024 if layout == "t" else 4096

    def pad_in(c):
        return -(-c // align) * align

    def noise(seed, shape, mod):
        """Deterministic pseudo-noise over the trailing two axes (pure
        elementwise iota math — compiles in seconds, no host traffic)."""
        a = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
        b = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        return (a * 7 + b * 13 + seed) % mod

    def gen_q4(seed, out, in_dim, cls, layers=None):
        lead = () if layers is None else (layers,)
        ot = out // 128
        if cls is Q4_0TensorT:
            qshape = lead + (ot, in_dim // 8, 128)
            sshape = lead + (ot, in_dim // 32, 128)
        else:  # V / W share the [ot, 128, in/...] geometry
            qshape = lead + (ot, 128, in_dim // 8)
            sshape = lead + (ot, 128, in_dim // 32)
        qs = noise(seed, qshape, 2**31 - 1).astype(jnp.int32)
        sc = 0.001 + 1e-5 * noise(seed, sshape, 97).astype(jnp.float32)
        if cls is Q4_0TensorT:
            return Q4_0TensorT(scales_t=sc, qs4=qs)
        if cls is Q4_0TensorW:
            return Q4_0TensorW(scales_w=sc, qs4w=qs)
        return Q4_0TensorV(scales_v=sc, qs4v=qs)

    lcls = {"v": Q4_0TensorV, "t": Q4_0TensorT, "w": Q4_0TensorW}[layout]
    hcls = Q4_0TensorV if layout in ("v", "w") else Q4_0TensorT

    @jax.jit
    def gen_all():
        return {
            "tok_embeddings": gen_q4(1, V, pad_in(D), hcls),
            "norm": jnp.ones((D,), jnp.float32),
            "output": gen_q4(2, V, pad_in(D), hcls),
            "layers_stacked": {
                "attention_norm": jnp.ones((L, D), jnp.float32),
                "ffn_norm": jnp.ones((L, D), jnp.float32),
                "wqkv": gen_q4(3, 3 * D, pad_in(D), lcls, layers=L),
                "wo": gen_q4(4, D, pad_in(D), lcls, layers=L),
                "w13": gen_q4(5, 2 * F, pad_in(D), lcls, layers=L),
                "w2": gen_q4(6, D, pad_in(F), lcls, layers=L),
            },
        }

    return gen_all(), synthetic_weight_bytes(cfg, layout)


def build_synthetic_q4_0_params(cfg, layout="v"):
    """Synthetic Q4_0 params in a packed device layout ("v": VPU-matvec
    layout, the serving default; "t": legacy tiled layout), materialized by
    ONE jitted dispatch (per-tensor host/random generation would mean
    hundreds of round trips through the TPU tunnel)."""
    import functools

    import jax
    import jax.numpy as jnp

    from llama_swift_tpu.formats.ggml import expected_tensor_shapes
    from llama_swift_tpu.ops.q4_matmul_pallas import Q4_0TensorT
    from llama_swift_tpu.ops.q4_vpu_pallas import Q4_0TensorV

    shapes = expected_tensor_shapes(cfg)
    total_bytes = 0

    def gen_one(seed, shape, name=""):
        if len(shape) == 1:
            return jnp.ones(shape, jnp.float32)
        rows, cols = shape
        head = "tok_embeddings" in name or "output" in name
        cols = (cols + 4095) // 4096 * 4096  # kernel in-dim padding (cvt parity)
        ot = rows // 128
        if layout == "w" and not head:
            # fused-layer layout: V geometry ([out/128, 128, in/8] qs +
            # [out/128, 128, in/32] scales) with lambda-permuted blocks —
            # the permutation doesn't matter for synthetic bandwidth params
            from llama_swift_tpu.ops.q4_fused_layer import Q4_0TensorW

            def noise3w(d2, mod):
                a = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, d2), 1)
                b = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, d2), 2)
                return (a * 7 + b * 13 + seed) % mod

            qs4w = noise3w(cols // 8, 2**31 - 1).astype(jnp.int32)
            scales_w = 0.001 + 1e-5 * noise3w(cols // 32, 97).astype(jnp.float32)
            return Q4_0TensorW(scales_w=scales_w, qs4w=qs4w)
        if layout == "v" or (layout == "w" and head):
            def noise3v(d2, mod):
                a = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, d2), 1)
                b = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, d2), 2)
                return (a * 7 + b * 13 + seed) % mod

            qs4v = noise3v(cols // 8, 2**31 - 1).astype(jnp.int32)
            scales_v = 0.001 + 1e-5 * noise3v(cols // 32, 97).astype(jnp.float32)
            return Q4_0TensorV(scales_v=scales_v, qs4v=qs4v)

        # deterministic pseudo-noise, pure elementwise — compiles in seconds
        def noise3(d1, mod, scale, off):
            a = jax.lax.broadcasted_iota(jnp.int32, (ot, d1, 128), 0)
            b = jax.lax.broadcasted_iota(jnp.int32, (ot, d1, 128), 1)
            c = jax.lax.broadcasted_iota(jnp.int32, (ot, d1, 128), 2)
            return (a * 7 + b * 13 + c * 3 + seed) % mod

        qs4 = noise3(cols // 8, 2**31 - 1, None, None).astype(jnp.int32)
        scales_t = 0.001 + 1e-5 * noise3(cols // 32, 97, None, None).astype(jnp.float32)
        return Q4_0TensorT(scales_t=scales_t, qs4=qs4)

    @jax.jit
    def gen_all():
        return {
            name: gen_one(i, shape, name)
            for i, (name, shape) in enumerate(sorted(shapes.items()))
        }

    tensors = gen_all()
    for name, shape in shapes.items():
        if len(shape) == 1:
            total_bytes += shape[0] * 4
        else:
            rows, cols = shape
            cols = (cols + 4095) // 4096 * 4096  # padded bytes stream
            total_bytes += rows * cols // 2 + rows * (cols // 32) * 4
    return tensors, total_bytes


def build_synthetic_dense_params(cfg):
    """Synthetic bf16 dense params (the dense-dequant serving mode), one
    jitted dispatch; byte count reflects what decode actually streams."""
    import jax
    import jax.numpy as jnp

    from llama_swift_tpu.formats.ggml import expected_tensor_shapes

    shapes = expected_tensor_shapes(cfg)

    def gen_one(seed, shape):
        if len(shape) == 1:
            return jnp.ones(shape, jnp.float32)
        rows, cols = shape
        a = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        b = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return (0.01 * (((a * 7 + b * 13 + seed) % 97) - 48)).astype(jnp.bfloat16)

    @jax.jit
    def gen_all():
        return {
            name: gen_one(i, shape)
            for i, (name, shape) in enumerate(sorted(shapes.items()))
        }

    total = 0
    for shape in shapes.values():
        total += shape[0] * 4 if len(shape) == 1 else shape[0] * shape[1] * 2
    return gen_all(), total


SIZES = {
    "tiny": dict(n_embd=512, n_head=8, n_layer=4, n_vocab=32000, n_mult=256),
    # 128-dim heads: exercises the fused-layer kernels at small scale
    "tiny128": dict(n_embd=512, n_head=4, n_layer=4, n_vocab=32000, n_mult=256),
    "1b": dict(n_embd=2048, n_head=16, n_layer=16, n_vocab=32000, n_mult=256),
    "7b": dict(n_embd=4096, n_head=32, n_layer=32, n_vocab=32000, n_mult=256),
    "13b": dict(n_embd=5120, n_head=40, n_layer=40, n_vocab=32000, n_mult=256),
}


def make_cfg(size, args, n_ctx=None):
    from llama_swift_tpu.config import GGMLType, ModelConfig

    return ModelConfig(
        ftype=GGMLType.Q4_0, n_ctx=n_ctx or args.n_ctx, n_rot=64,
        compute_dtype="float32", quantize_activations=True,
        fuse_layer_matmuls=not args.no_fuse,
        kv_cache_dtype=args.kv_dtype,
        use_flash_decode=args.flash,
        scan_layers=args.scan_layers,
        **SIZES[size],
    )


def build_params(cfg, args):
    import jax.numpy as jnp

    from llama_swift_tpu.models import llama as model_lib

    stack = not args.no_stack
    if args.weights == "dense-bf16":
        tensors, weight_bytes = build_synthetic_dense_params(cfg)
        params = model_lib.params_from_tensors(
            tensors, cfg, param_dtype=jnp.bfloat16, stack_layers=stack
        )
        return params, weight_bytes
    # default "q4-packed" = the fastest serving layout for this model:
    # fused-layer W kernels (head_dim 128), else the V matvec layout
    # Fused-layer W kernels (head_dim 128) are the fastest layout AND pass
    # experiments/tpu_selfcheck.py on hardware (r4: their attention dots —
    # like flash-decode's — needed Precision.HIGHEST; Mosaic's default
    # lowered f32 dots to single-pass bf16 on the MXU, ~0.19 rel logit err
    # over 32 layers).  The selfcheck stage below re-certifies every run.
    default_layout = "w" if cfg.head_dim == 128 else "v"
    layout = {
        "q4-packed-t": "t", "q4-packed-w": "w", "q4-packed-v": "v",
    }.get(args.weights, default_layout)
    if layout == "w" and cfg.head_dim != 128:
        layout = "v"  # fused-layer kernels map one 128-dim head per tile
    if stack and cfg.fuse_layer_matmuls:
        # direct stacked generation: peak HBM = final weights (a per-layer
        # gen + jnp.stack holds 2x and OOMs at 13B)
        return build_synthetic_q4_0_params_stacked(cfg, layout=layout)
    tensors, weight_bytes = build_synthetic_q4_0_params(cfg, layout=layout)
    params = model_lib.params_from_tensors(
        tensors, cfg, param_dtype=jnp.float32, stack_layers=stack,
        q4_layout=layout if layout == "w" else None,
    )
    return params, weight_bytes


def emit(metric, value, unit, vs_baseline):
    line = {
        "metric": metric, "value": round(value, 4), "unit": unit,
        "vs_baseline": round(vs_baseline, 4),
    }
    print(json.dumps(line), flush=True)
    return line


def ttft_bench(cfg, params, prompt_len, args):
    """p50 time-to-first-token: padded prefill dispatch + greedy first-token
    fetch, wall clock (includes the tunneled backend's dispatch latency —
    the honest serving number on this setup)."""
    import jax.numpy as jnp
    import numpy as np

    from llama_swift_tpu.models import llama as model_lib

    prompt = np.full(prompt_len, 7, dtype=np.int32)
    times = []
    for it in range(6):  # first iteration compiles; excluded below
        cache = model_lib.init_cache(cfg)
        t0 = time.perf_counter()
        logits, cache = model_lib.prefill(
            params, jnp.asarray(prompt), jnp.int32(0), cache, cfg
        )
        tok = int(np.asarray(jnp.argmax(logits[prompt_len - 1])))
        times.append(time.perf_counter() - t0)
        del cache
    return float(np.median(times[1:]))


def served_bench(cfg, params, weight_bytes, args, chunk=32):
    """The runner path: sampled_decode_loop in `chunk`-token dispatches with
    a host fetch per chunk (runtime/runner._decode_device's loop)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_swift_tpu.config import SamplingConfig
    from llama_swift_tpu.models import llama as model_lib
    from llama_swift_tpu.runtime.device_sampler import init_ring, sampled_decode_loop

    scfg = SamplingConfig(seed=None, n_predict=0, rng_impl="numpy")
    cache = model_lib.init_cache(cfg)
    ring, pos = init_ring([7] * 8, scfg.repeat_last_n)
    key = jax.random.key(0)
    last = jnp.asarray(7, jnp.int32)
    n_past = 0

    def run_chunks(n_chunks, last, n_past, cache, ring, pos, key):
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            toks, cache, ring, pos, key = sampled_decode_loop(
                params, last, jnp.int32(n_past), cache, ring, pos, key,
                jnp.int32(chunk), cfg, scfg, chunk,
            )
            out = np.asarray(toks)
            last = jnp.asarray(int(out[-1]), jnp.int32)
            n_past += chunk
        return time.perf_counter() - t0, last, n_past, cache, ring, pos, key

    # warm (compile), then time 3 chunks
    _, last, n_past, cache, ring, pos, key = run_chunks(1, last, n_past, cache, ring, pos, key)
    dt, last, n_past, cache, ring, pos, key = run_chunks(3, last, n_past, cache, ring, pos, key)
    return 3 * chunk / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b", choices=["tiny", "tiny128", "1b", "7b", "13b"])
    # 32: the marginal-timing window (time(2N)-time(N)) must dominate the
    # tunneled backend's ~10-20 ms dispatch jitter; 16 steps (~0.1 s delta)
    # measured with ~±6% run-to-run spread at 7B
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1,
                    help=">1: batched greedy decode (continuous-batching "
                         "inner loop); reports aggregate tok/s")
    ap.add_argument("--quick", action="store_true",
                    help="headline decode metric only (skip TTFT/served/13B)")
    ap.add_argument("--hbm-gbps", type=float, default=V5E_HBM_GBPS)
    ap.add_argument("--hbm-budget-gb", type=float, default=14.5,
                    help="skip configs whose weights+KV estimate exceeds "
                         "this (v5e: 16 GB HBM minus workspace)")
    ap.add_argument("--flash", action="store_true", default=True,
                    help="use the flash-decode attention kernel (default)")
    ap.add_argument("--no-flash", dest="flash", action="store_false",
                    help="XLA attention instead of the flash-decode kernel")
    ap.add_argument("--no-fuse", action="store_true",
                    help="disable QKV/W13 out-dim fusion")
    ap.add_argument("--kv-dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"],
                    help="KV cache dtype (bfloat16 halves decode KV traffic)")
    ap.add_argument("--scan-layers", action="store_true",
                    help="scan-over-layers forward (small compile, slower "
                         "decode); default is an unrolled loop over the same "
                         "stacked weights")
    ap.add_argument("--no-stack", action="store_true",
                    help="store weights as per-layer arrays instead of "
                         "stacked [L, ...] buffers (exposes them to XLA "
                         "VMEM promotion; for comparison)")
    ap.add_argument("--weights", default="q4-packed",
                    choices=["dense-bf16", "q4-packed", "q4-packed-v",
                             "q4-packed-t", "q4-packed-w"],
                    help="q4-packed (default): fastest packed layout for the "
                         "model — fused-layer W kernels at head_dim 128, "
                         "else the VPU matvec V layout (both hardware-"
                         "parity-proven, see the selfcheck stage); -v/-t/-w "
                         "force a specific layout; dense-bf16: Q4 "
                         "dequantized once at load, 2 B/weight XLA matmuls")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from llama_swift_tpu.models import llama as model_lib

    cfg = make_cfg(args.size, args)
    params, weight_bytes = build_params(cfg, args)

    import functools

    if args.batch > 1:
        tok_per_s = batched_decode_bench(cfg, params, args.batch, args.steps)
        sol = args.hbm_gbps * 1e9 / weight_bytes
        emit(
            f"decode_tok_per_s_{args.size}_q4_0_{args.weights}_batch{args.batch}",
            tok_per_s, "tok/s", tok_per_s / (args.batch * sol),
        )
        return 0

    sol = args.hbm_gbps * 1e9 / weight_bytes
    tok_per_s = decode_bench(cfg, params, args.steps)
    headline = emit(
        f"decode_tok_per_s_{args.size}_q4_0_{args.weights}_batch1",
        tok_per_s, "tok/s", tok_per_s / sol,
    )
    if args.quick:
        return 0

    # Every stage below is fault-isolated: a failure (OOM on the tunneled
    # backend, compile error) logs to stderr and moves on — the bench always
    # ends with the headline line for last-line parsers.
    def stage(label, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — isolate bench stages
            print(f"bench: stage {label} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr, flush=True)

    # --- TTFT p50 (BASELINE.json: "decode tokens/s/chip + p50 TTFT") -------
    def run_ttft():
        n_params = model_param_count(cfg)
        for plen in sorted({min(64, cfg.n_ctx), min(512, cfg.n_ctx)}):
            t = ttft_bench(cfg, params, plen, args)
            # prefill is compute-bound: the MXU-FLOP bound is the honest
            # denominator (2 flops per weight per prompt token at bf16 peak)
            bound = 2.0 * n_params * plen / (V5E_BF16_TFLOPS * 1e12)
            emit(f"ttft_p50_s_{args.size}_q4_0_prompt{plen}", t, "s",
                 bound / t)

    stage("ttft", run_ttft)

    # --- long context (SURVEY §5.7): decode at n_ctx=2048 — O(n_past)
    # attention means low-n_past decode must run at the 512-ctx rate -------
    def run_longctx():
        if cfg.n_ctx != 512 or args.size not in ("7b", "13b"):
            return
        cfg_l = make_cfg(args.size, args, n_ctx=2048)
        params_l, wb_l = build_params(cfg_l, args)
        try:
            tps = decode_bench(cfg_l, params_l, args.steps)
            emit(f"decode_tok_per_s_{args.size}_q4_0_ctx2048", tps, "tok/s",
                 tps / (args.hbm_gbps * 1e9 / wb_l))
        finally:
            del params_l
            import gc as _gc

            _gc.collect()

    stage("longctx", run_longctx)


    # --- served throughput (runner path: chunked device-sampled decode) ----
    def run_served():
        served = served_bench(cfg, params, weight_bytes, args)
        emit(f"served_tok_per_s_{args.size}_q4_0_chunk32", served, "tok/s",
             served / sol)

    stage("served", run_served)

    # --- on-hardware kernel parity stamp (VERDICT r2 weak #8) --------------
    def run_selfcheck():
        from experiments.tpu_selfcheck import run as selfcheck_run

        err = max(selfcheck_run(steps=3).values())
        # vs_baseline: 1.0 = parity (err within tol), 0.0 = kernels diverge
        emit("kernel_parity_max_rel_err", err, "rel_err",
             1.0 if err <= 2e-3 else 0.0)

    stage("selfcheck", run_selfcheck)

    # --- engine serving aggregate (continuous batching + fused on-device
    # sampling + PAGED KV): the product serving loop under load.  Builds its
    # OWN V-layout params — batched decode has multi-row kernels for the
    # V/T layouts only (the headline W-layout stacks would dense-dequant
    # every layer every step) -----------------------------------------------
    del params
    import gc

    gc.collect()

    def run_engine():
        from llama_swift_tpu.config import SamplingConfig
        from llama_swift_tpu.runtime.engine import Engine
        from llama_swift_tpu.tokenizer import Vocab

        args_v = argparse.Namespace(**{**vars(args), "weights": "q4-packed-v"})
        params_v, _ = build_params(cfg, args_v)
        try:
            pieces = [b"<unk>", b"<s>", b"</s>"]
            pieces += [bytes([b]) for b in range(32, 127)]
            pieces += [
                f"<x{i}>".encode() for i in range(cfg.n_vocab - len(pieces))
            ]
            vocab = Vocab(pieces)
            slots = 8
            # paged pool sized for the bench load (tiny prompts + 48 tokens)
            eng = Engine(
                params_v, cfg, vocab, max_slots=slots, prefill_bucket=64,
                cache_dtype=jnp.bfloat16, paged_pages=slots * 2 + 1, page=128,
            )
            prompts = [f"the rain in spain {i} " for i in range(slots)]
            scfg = SamplingConfig(n_predict=48)
            # warm (compile admission + decode programs)
            with eng:
                list(eng.submit(prompts[0], SamplingConfig(n_predict=4)))
                t0 = time.perf_counter()
                handles = [eng.submit(p, scfg) for p in prompts]
                for h in handles:
                    list(h)
                dt = time.perf_counter() - t0
            toks = slots * 48
            emit(f"engine_tok_per_s_{args.size}_q4_0_slots{slots}_paged",
                 toks / dt, "tok/s", (toks / dt) / (slots * sol))
            # admission-under-load: submit-to-first-token while 8 streams
            # compete (chunked prefill interleaves with decode).  Same
            # denominator convention as the TTFT metrics: the MXU-FLOP
            # bound of the prompt's prefill (here ~8 tokens)
            ttfts = sorted(eng.stats.get("ttft_s", [])[1:])
            if ttfts:
                p50 = ttfts[len(ttfts) // 2]
                bound = 2.0 * model_param_count(cfg) * 8 / (
                    V5E_BF16_TFLOPS * 1e12
                )
                emit(f"engine_ttft_under_load_p50_s_{args.size}_slots{slots}",
                     p50, "s", bound / max(p50, 1e-9))
            del eng
        finally:
            del params_v
            gc.collect()

    stage("engine", run_engine)
    b_size = "13b" if args.size in ("7b", "13b") else args.size
    # batched matmuls serve through the stacked T-layout kernels (the V
    # layout's 4096-aligned in-dims balloon 13B's 5120-wide mats by ~60% and
    # don't fit with the batch cache); attention is the per-slot-O(n_past)
    # batched flash kernel either way.  batch 16/32 ride the int8 KV cache
    # (in-kernel scales) to fit 16 GB.
    args13 = argparse.Namespace(**{**vars(args), "weights": "q4-packed-t"})
    for B, b_ctx, kvd in (
        (8, 512, args.kv_dtype), (16, 512, "int8"), (32, 256, "int8"),
    ):
        b_ctx = min(b_ctx, args.n_ctx)
        args_b = argparse.Namespace(**{**vars(args13), "kv_dtype": kvd})
        cfg13 = make_cfg(b_size, args_b, n_ctx=b_ctx)
        wb13 = synthetic_weight_bytes(cfg13, "t")
        kv_itemsize = {"float32": 4, "bfloat16": 2, "int8": 1.5}[kvd]
        kv_bytes = (cfg13.n_layer * 2 * B * cfg13.n_head * b_ctx
                    * cfg13.head_dim * kv_itemsize)
        if wb13 + kv_bytes > args.hbm_budget_gb * 1e9:
            print(f"bench: skip 13B batch{B} ctx{b_ctx} {kvd}-kv: est "
                  f"{(wb13 + kv_bytes) / 1e9:.1f} GB > "
                  f"{args.hbm_budget_gb} GB budget", file=sys.stderr, flush=True)
            continue

        def run_13b(B=B, b_ctx=b_ctx, cfg13=cfg13, wb13=wb13, kvd=kvd,
                    args_b=args_b):
            params13, _ = build_params(cfg13, args_b)
            try:
                agg = batched_decode_bench(
                    cfg13, params13, B, max(8, args.steps // 2)
                )
                sol13 = args.hbm_gbps * 1e9 / wb13
                emit(f"decode_tok_per_s_{b_size}_q4_0_q4-packed-t"
                     f"_batch{B}_ctx{b_ctx}_{kvd}kv", agg, "tok/s",
                     agg / (B * sol13))
            finally:
                del params13
                gc.collect()

        stage(f"13b_batch{B}", run_13b)

    # --- 30B/65B shape+fit dryruns (no big-model chips here): subprocess
    # on virtual CPU devices — abstract lowering + per-chip HBM arithmetic
    def run_bigdry():
        import subprocess

        r = subprocess.run(
            [sys.executable, "-m", "experiments.big_model_dryrun"],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PALLAS_AXON_POOL_IPS": ""},
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            raise RuntimeError(r.stderr[-300:])

    stage("big_model_dryrun", run_bigdry)

    # repeat the headline LAST for last-line parsers
    print(json.dumps(headline), flush=True)
    return 0


def batched_decode_bench(cfg, params, B, steps):
    """Aggregate tok/s of B-slot greedy decode under one scan — the
    continuous-batching engine inner loop (runtime/engine.batched_decode);
    forward_batched streams the packed weights ONCE per step for all slots
    (vmap(forward) would re-stream them per slot)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_swift_tpu.models import llama as model_lib

    cache = model_lib.init_cache_batched(cfg, B)

    @functools.partial(jax.jit, static_argnames=("steps",), donate_argnames=("cache",))
    def batched_loop(params, tokens, n_pasts, cache, steps):
        def body(carry, _):
            tokens, n_pasts, cache = carry
            logits, cache = model_lib.forward_batched(
                params, tokens, n_pasts, cache, cfg
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, n_pasts + 1, cache), nxt

        (tokens, n_pasts, cache), out = jax.lax.scan(
            body, (tokens, n_pasts, cache), None, length=steps
        )
        return out, cache

    def run(tokens, start, steps, cache):
        t0 = time.perf_counter()
        out, cache = batched_loop(
            params, tokens, jnp.full((B,), start, jnp.int32), cache, steps
        )
        out = np.asarray(out)
        return time.perf_counter() - t0, out, cache

    tokens = jnp.full((B,), 7, dtype=jnp.int32)
    lo, hi = steps, 2 * steps
    _, out, cache = run(tokens, 0, lo, cache)
    _, out, cache = run(jnp.asarray(out[-1]), lo, hi, cache)
    t_lo, out, cache = run(jnp.asarray(out[-1]), 0, lo, cache)
    t_hi, out, cache = run(jnp.asarray(out[-1]), lo, hi, cache)
    t_lo2, out, cache = run(jnp.asarray(out[-1]), 0, lo, cache)
    t_hi2, out, cache = run(jnp.asarray(out[-1]), lo, hi, cache)
    dt = min(t_hi, t_hi2) - min(t_lo, t_lo2)
    del cache
    if dt <= 0:  # dispatch noise > scan delta (tiny models): absolute timing
        return hi * B / min(t_hi, t_hi2)
    return steps * B / dt


def decode_bench(cfg, params, steps):
    """Batch-1 greedy decode tok/s via the on-device scan loop, MARGINAL
    timing: np.asarray forces a real host fetch — block_until_ready() does
    not reliably block on the tunneled (axon) backend and dispatch overhead
    is tens of ms, so tok/s = extra steps / extra time."""
    import jax.numpy as jnp
    import numpy as np

    from llama_swift_tpu.models import llama as model_lib

    cache = model_lib.init_cache(cfg)
    token = jnp.asarray(7, dtype=jnp.int32)

    def run(tok, start, steps, cache):
        t0 = time.perf_counter()
        toks, cache = model_lib.greedy_decode_loop(
            params, tok, jnp.int32(start), cache, cfg, steps
        )
        toks = np.asarray(toks)
        return time.perf_counter() - t0, toks, cache

    lo, hi = steps, 2 * steps
    # warm both scan lengths (compile), then time each twice
    _, toks, cache = run(token, 0, lo, cache)
    _, toks, cache = run(jnp.asarray(toks[-1]), lo, hi, cache)
    t_lo, toks, cache = run(jnp.asarray(toks[-1]), 0, lo, cache)
    t_hi, toks, cache = run(jnp.asarray(toks[-1]), lo, hi, cache)
    t_lo2, toks, cache = run(jnp.asarray(toks[-1]), 0, lo, cache)
    t_hi2, toks, cache = run(jnp.asarray(toks[-1]), lo, hi, cache)
    dt = min(t_hi, t_hi2) - min(t_lo, t_lo2)
    del cache
    if dt <= 0:  # dispatch noise > scan delta (tiny models): absolute timing
        return hi / min(t_hi, t_hi2)
    return steps / dt


if __name__ == "__main__":
    sys.exit(main())
