"""Benchmark driver: single-chip Q4_0 decode throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

``vs_baseline`` is the fraction of the weight-load-bound speed of light
(tokens/s at full HBM bandwidth streaming the packed Q4_0 weight bytes once
per token — the roofline the BASELINE.md north star is phrased against;
>=0.90 is the target).  The reference publishes no numbers (BASELINE.md), so
the roofline is the honest denominator.

Weights are synthetic (random nibbles/scales generated on device — numerics
don't matter for bandwidth measurements; correctness is covered by tests/).
"""

import argparse
import json
import os
import sys
import time

# persistent compile cache: repeat runs skip the (slow, remote) TPU compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth, GB/s


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

    def gen_one(seed, shape):
        if len(shape) == 1:
            return jnp.ones(shape, jnp.float32)
        rows, cols = shape
        cols = (cols + 4095) // 4096 * 4096  # kernel in-dim padding (cvt parity)
        ot = rows // 128
        if layout == "v":
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
            name: gen_one(i, shape)
            for i, (name, shape) in enumerate(sorted(shapes.items()))
        }

    tensors = gen_all()
    for shape in shapes.values():
        if len(shape) == 1:
            total_bytes += shape[0] * 4
        else:
            rows, cols = shape
            cols = (cols + 4095) // 4096 * 4096  # padded bytes really stream
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b", choices=["tiny", "1b", "7b", "13b"])
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1,
                    help=">1: batched greedy decode (continuous-batching "
                         "inner loop); reports aggregate tok/s")
    ap.add_argument("--hbm-gbps", type=float, default=V5E_HBM_GBPS)
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
                    choices=["dense-bf16", "q4-packed", "q4-packed-t"],
                    help="q4-packed: 5-bit streaming via the VPU matvec "
                         "kernel (the serving default); q4-packed-t: legacy "
                         "tiled layout + MXU phase kernels; dense-bf16: Q4 "
                         "dequantized once at load, 2 B/weight XLA matmuls")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from llama_swift_tpu.config import GGMLType, ModelConfig
    from llama_swift_tpu.models import llama as model_lib

    sizes = {
        "tiny": dict(n_embd=512, n_head=8, n_layer=4, n_vocab=32000, n_mult=256),
        "1b": dict(n_embd=2048, n_head=16, n_layer=16, n_vocab=32000, n_mult=256),
        "7b": dict(n_embd=4096, n_head=32, n_layer=32, n_vocab=32000, n_mult=256),
        "13b": dict(n_embd=5120, n_head=40, n_layer=40, n_vocab=32000, n_mult=256),
    }
    cfg = ModelConfig(
        ftype=GGMLType.Q4_0, n_ctx=args.n_ctx, n_rot=64,
        compute_dtype="float32", quantize_activations=True,
        fuse_layer_matmuls=not args.no_fuse,
        kv_cache_dtype=args.kv_dtype,
        use_flash_decode=args.flash,
        scan_layers=args.scan_layers,
        **sizes[args.size],
    )

    stack = not args.no_stack
    if args.weights == "dense-bf16":
        tensors, weight_bytes = build_synthetic_dense_params(cfg)
        params = model_lib.params_from_tensors(
            tensors, cfg, param_dtype=jnp.bfloat16, stack_layers=stack
        )
    else:
        layout = "t" if args.weights == "q4-packed-t" else "v"
        tensors, weight_bytes = build_synthetic_q4_0_params(cfg, layout=layout)
        params = model_lib.params_from_tensors(
            tensors, cfg, param_dtype=jnp.float32, stack_layers=stack
        )

    import functools

    import jax

    if args.batch > 1:
        # batched greedy decode under one scan: the continuous-batching
        # engine's inner loop (runtime/engine.batched_decode) at full speed.
        # forward_batched streams the packed weights ONCE per step for all
        # slots (vmap(forward) would re-stream them per slot).
        import numpy as np

        B = args.batch
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
        lo, hi = args.steps, 2 * args.steps
        _, out, cache = run(tokens, 0, lo, cache)
        _, out, cache = run(jnp.asarray(out[-1]), lo, hi, cache)
        t_lo, out, cache = run(jnp.asarray(out[-1]), 0, lo, cache)
        t_hi, out, cache = run(jnp.asarray(out[-1]), lo, hi, cache)
        t_lo2, out, cache = run(jnp.asarray(out[-1]), 0, lo, cache)
        t_hi2, out, cache = run(jnp.asarray(out[-1]), lo, hi, cache)
        dt = min(t_hi, t_hi2) - min(t_lo, t_lo2)
        tok_per_s = args.steps * B / dt
        metric = f"decode_tok_per_s_{args.size}_q4_0_{args.weights}_batch{B}"
    else:
        import numpy as np

        cache = model_lib.init_cache(cfg)
        token = jnp.asarray(7, dtype=jnp.int32)

        def run(tok, start, steps, cache):
            """One timed dispatch; np.asarray forces a real host fetch —
            block_until_ready() does not reliably block on the tunneled
            (axon) backend, and dispatch overhead is tens of ms, so tok/s is
            computed from the MARGINAL cost of extra steps."""
            t0 = time.perf_counter()
            toks, cache = model_lib.greedy_decode_loop(
                params, tok, jnp.int32(start), cache, cfg, steps
            )
            toks = np.asarray(toks)
            return time.perf_counter() - t0, toks, cache

        lo = args.steps
        hi = 2 * args.steps
        # warm both scan lengths (compile), then time each twice
        _, toks, cache = run(token, 0, lo, cache)
        _, toks, cache = run(jnp.asarray(toks[-1]), lo, hi, cache)
        t_lo, toks, cache = run(jnp.asarray(toks[-1]), 0, lo, cache)
        t_hi, toks, cache = run(jnp.asarray(toks[-1]), lo, hi, cache)
        t_lo2, toks, cache = run(jnp.asarray(toks[-1]), 0, lo, cache)
        t_hi2, toks, cache = run(jnp.asarray(toks[-1]), lo, hi, cache)
        dt = min(t_hi, t_hi2) - min(t_lo, t_lo2)
        tok_per_s = args.steps / dt
        metric = f"decode_tok_per_s_{args.size}_q4_0_{args.weights}_batch1"

    sol_tok_per_s = args.hbm_gbps * 1e9 / weight_bytes
    result = {
        "metric": metric,
        "value": round(tok_per_s, 3),
        "unit": "tok/s",
        "vs_baseline": round(tok_per_s / sol_tok_per_s, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
