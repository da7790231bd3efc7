"""Per-shape Q4_0 decode-kernel microbenchmark (TPU).

Measures achieved HBM GB/s for each kernel variant on each 7B matmul shape,
against the pure-stream probe (the launch structure's bandwidth ceiling) and
the 819 GB/s v5e roofline.  Everything runs inside one process with one
``lax.scan`` timing loop per variant so the (tunneled) dispatch overhead is
amortized; iteration t's input depends on iteration t-1's output so XLA
cannot CSE or reorder the work.

Usage:  python -m llama_swift_tpu.tools.kernelbench [--iters 50] [--shapes attn,w2]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBPS = 819.0

# 7B shapes, V-layout in-dim padding (1024-multiples)
SHAPES = {
    "attn": (4096, 4096),  # wq/wk/wv/wo
    "qkv": (12288, 4096),  # fused wqkv
    "w13": (22016, 4096),  # fused w1+w3
    "w2": (4096, 11264),  # 11008 padded to 1024-multiple
    "output": (32000, 4096),
}


def synth_v(out_dim, in_dim, seed=0):
    """Synthetic V-layout weights, generated on device in one dispatch."""
    from ..ops.q4_vpu_pallas import Q4_0TensorV

    ot, kh4, nb = out_dim // 128, in_dim // 8, in_dim // 32

    @jax.jit
    def gen():
        a = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, kh4), 1)
        b = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, kh4), 2)
        qs = (a * 7 + b * 13 + seed) % (2**31 - 1)
        s1 = jax.lax.broadcasted_iota(jnp.int32, (ot, 128, nb), 2)
        scales = 0.001 + 1e-5 * (s1 % 97).astype(jnp.float32)
        return Q4_0TensorV(scales_v=scales, qs4v=qs)

    w = gen()
    bytes_streamed = out_dim * in_dim // 2 + out_dim * nb * 4
    return w, bytes_streamed


def timed_scan(step_fn, x0, iters, *, label=""):
    """step_fn: x -> (x_next, aux). Returns seconds/iter."""

    @jax.jit
    def run(x0):
        def body(x, _):
            x, _aux = step_fn(x)
            return x, ()

        xf, _ = jax.lax.scan(body, x0, None, length=iters)
        return xf

    t0 = time.time()
    run(x0).block_until_ready()
    compile_and_first = time.time() - t0
    t0 = time.time()
    run(x0).block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"    [{label}] compile+first={compile_and_first:.1f}s  {dt*1e6:.0f} us/iter")
    return dt


def bench_shape(name, out_dim, in_dim, iters, variants):
    from ..ops.q4_matmul_pallas import Q4_0TensorT
    from ..ops.q4_vpu_pallas import (
        Q4_0TensorV,
        q4_0_vpu_matvec,
        stream_probe,
    )

    w, nbytes = synth_v(out_dim, in_dim)
    print(f"  shape {name}: [{out_dim} x {in_dim}]  {nbytes/1e6:.0f} MB/pass")
    results = {}

    if "probe" in variants:
        def probe_step(b):
            y = stream_probe(w.qs4v, b)
            return b + jnp.int32(1) + (y[0] == jnp.inf).astype(jnp.int32), None

        dt = timed_scan(probe_step, jnp.int32(0), iters, label="stream-probe")
        results["probe"] = (out_dim * in_dim // 2) / dt / 1e9  # nibble bytes only

    x0 = jnp.ones((1, in_dim), jnp.float32) * 0.01

    if "vpu" in variants:
        def vpu_step(x):
            y = q4_0_vpu_matvec(x, w)
            return x * (1.0 + 1e-12 * y[0, :1]), None

        dt = timed_scan(vpu_step, x0, iters, label="vpu-matvec(qacts)")
        results["vpu"] = nbytes / dt / 1e9

    if "vpu_raw" in variants:
        def vpuraw_step(x):
            y = q4_0_vpu_matvec(x, w, quantize_acts=False)
            return x * (1.0 + 1e-12 * y[0, :1]), None

        dt = timed_scan(vpuraw_step, x0, iters, label="vpu-matvec(raw)")
        results["vpu_raw"] = nbytes / dt / 1e9

    if "dense" in variants:
        wd = jnp.zeros((out_dim, in_dim), jnp.bfloat16) + 0.01

        def dense_step(x):
            y = jnp.dot(
                x.astype(jnp.bfloat16), wd.T, preferred_element_type=jnp.float32
            )
            return x * (1.0 + 1e-12 * y[0, :1]), None

        dt = timed_scan(dense_step, x0, iters, label="dense-bf16-xla")
        results["dense"] = (out_dim * in_dim * 2) / dt / 1e9

    if "phase" in variants:
        from ..ops.q4_matmul_pallas import _q4_0_phase_matmul_call

        # T layout needs 4096-multiple in-dims
        in_t = (in_dim + 4095) // 4096 * 4096
        ot, kh4 = out_dim // 128, in_t // 8
        qs4t = jnp.zeros((ot, kh4, 128), jnp.int32) + 0x11111111
        sct = jnp.zeros((ot, in_t // 32, 128), jnp.float32) + 0.01
        xt0 = jnp.ones((8, in_t), jnp.float32) * 0.01

        def phase_step(x):
            y = _q4_0_phase_matmul_call(x, qs4t, sct)
            return x * (1.0 + 1e-12 * y[0, :1]), None

        dt = timed_scan(phase_step, xt0, iters, label="phase-kernel(T)")
        results["phase"] = (out_dim * in_t // 2 + out_dim * in_t // 8) / dt / 1e9

    for k, v in results.items():
        print(f"    -> {k:10s} {v:7.1f} GB/s  ({100*v/V5E_HBM_GBPS:.1f}% of v5e peak)")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--shapes", type=str, default="attn,qkv,w13,w2,output")
    ap.add_argument(
        "--variants", type=str, default="probe,vpu,vpu_raw,dense",
        help="comma list: probe,vpu,vpu_raw,dense,phase",
    )
    args = ap.parse_args()
    variants = args.variants.split(",")
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    all_results = {}
    for name in args.shapes.split(","):
        out_dim, in_dim = SHAPES[name]
        all_results[name] = bench_shape(name, out_dim, in_dim, args.iters, variants)
    return all_results


if __name__ == "__main__":
    main()
