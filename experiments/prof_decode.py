"""Trace the batch-1 decode scan loop and print the per-op device budget.

Usage: python -m experiments.prof_decode [--size 7b] [--weights q4-packed-w]
                                         [--steps 8]

Writes the xplane trace under /tmp/prof_decode/ and prints the
xplane_summary breakdown — the ms/step budget behind the headline bench
number (what streams, what's glue, what drains the DMA pipe).
"""

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b")
    ap.add_argument("--weights", default="q4-packed-w")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--kv-dtype", default="bfloat16")
    args = ap.parse_args()
    # bench.py flag surface expected by make_cfg/build_params
    args.flash = True
    args.no_fuse = False
    args.scan_layers = False
    args.no_stack = False

    import bench

    bench._enable_compile_cache()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_swift_tpu.models import llama as model_lib

    cfg = bench.make_cfg(args.size, args)
    params, weight_bytes = bench.build_params(cfg, args)
    cache = model_lib.init_cache(cfg)
    steps = args.steps

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnames=("cache",))
    def loop(params, tok, n_past, cache, n):
        def body(carry, _):
            tok, n_past, cache = carry
            logits, cache = model_lib.forward(
                params, tok[None], n_past, cache, cfg
            )
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
            return (nxt, n_past + 1, cache), nxt

        (tok, n_past, cache), out = jax.lax.scan(
            body, (tok, n_past, cache), None, length=n
        )
        return out, cache

    tok = jnp.asarray(7, jnp.int32)
    t0 = time.time()
    out, cache = loop(params, tok, jnp.int32(0), cache, steps)
    np.asarray(out)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    out, cache = loop(params, jnp.asarray(7, jnp.int32), jnp.int32(steps), cache, steps)
    np.asarray(out)
    dt = time.time() - t0
    print(f"steady: {steps/dt:.1f} tok/s ({1e3*dt/steps:.2f} ms/step)", flush=True)

    trace_dir = "/tmp/prof_decode"
    with jax.profiler.trace(trace_dir):
        out, cache = loop(
            params, jnp.asarray(7, jnp.int32), jnp.int32(2 * steps), cache, steps
        )
        np.asarray(out)

    import subprocess

    summary = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "xplane_summary.py")
    return subprocess.run(
        [sys.executable, summary, trace_dir, "30"]
    ).returncode


if __name__ == "__main__":
    sys.exit(main())
