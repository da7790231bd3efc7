"""Probe: does the persistent compile cache round-trip Pallas programs on
the axon backend?  Run twice; the second run should report a near-zero
compile time if the cache hit."""

import os
import sys
import time

import jax
import jax.numpy as jnp

from bench import _enable_compile_cache

_enable_compile_cache()


def main():
    from llama_swift_tpu.ops.q4_vpu_pallas import Q4_0TensorV, q4_0_vpu_matvec

    out, kin = 4096, 4096
    qs4v = jnp.zeros((out // 128, 128, kin // 8), jnp.int32)
    sc = jnp.ones((out // 128, 128, kin // 32), jnp.float32)
    x = jnp.ones((1, kin), jnp.float32)

    f = jax.jit(lambda x, q, s: q4_0_vpu_matvec(x, Q4_0TensorV(scales_v=s, qs4v=q)))
    t0 = time.time()
    f(x, qs4v, sc).block_until_ready()
    print(f"first-call (compile+run): {time.time()-t0:.2f}s")
    import pathlib

    p = pathlib.Path(jax.config.jax_compilation_cache_dir)
    n = len(list(p.iterdir())) if p.exists() else 0
    print(f"cache entries: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
