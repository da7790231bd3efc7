"""Scratch ablation bench: where does the 7B decode token-time go?

Times, with the marginal-cost methodology (time(2N)-time(N), forced host
fetch), on the real chip:
  A. pure matvec chain: exactly the per-token kernel sequence (32x
     [wqkv, wo, w13, w2] + output), activations chained, no attention/
     norms/rope/cache.
  B. full decode step (greedy_decode_loop body).
Prints a JSON breakdown.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_synthetic_q4_0_params
from llama_swift_tpu.config import GGMLType, ModelConfig
from llama_swift_tpu.models import llama as model_lib
from llama_swift_tpu.ops import q4_vpu_pallas as vq


def marginal(fn, lo=16, hi=32):
    def run(steps):
        t0 = time.perf_counter()
        out = fn(steps)
        np.asarray(out)
        return time.perf_counter() - t0

    run(lo); run(hi)  # compile both
    t_lo = min(run(lo), run(lo))
    t_hi = min(run(hi), run(hi))
    return (t_hi - t_lo) / (hi - lo)


def main():
    cfg = ModelConfig(
        ftype=GGMLType.Q4_0, n_ctx=512, n_rot=64,
        compute_dtype="float32", quantize_activations=True,
        fuse_layer_matmuls=True, kv_cache_dtype="bfloat16",
        n_embd=4096, n_head=32, n_layer=32, n_vocab=32000, n_mult=256,
    )
    tensors, weight_bytes = build_synthetic_q4_0_params(cfg, layout="v")
    params = model_lib.params_from_tensors(
        tensors, cfg, param_dtype=jnp.float32, stack_layers=False
    )

    # ---- A: pure matvec chain ------------------------------------------
    def chain_body(x, layer):
        qkv = vq.q4_0_vpu_matvec(x, layer["wqkv"])       # [12288]
        x1 = qkv[: cfg.n_embd]
        o = vq.q4_0_vpu_matvec(x1, layer["wo"])           # [4096]
        g13 = vq.q4_0_vpu_matvec(o, layer["w13"])         # [22016]
        x2 = g13[: 12288]
        h = vq.q4_0_vpu_matvec(x2, layer["w2"])           # [4096]
        return h * 1e-6  # keep magnitudes sane

    import functools

    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain_loop(params, x0, steps):
        def body(x, _):
            for layer in params["layers"]:
                x = chain_body(x, layer)
            y = vq.q4_0_vpu_matvec(x, params["output"])
            return x, y[0]

        x, ys = jax.lax.scan(body, x0, None, length=steps)
        return ys

    x0 = jnp.ones((cfg.n_embd,), jnp.float32) * 0.01
    t_chain = marginal(lambda s: chain_loop(params, x0, s))

    # ---- B: full decode step -------------------------------------------
    cache = model_lib.init_cache(cfg)
    token = jnp.asarray(7, jnp.int32)
    state = {"cache": cache}

    def full(steps):
        toks, state["cache"] = model_lib.greedy_decode_loop(
            params, token, jnp.int32(0), state["cache"], cfg, steps
        )
        return toks

    t_full = marginal(full)

    sol = weight_bytes / 819e9
    print(json.dumps({
        "token_time_full_ms": round(t_full * 1e3, 3),
        "token_time_chain_ms": round(t_chain * 1e3, 3),
        "non_matvec_ms": round((t_full - t_chain) * 1e3, 3),
        "sol_ms": round(sol * 1e3, 3),
        "chain_gbps": round(weight_bytes / t_chain / 1e9, 1),
        "full_tok_s": round(1.0 / t_full, 1),
    }))


if __name__ == "__main__":
    main()
