"""On-hardware kernel parity self-check (VERDICT r2 weak #8).

Runs a tiny (head_dim-128) model for a few greedy decode steps twice on the
REAL backend — once through the fused-layer W kernels (the serving default),
once through the independent V-matvec kernel path — and asserts the logits
agree.  Both paths implement the exact ggml int4 dot semantics
(``ggml_vec_dot_q4_0``, ggml.c:1296-1582) so any drift beyond attention
softmax reassociation (~1e-4) means a kernel/DMA bug on hardware that the
CPU interpret-mode tests cannot see (e.g. a weight-ring race).

Usage: python -m experiments.tpu_selfcheck [--steps 4]
Exit code 0 = parity; 1 = mismatch.  Invoked by ``bench.py`` (non---quick
runs) so every recorded BENCH artifact carries an implicit hardware parity
stamp.
"""

import argparse
import sys


def run(steps: int = 4, tol: float = 2e-3) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_swift_tpu.config import GGMLType, ModelConfig
    from llama_swift_tpu.formats.quant import Q4_0Tensor
    from llama_swift_tpu.models import llama as model_lib

    def cfg_for(layout):
        return ModelConfig(
            ftype=GGMLType.Q4_0, n_ctx=256, n_rot=64,
            n_embd=512, n_head=4, n_layer=2, n_vocab=1024, n_mult=256,
            compute_dtype="float32", quantize_activations=True,
            fuse_layer_matmuls=True, kv_cache_dtype="float32",
            use_flash_decode=True,
        )

    cfg = cfg_for("w")
    rng = np.random.default_rng(0)
    tensors = {}
    for name, shape in __import__(
        "llama_swift_tpu.formats.ggml", fromlist=["expected_tensor_shapes"]
    ).expected_tensor_shapes(cfg).items():
        a = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        tensors[name] = Q4_0Tensor.quantize(a) if len(shape) == 2 else a

    def decode(q4_layout):
        params = model_lib.params_from_tensors(
            dict(tensors), cfg, param_dtype=jnp.float32,
            stack_layers=True, q4_layout=q4_layout,
        )
        cache = model_lib.init_cache(cfg)
        tok = jnp.asarray([1], jnp.int32)
        outs = []
        for i in range(steps):
            logits, cache = jax.jit(
                model_lib.forward, static_argnames=("cfg",)
            )(params, tok, jnp.int32(i), cache, cfg)
            outs.append(np.asarray(logits[0]))
            tok = jnp.argmax(logits[0])[None].astype(jnp.int32)
        return np.stack(outs)

    a = decode("w")   # fused-layer kernels
    b = decode(None)  # V-matvec kernel path

    # arbiter: exact jnp fallback (no pallas) on the same backend
    from llama_swift_tpu.ops import quantized_matmul as qmm
    orig = qmm._on_tpu
    qmm._on_tpu = lambda: False
    try:
        c = decode(None)
    finally:
        qmm._on_tpu = orig

    def rel(x, y):
        return float(np.max(np.abs(x - y) / np.maximum(np.abs(y), 1.0)))

    print(f"  fused-W  vs jnp: {rel(a, c):.3e}")
    print(f"  V-matvec vs jnp: {rel(b, c):.3e}")
    return rel(b, c), rel(a, c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--tol", type=float, default=2e-3)
    args = ap.parse_args()
    err_v, err_w = run(args.steps, args.tol)
    err = max(err_v, err_w)
    ok = err <= args.tol
    print(f"tpu_selfcheck: max rel logit err V={err_v:.3e} "
          f"fused-W={err_w:.3e} ({'OK' if ok else 'MISMATCH'}, "
          f"tol {args.tol:g})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
