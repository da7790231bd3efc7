"""On-hardware kernel parity self-check (VERDICT r2 weak #8, r4 ADVICE).

Runs a tiny (head_dim-128) model on the REAL backend through every kernel
family the serving paths dispatch, and checks each against a genuinely
Pallas-free arbiter: ``q4_layout="none"`` keeps the logical Q4_0 blocks, so
``linear`` takes the fake-quantize + dense-dequant jnp branch (NOT
``dense_dequant=True``, which would silently drop the reference's
activation quantization — ~3e-2 of quantization noise, swamping any kernel
bug), with ``use_flash_decode=False`` (XLA attention).  The
arbiter shares no Mosaic-lowered code with any kernel, so any drift beyond
f32 dot reassociation (~1e-4) means a kernel/DMA bug on hardware that the
CPU interpret-mode tests cannot see (e.g. a weight-ring race, or the r4
bf16-MXU default-precision drift this harness caught).

Families stamped (each an explicit ``q4_layout`` — r4's ADVICE found that
layout auto-selection silently aliased two "independent" paths):

  fused_w        decode via the whole-stack megakernel (serving default)
  v_matvec       decode via the V-layout VPU matvec + flash-decode kernel
  int8_kv_flash  decode with the int8 KV cache flash kernel
  batched_t      forward_batched over the stacked T-layout kernels (B=4)
  batched_v      forward_batched over the multi-row V-stream kernel (B=4)
  paged          forward_batched over the PAGED pool + page-table flash
  prefill_w      64-token prefill via q4_dense_matmul_pm (λ-permuted W)
  prefill_v      64-token prefill via q4_dense_matmul_pm (V layout)

Usage: python -m experiments.tpu_selfcheck [--steps 3]
Exit code 0 = parity; 1 = mismatch.  Invoked by ``bench.py`` (non---quick
runs) so every recorded BENCH artifact carries a hardware parity stamp over
ALL dispatched kernel families.
"""

import argparse
import dataclasses
import sys


def run(steps: int = 3) -> dict:
    """Returns {family: max relative logit error vs the Pallas-free arbiter}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_swift_tpu.config import GGMLType, ModelConfig
    from llama_swift_tpu.formats.ggml import expected_tensor_shapes
    from llama_swift_tpu.formats.quant import Q4_0Tensor
    from llama_swift_tpu.models import llama as model_lib

    base = ModelConfig(
        ftype=GGMLType.Q4_0, n_ctx=256, n_rot=64,
        n_embd=512, n_head=4, n_layer=2, n_vocab=1024, n_mult=256,
        compute_dtype="float32", quantize_activations=True,
        fuse_layer_matmuls=True, kv_cache_dtype="float32",
        use_flash_decode=True, scan_layers=False,
    )
    rng = np.random.default_rng(0)
    tensors = {}
    for name, shape in expected_tensor_shapes(base).items():
        a = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        tensors[name] = Q4_0Tensor.quantize(a) if len(shape) == 2 else a

    def build(cfg, q4_layout):
        return model_lib.params_from_tensors(
            dict(tensors), cfg, param_dtype=jnp.float32,
            stack_layers=True, q4_layout=q4_layout,
        )

    fwd = jax.jit(model_lib.forward, static_argnames=("cfg",))
    fwd_b = jax.jit(model_lib.forward_batched, static_argnames=("cfg",))

    def decode(cfg, params):
        cache = model_lib.init_cache(cfg)
        tok = jnp.asarray([1], jnp.int32)
        outs = []
        for i in range(steps):
            logits, cache = fwd(params, tok, jnp.int32(i), cache, cfg)
            outs.append(np.asarray(logits[0]))
            tok = jnp.argmax(logits[0])[None].astype(jnp.int32)
        return np.stack(outs)

    def decode_batched(cfg, params, B=4):
        cache = model_lib.init_cache_batched(cfg, B)
        toks = jnp.asarray([1, 2, 3, 5], jnp.int32)
        outs = []
        for i in range(steps):
            logits, cache = fwd_b(
                params, toks, jnp.full((B,), i, jnp.int32), cache, cfg
            )
            outs.append(np.asarray(logits))
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return np.stack(outs)

    def do_prefill(cfg, params, n=64):
        cache = model_lib.init_cache(cfg)
        toks = jnp.asarray(np.arange(1, n + 1) % cfg.n_vocab, jnp.int32)
        logits, _ = fwd(params, toks, jnp.int32(0), cache, cfg)
        return np.asarray(logits)

    def rel(x, y):
        return float(np.max(np.abs(x - y) / np.maximum(np.abs(y), 1.0)))

    # --- Pallas-free arbiters (fake-quant + dense-dequant jnp matmuls,
    # XLA attention) --------------------------------------------------------
    cfg_ref = dataclasses.replace(base, use_flash_decode=False)
    none_params = build(cfg_ref, "none")
    ref_decode = decode(cfg_ref, none_params)
    ref_prefill = do_prefill(cfg_ref, none_params)
    ref_batched = decode_batched(cfg_ref, none_params)
    del none_params

    errs = {}
    params_w = build(base, "w")
    errs["fused_w"] = rel(decode(base, params_w), ref_decode)
    errs["prefill_w"] = rel(do_prefill(base, params_w), ref_prefill)
    del params_w
    params_v = build(base, "v")
    errs["v_matvec"] = rel(decode(base, params_v), ref_decode)
    errs["prefill_v"] = rel(do_prefill(base, params_v), ref_prefill)
    errs["batched_v"] = rel(decode_batched(base, params_v), ref_batched)

    # paged family: same params, cache routed through the page pool +
    # page-table flash kernels (incl. the aliased pass-through carry)
    def decode_batched_paged(cfg, params, B=4):
        mp = -(-cfg.n_ctx // 128)
        cache = model_lib.init_cache_paged(cfg, B * mp + 1, B)
        table = np.arange(B * mp, dtype=np.int32).reshape(B, mp)
        cache["page_table"] = jnp.asarray(table)
        toks = jnp.asarray([1, 2, 3, 5], jnp.int32)
        outs = []
        for i in range(steps):
            logits, cache = fwd_b(
                params, toks, jnp.full((B,), i, jnp.int32), cache, cfg
            )
            outs.append(np.asarray(logits))
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return np.stack(outs)

    errs["paged"] = rel(decode_batched_paged(base, params_v), ref_batched)
    del params_v
    # int8 family: flash-int8 kernel vs the XLA int8 attention with the SAME
    # params/matmul path — the int8 quantizer amplifies unrelated 1e-7
    # matmul-path rounding diffs into 1-LSB cache flips (~8e-3), so a
    # cross-matmul-path comparison is chaotic; the matmul path itself is
    # already stamped by the v_matvec family above, and with it held fixed
    # the cache ints are identical and this isolates the attention kernel.
    cfg_i8 = dataclasses.replace(base, kv_cache_dtype="int8")
    cfg_i8_ref = dataclasses.replace(cfg_i8, use_flash_decode=False)
    params_i8 = build(cfg_i8, "v")
    errs["int8_kv_flash"] = rel(
        decode(cfg_i8, params_i8), decode(cfg_i8_ref, params_i8)
    )
    del params_i8
    errs["batched_t"] = rel(
        decode_batched(base, build(base, "t")), ref_batched
    )
    for k, v in errs.items():
        print(f"  {k:14s} vs pallas-free arbiter: {v:.3e}")
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tol", type=float, default=2e-3)
    args = ap.parse_args()
    errs = run(args.steps)
    err = max(errs.values())
    ok = err <= args.tol
    print(f"tpu_selfcheck: max rel logit err {err:.3e} over "
          f"{len(errs)} kernel families "
          f"({'OK' if ok else 'MISMATCH'}, tol {args.tol:g})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
