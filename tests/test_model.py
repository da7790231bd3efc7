"""Golden-logit tests: JAX model vs the independent NumPy reference
implementation of the §3.2 graph (SURVEY.md §4 test layer 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig
from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.models import llama as model_lib

from reference_model import forward_ref


def _np_cache(cfg):
    shape = (cfg.n_layer, cfg.n_ctx, cfg.n_head, cfg.head_dim)
    return np.zeros(shape, np.float32), np.zeros(shape, np.float32)


def _jax_params(tensors, cfg):
    return model_lib.params_from_tensors(tensors, cfg, param_dtype=jnp.float32)


def test_prefill_matches_numpy_reference(tiny_cfg, tiny_tensors):
    cfg = ModelConfig.tiny(quantize_activations=False)
    tokens = [1, 5, 9, 200, 31, 7]
    kv_k, kv_v = _np_cache(cfg)
    ref_logits = forward_ref(tiny_tensors, cfg, tokens, kv_k, kv_v, 0)

    params = _jax_params(tiny_tensors, cfg)
    cache = model_lib.init_cache(cfg)
    logits, cache = model_lib.prefill(
        params, jnp.asarray(tokens, dtype=jnp.int32), jnp.int32(0), cache, cfg
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits, rtol=2e-4, atol=2e-4
    )
    # KV cache contents must match too (post-rope keys); production cache is
    # head-major [L, H, ctx, Dh], reference buffers are [L, ctx, H, Dh]
    np.testing.assert_allclose(
        np.asarray(cache["k"]).transpose(0, 2, 1, 3)[:, : len(tokens)],
        kv_k[:, : len(tokens)],
        rtol=2e-4, atol=2e-4,
    )


def test_decode_matches_prefill(tiny_cfg, tiny_tensors):
    """Token-by-token decode must produce the same last-token logits as a
    single prefill over the same tokens (rope-at-insert equivalence,
    SURVEY.md §7 #4)."""
    cfg = ModelConfig.tiny(quantize_activations=False)
    params = _jax_params(tiny_tensors, cfg)
    tokens = [1, 3, 17, 40, 99]

    cache = model_lib.init_cache(cfg)
    logits_all, _ = model_lib.prefill(
        params, jnp.asarray(tokens, dtype=jnp.int32), jnp.int32(0), cache, cfg
    )

    cache = model_lib.init_cache(cfg)
    for i, t in enumerate(tokens):
        step_logits, cache = model_lib.decode_step(
            params, jnp.asarray(t, dtype=jnp.int32), jnp.int32(i), cache, cfg
        )
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(logits_all[-1]), rtol=1e-4, atol=1e-4
    )


def test_padded_prefill_matches_unpadded(tiny_cfg, tiny_tensors):
    cfg = ModelConfig.tiny(quantize_activations=False)
    params = _jax_params(tiny_tensors, cfg)
    tokens = [1, 3, 17]
    padded, length = model_lib.pad_tokens(tokens, 8)
    assert length == 3 and padded.shape == (8,)

    cache = model_lib.init_cache(cfg)
    lp, cache_p = model_lib.prefill(
        params, jnp.asarray(padded), jnp.int32(0), cache, cfg
    )
    cache = model_lib.init_cache(cfg)
    lu, _ = model_lib.prefill(
        params, jnp.asarray(tokens, dtype=jnp.int32), jnp.int32(0), cache, cfg
    )
    np.testing.assert_allclose(
        np.asarray(lp[length - 1]), np.asarray(lu[-1]), rtol=1e-5, atol=1e-5
    )


def test_continuation_prefill(tiny_cfg, tiny_tensors):
    """Prefill chunk 2 on top of chunk 1 == prefill of the concatenation
    (the reference's n_batch chunked prompt consumption, .mm:878-889)."""
    cfg = ModelConfig.tiny(quantize_activations=False)
    params = _jax_params(tiny_tensors, cfg)
    t1, t2 = [1, 9, 2], [7, 13]

    cache = model_lib.init_cache(cfg)
    _, cache = model_lib.prefill(
        params, jnp.asarray(t1, dtype=jnp.int32), jnp.int32(0), cache, cfg
    )
    l2, _ = model_lib.prefill(
        params, jnp.asarray(t2, dtype=jnp.int32), jnp.int32(len(t1)), cache, cfg
    )

    cache = model_lib.init_cache(cfg)
    lfull, _ = model_lib.prefill(
        params, jnp.asarray(t1 + t2, dtype=jnp.int32), jnp.int32(0), cache, cfg
    )
    np.testing.assert_allclose(
        np.asarray(l2[-1]), np.asarray(lfull[-1]), rtol=1e-4, atol=1e-4
    )


def test_q4_0_forward_matches_numpy_reference(tiny_cfg, tiny_tensors):
    """Quantized weights + activation fake-quant vs the NumPy reference on
    dequantized weights with the same fake-quant — replicating the int4×int4
    dot semantics (ggml.c:6134-6151)."""
    cfg = ModelConfig.tiny(quantize_activations=True)
    qt = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tiny_tensors.items()
    }
    deq = {
        k: (v.dequantize() if isinstance(v, Q4_0Tensor) else v)
        for k, v in qt.items()
    }
    tokens = [1, 5, 9, 2]
    kv_k, kv_v = _np_cache(cfg)
    ref_logits = forward_ref(
        deq, cfg, tokens, kv_k, kv_v, 0, quantize_activations=True
    )

    params = model_lib.params_from_tensors(qt, cfg, param_dtype=jnp.float32)
    cache = model_lib.init_cache(cfg)
    logits, _ = model_lib.prefill(
        params, jnp.asarray(tokens, dtype=jnp.int32), jnp.int32(0), cache, cfg
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=3e-4, atol=3e-4)


def test_norm_variants_differ(tiny_cfg, tiny_tensors):
    """ggml_norm (mean-centered) vs rmsnorm must actually differ — guards
    against silently implementing the wrong norm (SURVEY.md §7 #1)."""
    tokens = [1, 5]
    outs = {}
    for nt in ("layernorm", "rmsnorm"):
        cfg = ModelConfig.tiny(norm_type=nt, quantize_activations=False)
        params = _jax_params(tiny_tensors, cfg)
        cache = model_lib.init_cache(cfg)
        logits, _ = model_lib.prefill(
            params, jnp.asarray(tokens, dtype=jnp.int32), jnp.int32(0), cache, cfg
        )
        outs[nt] = np.asarray(logits)
    assert not np.allclose(outs["layernorm"], outs["rmsnorm"], atol=1e-3)


def test_int8_kv_cache_close_to_f32(tiny_cfg, tiny_tensors):
    """int8 quantized KV cache: generation logits stay close to the f32
    cache (per-head-position symmetric scales; <1% cache quantization)."""
    cfg32 = ModelConfig.tiny(quantize_activations=False)
    cfg8 = ModelConfig.tiny(quantize_activations=False, kv_cache_dtype="int8")
    params = _jax_params(tiny_tensors, cfg32)
    tokens = [1, 5, 9, 2]

    c32 = model_lib.init_cache(cfg32)
    l32, c32 = model_lib.prefill(
        params, jnp.asarray(tokens, dtype=jnp.int32), jnp.int32(0), c32, cfg32
    )
    d32, _ = model_lib.decode_step(params, jnp.int32(7), jnp.int32(4), c32, cfg32)

    c8 = model_lib.init_cache(cfg8)
    assert c8["k"].dtype == jnp.int8 and "k_scale" in c8
    l8, c8 = model_lib.prefill(
        params, jnp.asarray(tokens, dtype=jnp.int32), jnp.int32(0), c8, cfg8
    )
    d8, _ = model_lib.decode_step(params, jnp.int32(7), jnp.int32(4), c8, cfg8)

    # logits of the prefill are computed from fresh k/v (cache only matters
    # via attention reads): compare decode logits with loose tolerance
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d32), rtol=0.1, atol=0.25)
    # and they must not be wildly different in argmax ordering
    assert np.argmax(np.asarray(d8)) == np.argmax(np.asarray(d32))


def test_dense_dequant_mode_matches_quantized(tiny_cfg, tiny_tensors):
    """dense_dequant load mode == quantized params WITHOUT activation
    fake-quant (dense weights carry no quantization provenance; documented
    mode property — slightly higher fidelity than the reference's int dot)."""
    cfg = ModelConfig.tiny(quantize_activations=False)
    qt = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tiny_tensors.items()
    }
    tokens = jnp.asarray([1, 5, 9], dtype=jnp.int32)
    p_q = model_lib.params_from_tensors(qt, cfg, param_dtype=jnp.float32)
    p_d = model_lib.params_from_tensors(
        qt, cfg, param_dtype=jnp.float32, dense_dequant=True
    )
    l_q, _ = model_lib.prefill(p_q, tokens, jnp.int32(0),
                               model_lib.init_cache(cfg), cfg)
    l_d, _ = model_lib.prefill(p_d, tokens, jnp.int32(0),
                               model_lib.init_cache(cfg), cfg)
    np.testing.assert_allclose(np.asarray(l_q), np.asarray(l_d),
                               rtol=2e-4, atol=2e-4)
