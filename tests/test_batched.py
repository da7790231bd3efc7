"""Batched decode (`forward_batched`) vs per-slot single-sequence decode.

The continuous-batching engine's inner loop must produce exactly the same
logits as running each slot through the single-sequence `forward` — slots
are independent streams; batching only shares the weight stream
(SURVEY.md §2.6 DP row: the reference has no batching at all)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig
from llama_swift_tpu.models import llama as model_lib


def _params(tensors, cfg, **kw):
    return model_lib.params_from_tensors(tensors, cfg, param_dtype=jnp.float32, **kw)


def _single_decode(params, cfg, prompt, n_steps):
    """Greedy per-slot decode with the single-seq path; returns logits of
    every decode step [n_steps, n_vocab]."""
    cache = model_lib.init_cache(cfg)
    logits, cache = model_lib.prefill(
        params, jnp.asarray(prompt, jnp.int32), jnp.int32(0), cache, cfg
    )
    tok = int(jnp.argmax(logits[len(prompt) - 1]))
    n_past = len(prompt)
    outs = []
    for _ in range(n_steps):
        lg, cache = model_lib.decode_step(
            params, jnp.asarray(tok, jnp.int32), jnp.int32(n_past), cache, cfg
        )
        outs.append(np.asarray(lg))
        tok = int(jnp.argmax(lg))
        n_past += 1
    return np.stack(outs)


def _batched_decode_steps(params, cfg, prompts, n_steps):
    """Prefill each slot via the single-seq path into a layer-major batched
    cache, then run n_steps of forward_batched; returns per-slot logits
    [B, n_steps, n_vocab]."""
    B = len(prompts)
    cache_b = model_lib.init_cache_batched(cfg, B)
    tokens = np.zeros(B, np.int32)
    n_pasts = np.zeros(B, np.int32)
    for b, prompt in enumerate(prompts):
        sub = {k: v[:, b] for k, v in cache_b.items()}
        logits, sub = model_lib.forward(
            params, jnp.asarray(prompt, jnp.int32), jnp.int32(0), sub, cfg
        )
        cache_b = {
            k: cache_b[k].at[:, b].set(sub[k]) for k in cache_b
        }
        tokens[b] = int(jnp.argmax(logits[len(prompt) - 1]))
        n_pasts[b] = len(prompt)
    outs = []
    tokens = jnp.asarray(tokens)
    n_pasts = jnp.asarray(n_pasts)
    for _ in range(n_steps):
        logits, cache_b = model_lib.forward_batched(
            params, tokens, n_pasts, cache_b, cfg
        )
        outs.append(np.asarray(logits))
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        n_pasts = n_pasts + 1
    return np.stack(outs, axis=1)


# token ids must stay below ModelConfig.tiny's n_vocab (256)
PROMPTS = [[1, 5, 9], [1, 22, 207, 41, 8], [1, 7]]


@pytest.mark.parametrize("stack_layers", [True, False])
def test_forward_batched_matches_single(tiny_cfg, tiny_tensors, stack_layers):
    cfg = ModelConfig.tiny(quantize_activations=False)
    params = _params(tiny_tensors, cfg, stack_layers=stack_layers)
    got = _batched_decode_steps(params, cfg, PROMPTS, 4)
    for b, prompt in enumerate(PROMPTS):
        want = _single_decode(params, cfg, prompt, 4)
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_forward_batched_q4_matches_single(tiny_cfg, tiny_tensors):
    """Q4_0 weights (quantized activations on): batched == single per slot."""
    from llama_swift_tpu.formats.quant import Q4_0Tensor

    cfg = ModelConfig.tiny(quantize_activations=True)
    tensors = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tiny_tensors.items()
    }
    params = _params(tensors, cfg)
    got = _batched_decode_steps(params, cfg, PROMPTS[:2], 3)
    for b, prompt in enumerate(PROMPTS[:2]):
        want = _single_decode(params, cfg, prompt, 3)
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_forward_batched_int8_cache(tiny_cfg, tiny_tensors):
    """int8 KV cache through the batched path stays close to f32."""
    cfg32 = ModelConfig.tiny(quantize_activations=False)
    cfg8 = ModelConfig.tiny(quantize_activations=False, kv_cache_dtype="int8")
    params = _params(tiny_tensors, cfg32)
    got32 = _batched_decode_steps(params, cfg32, PROMPTS[:2], 2)
    got8 = _batched_decode_steps(params, cfg8, PROMPTS[:2], 2)
    # int8 cache quantization error is small relative to logit scale
    scale = np.maximum(np.abs(got32).max(), 1.0)
    assert np.max(np.abs(got32 - got8)) / scale < 0.05
