"""Flash-decode attention kernel tests (interpret mode) vs the unfused
reference — the reference's ggml_flash_attn done right and actually used."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.ops.attention import (
    flash_decode_attention,
    reference_decode_attention,
)


@pytest.fixture()
def qkv():
    rng = np.random.default_rng(0)
    H, C, D = 4, 256, 128
    q = jnp.asarray(rng.standard_normal((H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((H, C, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((H, C, D)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("n_past", [0, 5, 127, 255])
def test_flash_matches_reference(qkv, n_past):
    q, k, v = qkv
    out = flash_decode_attention(q, k, v, jnp.int32(n_past), chunk=128, interpret=True)
    ref = reference_decode_attention(q, k, v, n_past)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_single_chunk(qkv):
    q, k, v = qkv
    out = flash_decode_attention(q, k, v, jnp.int32(100), chunk=256, interpret=True)
    ref = reference_decode_attention(q, k, v, 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_ignores_stale_slots(qkv):
    """Garbage beyond n_past must not affect the result."""
    q, k, v = qkv
    k2 = k.at[:, 50:, :].set(1e6)
    v2 = v.at[:, 50:, :].set(-1e6)
    out = flash_decode_attention(q, k2, v2, jnp.int32(49), chunk=128, interpret=True)
    ref = reference_decode_attention(q, k, v, 49)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_bf16_cache(qkv):
    q, k, v = qkv
    out = flash_decode_attention(
        q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), jnp.int32(200),
        chunk=128, interpret=True,
    )
    ref = reference_decode_attention(q, k, v, 200)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("n_past", [0, 5, 129, 255])
def test_flash_stacked_matches_reference(qkv, n_past):
    """Stacked-cache kernel (layer indexed via scalar prefetch, chunks
    clamped to the n_past high-water mark) vs the unfused reference."""
    from llama_swift_tpu.ops.attention import flash_decode_attention_stacked

    q, k, v = qkv
    L = 3
    rng = np.random.default_rng(42)
    ks = jnp.stack([k] + [
        jnp.asarray(rng.standard_normal(k.shape).astype(np.float32))
        for _ in range(L - 1)
    ])
    vs = jnp.stack([v] + [
        jnp.asarray(rng.standard_normal(v.shape).astype(np.float32))
        for _ in range(L - 1)
    ])
    for il in range(L):
        out, _, _ = flash_decode_attention_stacked(
            q, ks, vs, jnp.int32(il), jnp.int32(n_past), chunk=128,
            interpret=True,
        )
        ref = reference_decode_attention(q, ks[il], vs[il], n_past)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_flash_stacked_ignores_stale_slots(qkv):
    """Chunks past the high-water mark are skipped (their DMA is elided by
    the clamped index map): garbage there must not leak into the output."""
    from llama_swift_tpu.ops.attention import flash_decode_attention_stacked

    q, k, v = qkv
    k2 = jnp.stack([k.at[:, 128:, :].set(jnp.nan)])
    v2 = jnp.stack([v.at[:, 128:, :].set(jnp.nan)])
    out, _, _ = flash_decode_attention_stacked(
        q, k2, v2, jnp.int32(0), jnp.int32(100), chunk=128, interpret=True
    )
    ref = reference_decode_attention(q, k, v, 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_model_decode_with_flash_flag(tiny_cfg, tiny_tensors):
    """forward() with use_flash_decode must match the XLA attention path."""
    import jax.numpy as jnp

    from llama_swift_tpu.config import ModelConfig
    from llama_swift_tpu.models import llama as model_lib

    base_cfg = ModelConfig.tiny(n_ctx=64)
    flash_cfg = ModelConfig.tiny(n_ctx=64, use_flash_decode=True)
    params = model_lib.params_from_tensors(tiny_tensors, base_cfg,
                                           param_dtype=jnp.float32)
    tokens = [1, 5, 9]
    outs = {}
    for name, cfg in [("xla", base_cfg), ("flash", flash_cfg)]:
        cache = model_lib.init_cache(cfg)
        _, cache = model_lib.prefill(
            params, jnp.asarray(tokens, dtype=jnp.int32), jnp.int32(0), cache, cfg
        )
        logits, _ = model_lib.decode_step(
            params, jnp.int32(7), jnp.int32(len(tokens)), cache, cfg
        )
        outs[name] = np.asarray(logits)
    np.testing.assert_allclose(outs["flash"], outs["xla"], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n_past", [0, 5, 200])
def test_flash_stacked_int8_matches_reference(qkv, n_past):
    """int8-cache kernel: in-kernel scale application must equal dequantized
    reference attention."""
    from llama_swift_tpu.ops.attention import flash_decode_attention_stacked_int8

    q, k, v = qkv
    # quantize k/v per (head, position) symmetric, like cache_write_full
    def quant(a):
        amax = np.abs(np.asarray(a)).max(axis=-1, keepdims=True)
        scale = amax / 127.0
        inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1), 0.0)
        qa = np.clip(np.round(np.asarray(a) * inv), -127, 127).astype(np.int8)
        return qa, scale.astype(np.float32)

    kq, ks = quant(k)
    vq, vs = quant(v)
    out, _, _ = flash_decode_attention_stacked_int8(
        q, jnp.asarray(kq)[None], jnp.asarray(vq)[None],
        jnp.asarray(ks)[None], jnp.asarray(vs)[None],
        jnp.int32(0), jnp.int32(n_past), chunk=128, interpret=True,
    )
    ref = reference_decode_attention(
        q, jnp.asarray(kq.astype(np.float32) * ks),
        jnp.asarray(vq.astype(np.float32) * vs), n_past,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_model_decode_int8_cache_flash_matches_xla(tiny_cfg, tiny_tensors):
    """forward() with int8 KV + flash must match the int8 XLA path."""
    import dataclasses

    import jax.numpy as jnp

    from llama_swift_tpu.config import ModelConfig
    from llama_swift_tpu.models import llama as model_lib

    outs = {}
    for name, flash in [("xla", False), ("flash", True)]:
        cfg = ModelConfig.tiny(n_ctx=64, kv_cache_dtype="int8",
                               use_flash_decode=flash, scan_layers=False)
        params = model_lib.params_from_tensors(tiny_tensors, cfg,
                                               param_dtype=jnp.float32)
        cache = model_lib.init_cache(cfg)
        _, cache = model_lib.prefill(
            params, jnp.asarray([1, 5, 9], dtype=jnp.int32), jnp.int32(0),
            cache, cfg,
        )
        logits, _ = model_lib.decode_step(
            params, jnp.int32(7), jnp.int32(3), cache, cfg
        )
        outs[name] = np.asarray(logits)
    np.testing.assert_allclose(outs["flash"], outs["xla"], rtol=2e-4, atol=2e-4)


def test_flash_prefill_xla_matches_dense():
    """Chunked online-softmax prefill attention (long-ctx path) == the
    dense-score formulation, for prompt offsets landing mid-chunk."""
    import numpy as np

    from llama_swift_tpu.models.llama import _attention, _attention_flash_xla

    rng = np.random.default_rng(17)
    H, CTX, DH, N = 4, 2048, 64, 24
    keys = jnp.asarray((rng.standard_normal((H, CTX, DH)) * 0.5).astype(np.float32))
    vals = jnp.asarray((rng.standard_normal((H, CTX, DH)) * 0.5).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((N, H, DH)).astype(np.float32))
    del _attention  # (the dense branch is the reference, inlined below)
    for n_past in (0, 37, 900):
        flash = _attention_flash_xla(
            q, keys, vals, jnp.int32(n_past), CTX, jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(flash),
            np.asarray(_dense_full(q, keys, vals, n_past)),
            rtol=2e-5, atol=2e-5,
        )


def _dense_full(q, keys, vals, n_past):
    import numpy as np

    s = jnp.einsum(
        "nhd,hjd->hnj", q.astype(jnp.float32), keys.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) / np.sqrt(float(q.shape[-1]))
    N, CTX = q.shape[0], keys.shape[1]
    i = jnp.arange(N)[:, None]
    j = jnp.arange(CTX)[None, :]
    s = jnp.where((j <= n_past + i)[None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "hnj,hjd->nhd", p, vals.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
