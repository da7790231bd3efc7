"""Paged KV cache (BASELINE north star): page-table-indirected flash decode
kernels, paged forward_batched parity vs the dense batched cache, and the
engine's page allocate/free lifecycle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig, SamplingConfig
from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.models import llama as model_lib
from llama_swift_tpu.ops import quantized_matmul as qmm
from llama_swift_tpu.ops.attention import (
    flash_decode_attention_paged,
    flash_decode_attention_paged_int8,
)
from llama_swift_tpu.runtime.engine import Engine
from llama_swift_tpu.tokenizer import Vocab


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(9)


def _dense_ref(q, keys, values, n_pasts):
    s = jnp.einsum(
        "bhd,bhjd->bhj", q.astype(jnp.float32), keys.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) / np.sqrt(float(q.shape[-1]))
    j = jnp.arange(keys.shape[2])[None, None, :]
    s = jnp.where(j <= n_pasts[:, None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhj,bhjd->bhd", p, values.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )


def _scatter_to_pages(dense, table, page):
    """dense [B, H, ctx, Dh] -> pool [P, L=1 slice..] helper for tests:
    returns pool [P, H, page, Dh]-shaped per-layer content."""
    B, H, ctx, dh = dense.shape
    P = int(table.max()) + 2
    pool = np.zeros((P, H, page, dh), dense.dtype)
    for b in range(B):
        for c in range(ctx // page):
            pool[table[b, c], :, :, :] = dense[b, :, c * page : (c + 1) * page, :]
    return pool


def test_flash_paged_matches_dense(rng):
    L, B, H, CTX, DH, PAGE = 2, 3, 4, 256, 128, 128
    MP = CTX // PAGE
    dense_k = (rng.standard_normal((L, B, H, CTX, DH)) * 0.5).astype(np.float32)
    dense_v = (rng.standard_normal((L, B, H, CTX, DH)) * 0.5).astype(np.float32)
    # deliberately shuffled page assignment
    table = np.array([[3, 0], [4, 2], [1, 5]], np.int32)
    P = 7  # 6 data pages + scratch
    k_pool = np.zeros((P, L, H, PAGE, DH), np.float32)
    v_pool = np.zeros((P, L, H, PAGE, DH), np.float32)
    for b in range(B):
        for c in range(MP):
            k_pool[table[b, c]] = dense_k[:, b, :, c * PAGE : (c + 1) * PAGE, :]
            v_pool[table[b, c]] = dense_v[:, b, :, c * PAGE : (c + 1) * PAGE, :]
    q = rng.standard_normal((B, H, DH)).astype(np.float32)
    n_pasts = jnp.asarray([0, 130, 255], jnp.int32)
    for il in range(L):
        got, _, _ = flash_decode_attention_paged(
            jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(table), jnp.int32(il), n_pasts, interpret=True,
        )
        ref = _dense_ref(
            jnp.asarray(q), jnp.asarray(dense_k[il]), jnp.asarray(dense_v[il]),
            n_pasts,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_flash_paged_int8_matches_dense(rng):
    L, B, H, CTX, DH, PAGE = 1, 2, 4, 256, 128, 128
    MP = CTX // PAGE
    k8 = rng.integers(-127, 128, (L, B, H, CTX, DH)).astype(np.int8)
    v8 = rng.integers(-127, 128, (L, B, H, CTX, DH)).astype(np.int8)
    ks = (0.01 + 0.05 * rng.random((L, B, H, CTX, 1))).astype(np.float32)
    vs = (0.01 + 0.05 * rng.random((L, B, H, CTX, 1))).astype(np.float32)
    table = np.array([[2, 0], [3, 1]], np.int32)
    P = 5
    kp = np.zeros((P, L, H, PAGE, DH), np.int8)
    vp = np.zeros((P, L, H, PAGE, DH), np.int8)
    ksp = np.zeros((P, L, H, PAGE, 1), np.float32)
    vsp = np.zeros((P, L, H, PAGE, 1), np.float32)
    for b in range(B):
        for c in range(MP):
            sl = slice(c * PAGE, (c + 1) * PAGE)
            kp[table[b, c]] = k8[:, b, :, sl, :]
            vp[table[b, c]] = v8[:, b, :, sl, :]
            ksp[table[b, c]] = ks[:, b, :, sl, :]
            vsp[table[b, c]] = vs[:, b, :, sl, :]
    q = rng.standard_normal((B, H, DH)).astype(np.float32)
    n_pasts = jnp.asarray([7, 200], jnp.int32)
    got, _, _ = flash_decode_attention_paged_int8(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(ksp), jnp.asarray(vsp), jnp.asarray(table),
        jnp.int32(0), n_pasts, interpret=True,
    )
    ref = _dense_ref(
        jnp.asarray(q), jnp.asarray(k8[0].astype(np.float32) * ks[0]),
        jnp.asarray(v8[0].astype(np.float32) * vs[0]), n_pasts,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_forward_batched_paged_matches_dense(kv_dtype):
    """forward_batched over a paged cache == over the dense batched cache
    (same weights, same per-slot decode state built by identical prefills)."""
    cfg = ModelConfig.tiny(
        n_ctx=128, n_embd=256, n_head=2, n_rot=128, n_vocab=256, n_mult=128,
        n_layer=2, kv_cache_dtype=kv_dtype, scan_layers=False,
        use_flash_decode=True,
    )
    tensors = model_lib.random_params(cfg, seed=13)
    qt = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tensors.items()
    }
    params = model_lib.params_from_tensors(
        qt, cfg, param_dtype=jnp.float32, q4_layout="v"
    )
    B = 2
    page = 64
    prompts = [[3, 7, 9], [11, 5, 2, 8, 1]]
    orig = qmm.FORCE_PALLAS_INTERPRET
    qmm.FORCE_PALLAS_INTERPRET = True
    try:
        # dense: prefill each slot then one batched decode step
        dense = model_lib.init_cache_batched(cfg, B)
        for b, ids in enumerate(prompts):
            _, dense = model_lib.forward(
                params, jnp.asarray(ids, jnp.int32), jnp.int32(0), dense, cfg,
                slot=jnp.int32(b),
            )
        # paged: same prefills through the page table (shuffled pages)
        paged = model_lib.init_cache_paged(cfg, 8, B, page=page)
        table = np.array([[4, 1], [2, 5]], np.int32)
        paged["page_table"] = jnp.asarray(table)
        for b, ids in enumerate(prompts):
            _, paged = model_lib.forward(
                params, jnp.asarray(ids, jnp.int32), jnp.int32(0), paged, cfg,
                slot=jnp.int32(b),
            )
        toks = jnp.asarray([4, 6], jnp.int32)
        n_pasts = jnp.asarray([len(p) for p in prompts], jnp.int32)
        lg_dense, _ = model_lib.forward_batched(params, toks, n_pasts, dense, cfg)
        lg_paged, _ = model_lib.forward_batched(params, toks, n_pasts, paged, cfg)
    finally:
        qmm.FORCE_PALLAS_INTERPRET = orig
    np.testing.assert_allclose(
        np.asarray(lg_paged), np.asarray(lg_dense), rtol=3e-4, atol=3e-4
    )


@pytest.fixture(scope="module")
def engine_setup():
    cfg = ModelConfig.tiny(
        n_ctx=64, n_embd=256, n_head=2, n_rot=128, n_vocab=256, n_mult=128,
        n_layer=2, scan_layers=False, use_flash_decode=True,
    )
    tensors = model_lib.random_params(cfg, seed=21)
    qt = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tensors.items()
    }
    params = model_lib.params_from_tensors(
        qt, cfg, param_dtype=jnp.float32, q4_layout="v"
    )
    pieces = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(32, 127)]
    pieces += [f"<x{i}>".encode() for i in range(cfg.n_vocab - len(pieces))]
    return cfg, params, Vocab(pieces)


def test_engine_paged_serves_and_frees(engine_setup):
    cfg, params, vocab = engine_setup
    eng = Engine(
        params, cfg, vocab, max_slots=3, prefill_bucket=8,
        paged_pages=9, page=16,
    )
    hs = [
        eng.submit(p, SamplingConfig(n_predict=6))
        for p in ("the rain", "he said", "a b")
    ]
    with eng:
        outs = [list(h) for h in hs]
    for p, out in zip(("the rain", "he said", "a b"), outs):
        ids = vocab.tokenize(p, bos=True)
        assert len(out) == len(ids) + 6
    # all pages returned to the pool after retirement (8 data pages)
    assert sorted(eng._free_pages) == list(range(8))
    assert all(not s.pages for s in eng.slots)


def test_engine_paged_pool_exhaustion_fails_cleanly(engine_setup):
    cfg, params, vocab = engine_setup
    # 2 data pages of 16 positions: a long generation must exhaust the pool
    # and fail its stream with a typed error instead of corrupting pages
    eng = Engine(
        params, cfg, vocab, max_slots=1, prefill_bucket=8,
        paged_pages=3, page=16,
    )
    h = eng.submit("the rain in spain", SamplingConfig(n_predict=40))
    with eng:
        try:
            list(h)
            failed = False
        except Exception:
            failed = True
    assert failed  # 17-ish prompt + 40 budget > 32 positions of pool
