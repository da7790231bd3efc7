"""Fused transformer-layer kernel tests (interpret mode): W layout
round-trip, both quant-prep formulations bit-equal, attn/ffn block kernels
vs the reference op sequence, and whole-model parity vs the V-layout path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_swift_tpu.config import ModelConfig
from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.models import llama as model_lib
from llama_swift_tpu.models.llama import _concat_out, _pad_weight
from llama_swift_tpu.ops.attention import reference_decode_attention
from llama_swift_tpu.ops.norms import ggml_norm
from llama_swift_tpu.ops.q4_fused_layer import (
    Q4_0TensorW,
    _quant_prep,
    _quant_prep_mosaic,
    dequantize_q4_0w_jnp,
    fused_attn_block,
    fused_ffn_block,
    rope_vectors,
)
from llama_swift_tpu.ops.quantized_matmul import fake_quantize_q4_0
from llama_swift_tpu.ops.rope import rope


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_w_layout_roundtrip(rng):
    w = Q4_0Tensor.quantize(rng.standard_normal((256, 4096)).astype(np.float32) * 0.05)
    ww = Q4_0TensorW.from_q4_0(w)
    back = ww.to_q4_0()
    np.testing.assert_array_equal(np.asarray(back.qs), np.asarray(w.qs))
    np.testing.assert_array_equal(np.asarray(back.scales), np.asarray(w.scales))
    np.testing.assert_allclose(
        np.asarray(dequantize_q4_0w_jnp(ww)), w.dequantize(), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("D", [512, 4096, 11008])
def test_prep_formulations_bit_equal(rng, D):
    """The Mosaic-lowerable roll/slice/concat prep must equal the reshape
    specification exactly (the compiled TPU path and the tested math are
    the same function)."""
    h = jnp.asarray(rng.standard_normal((1, D)).astype(np.float32))

    def runk(fn):
        def k(h_ref, a_ref, b_ref):
            xr, aux = fn(h_ref[:, :])
            a_ref[:, :] = xr
            b_ref[:, :] = aux

        return pl.pallas_call(
            k,
            out_shape=(
                jax.ShapeDtypeStruct((8, D // 8), jnp.float32),
                jax.ShapeDtypeStruct((2, D // 32), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)
            ),
            interpret=True,
        )(h)

    a = runk(_quant_prep)
    b = runk(_quant_prep_mosaic)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_ffn_block(rng):
    D, FF = 512, 1408
    w1 = Q4_0Tensor.quantize(rng.standard_normal((FF, D)).astype(np.float32) * 0.05)
    w3 = Q4_0Tensor.quantize(rng.standard_normal((FF, D)).astype(np.float32) * 0.05)
    w2 = Q4_0Tensor.quantize(rng.standard_normal((D, FF)).astype(np.float32) * 0.05)
    w13W = Q4_0TensorW.from_q4_0(_pad_weight(_concat_out([w1, w3]), in_to=4096))
    w2W = Q4_0TensorW.from_q4_0(_pad_weight(w2, in_to=4096))
    x = (rng.standard_normal((1, D)) * 0.3).astype(np.float32)
    nw = (1.0 + 0.05 * rng.standard_normal(D)).astype(np.float32)

    h = ggml_norm(jnp.asarray(x), jnp.asarray(nw), 1e-5)
    hq = fake_quantize_q4_0(h)
    g13 = hq @ jnp.asarray(_concat_out([w1, w3]).dequantize()).T
    gate = jax.nn.silu(g13[:, :FF]) * g13[:, FF:]
    ref = fake_quantize_q4_0(gate) @ jnp.asarray(w2.dequantize()).T  # delta

    out = fused_ffn_block(
        jnp.asarray(x), jnp.asarray(nw)[None, :],
        jnp.asarray(w13W.qs4w)[None], jnp.asarray(w13W.scales_w)[None],
        jnp.asarray(w2W.qs4w)[None], jnp.asarray(w2W.scales_w)[None],
        jnp.int32(0), ff_real=FF, interpret=True,
    )
    got = np.asarray(out)[:, 0, :].reshape(1, D)  # delta tiles, row 0 live
    np.testing.assert_allclose(got, np.asarray(ref), rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("n_past", [0, 67, 130])
def test_fused_attn_block(rng, n_past):
    H, DH, CTX = 4, 128, 256
    D = H * DH
    ws = [
        Q4_0Tensor.quantize(rng.standard_normal((D, D)).astype(np.float32) * 0.05)
        for _ in range(4)
    ]
    wq, wk, wv, wo = ws
    wqkv = _concat_out([wq, wk, wv])
    wqkvW = Q4_0TensorW.from_q4_0(_pad_weight(wqkv, in_to=4096))
    woW = Q4_0TensorW.from_q4_0(_pad_weight(wo, in_to=4096))
    x = (rng.standard_normal((1, D)) * 0.3).astype(np.float32)
    nw = (1.0 + 0.05 * rng.standard_normal(D)).astype(np.float32)
    kc = (rng.standard_normal((1, H, CTX, DH)) * 0.5).astype(np.float32)
    vc = (rng.standard_normal((1, H, CTX, DH)) * 0.5).astype(np.float32)

    h = ggml_norm(jnp.asarray(x), jnp.asarray(nw), 1e-5)
    qkv = fake_quantize_q4_0(h) @ jnp.asarray(wqkv.dequantize()).T
    pos = jnp.asarray([n_past], jnp.int32)
    qh = rope(qkv[:, :D].reshape(1, H, DH), pos, DH)[0]
    kh = rope(qkv[:, D : 2 * D].reshape(1, H, DH), pos, DH)[0]
    vh = qkv[:, 2 * D :].reshape(H, DH)
    kc_ref = jnp.asarray(kc).at[0, :, n_past, :].set(kh)
    vc_ref = jnp.asarray(vc).at[0, :, n_past, :].set(vh)
    ctx = reference_decode_attention(qh, kc_ref[0], vc_ref[0], n_past)
    ref = fake_quantize_q4_0(ctx.reshape(1, D)) @ jnp.asarray(
        wo.dequantize()
    ).T  # delta (residual added by the caller)

    cos, sin = rope_vectors(jnp.int32(n_past), DH)
    # the kernel reads only history j < n_past from the cache and returns
    # the new token's K/V for the caller to write at n_past
    xo, k_new, v_new = fused_attn_block(
        jnp.asarray(x), jnp.asarray(nw)[None, :], cos, sin,
        jnp.asarray(wqkvW.qs4w)[None], jnp.asarray(wqkvW.scales_w)[None],
        jnp.asarray(woW.qs4w)[None], jnp.asarray(woW.scales_w)[None],
        jnp.asarray(kc), jnp.asarray(vc), jnp.int32(0), jnp.int32(n_past),
        ctx_chunk=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(k_new), np.asarray(kh), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(v_new), np.asarray(vh), rtol=2e-5, atol=2e-5
    )
    got = np.asarray(xo)[:, 0, :].reshape(1, D)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=5e-4, atol=5e-4)


def test_model_fused_matches_v_layout(tiny_cfg, tiny_tensors):
    """Whole model: W-layout (fused kernels) == V-layout path for prefill +
    two decode steps, bf16 cache."""
    cfg = ModelConfig.tiny(
        n_ctx=128, n_embd=256, n_head=2, n_rot=128, n_vocab=256, n_mult=128,
        n_layer=2, kv_cache_dtype="bfloat16", scan_layers=False,
    )
    tensors = model_lib.random_params(cfg, seed=7)
    qt = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tensors.items()
    }
    outs = {}
    for name, layout in [("v", "v"), ("w", "w")]:
        p = model_lib.params_from_tensors(
            qt, cfg, param_dtype=jnp.float32, q4_layout=layout
        )
        cache = model_lib.init_cache(cfg)
        lg, cache = model_lib.prefill(
            p, jnp.asarray([1, 5, 9], jnp.int32), jnp.int32(0), cache, cfg
        )
        outs[name + "_p"] = np.asarray(lg)
        d, cache = model_lib.decode_step(p, jnp.int32(7), jnp.int32(3), cache, cfg)
        outs[name + "_d0"] = np.asarray(d)
        d, cache = model_lib.decode_step(p, jnp.int32(11), jnp.int32(4), cache, cfg)
        outs[name + "_d1"] = np.asarray(d)
    for k in ("_p", "_d0", "_d1"):
        np.testing.assert_allclose(
            outs["w" + k], outs["v" + k], rtol=3e-4, atol=3e-4
        )
