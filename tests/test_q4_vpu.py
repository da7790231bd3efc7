"""VPU-matvec Q4_0 kernel tests (interpret mode): layout round-trip, exact
integer reference semantics (ggml.c:1558-1578), stacked-layer variant."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.ops.q4_vpu_pallas import (
    Q4_0TensorV,
    dequantize_q4_0v_jnp,
    q4_0_vpu_matvec,
    q4_0_vpu_matvec_stacked,
)


@pytest.fixture(scope="module")
def w():
    rng = np.random.default_rng(0)
    return Q4_0Tensor.quantize(
        rng.standard_normal((256, 1024)).astype(np.float32) * 0.05
    )


def _reference_int_dot(x, w: Q4_0Tensor):
    n, in_dim = x.shape
    nb = in_dim // 32
    wq = w.dequantize()
    xb = x.reshape(n, nb, 32).astype(np.float64)
    amax = np.abs(xb).max(axis=-1)
    d = (amax / 7.0).astype(np.float32)
    q = np.where(
        d[..., None] > 0,
        np.trunc(
            xb / np.where(d[..., None] > 0, d[..., None], 1)
            + np.where(xb >= 0, 0.5, -0.5)
        ),
        0.0,
    )
    xdq = (q * d[..., None]).reshape(n, in_dim).astype(np.float32)
    return xdq @ wq.T


def test_v_layout_roundtrip(w):
    v = Q4_0TensorV.from_q4_0(w)
    assert v.qs4v.shape == (2, 128, 128)
    assert v.scales_v.shape == (2, 128, 32)
    back = v.to_q4_0()
    np.testing.assert_array_equal(np.asarray(back.qs), np.asarray(w.qs))
    np.testing.assert_array_equal(np.asarray(back.scales), np.asarray(w.scales))


def test_v_dequant_matches_logical(w):
    v = Q4_0TensorV.from_q4_0(w)
    np.testing.assert_allclose(
        np.asarray(dequantize_q4_0v_jnp(v)), w.dequantize(), rtol=0, atol=0
    )


def test_vpu_matvec_matches_reference(w):
    v = Q4_0TensorV.from_q4_0(w)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    y = q4_0_vpu_matvec(jnp.asarray(x), v, interpret=True)
    ref = _reference_int_dot(x, w)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


def test_vpu_matvec_unquantized_acts(w):
    v = Q4_0TensorV.from_q4_0(w)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    y = q4_0_vpu_matvec(jnp.asarray(x), v, quantize_acts=False, interpret=True)
    ref = x @ w.dequantize().T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


def test_vpu_matvec_padded_in_dim(w):
    """Activations shorter than the (1024-padded) weight in-dim zero-pad."""
    v = Q4_0TensorV.from_q4_0(w)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 992)).astype(np.float32)
    y = q4_0_vpu_matvec(jnp.asarray(x), v, interpret=True)
    xp = np.pad(x, ((0, 0), (0, 32)))
    ref = _reference_int_dot(xp, w)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


def test_vpu_matvec_leading_dims(w):
    v = Q4_0TensorV.from_q4_0(w)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    y = q4_0_vpu_matvec(jnp.asarray(x)[None], v, interpret=True)
    assert y.shape == (1, 1, 256)


def test_vpu_matvec_stacked(w):
    rng = np.random.default_rng(5)
    w2 = Q4_0Tensor.quantize(
        rng.standard_normal((256, 1024)).astype(np.float32) * 0.05
    )
    v0, v1 = Q4_0TensorV.from_q4_0(w), Q4_0TensorV.from_q4_0(w2)
    stacked = Q4_0TensorV(
        scales_v=jnp.stack([jnp.asarray(v0.scales_v), jnp.asarray(v1.scales_v)]),
        qs4v=jnp.stack([jnp.asarray(v0.qs4v), jnp.asarray(v1.qs4v)]),
    )
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    for il, wl in ((0, w), (1, w2)):
        y = q4_0_vpu_matvec_stacked(jnp.asarray(x), stacked, il, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), _reference_int_dot(x, wl), rtol=2e-5, atol=2e-5
        )


def test_vpu_matches_int_kernel(w):
    """Same quantity as the T-layout integer kernel (associativity only)."""
    from llama_swift_tpu.ops.q4_matmul_pallas import (
        Q4_0TensorT,
        q4_0_int_matmul_pallas,
    )

    t = Q4_0TensorT.from_q4_0(w)
    v = Q4_0TensorV.from_q4_0(w)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    y_t = q4_0_int_matmul_pallas(jnp.asarray(x), t, interpret=True)
    y_v = q4_0_vpu_matvec(jnp.asarray(x), v, interpret=True)
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_t), rtol=2e-5, atol=2e-5)


def test_embedding_lookup_v_layout(w):
    import jax.numpy as jnp

    from llama_swift_tpu.ops import quantized_matmul as qmm

    v = Q4_0TensorV.from_q4_0(w)
    ids = jnp.asarray([0, 5, 255, 17], dtype=jnp.int32)
    e_row = qmm.embedding_lookup(ids, w)
    e_v = qmm.embedding_lookup(ids, v)
    np.testing.assert_allclose(np.asarray(e_row), np.asarray(e_v), rtol=1e-6, atol=1e-7)


def test_model_forward_v_layout_matches_rowmajor():
    """Whole-model: V-layout Q4 params give the same logits as row-major
    (CPU path: embedding V-lookup + dense-dequant matmuls)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from llama_swift_tpu.config import ModelConfig
    from llama_swift_tpu.models import llama as model_lib

    cfg = dataclasses.replace(
        ModelConfig.tiny(), n_embd=128, n_head=2, n_rot=64
    )
    dense = model_lib.random_params(cfg, seed=3)
    qt = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in dense.items()
    }
    tokens = jnp.asarray([1, 5, 9], dtype=jnp.int32)
    p_row = model_lib.params_from_tensors(
        qt, cfg, param_dtype=jnp.float32, q4_layout="none"
    )
    p_v = model_lib.params_from_tensors(
        qt, cfg, param_dtype=jnp.float32, q4_layout="v"
    )
    from llama_swift_tpu.ops.q4_vpu_pallas import Q4_0TensorV

    leaves = jax.tree_util.tree_leaves(
        p_v, is_leaf=lambda x: isinstance(x, Q4_0TensorV)
    )
    assert any(isinstance(l, Q4_0TensorV) for l in leaves), "V packing engaged"
    l_row, _ = model_lib.prefill(
        p_row, tokens, jnp.int32(0), model_lib.init_cache(cfg), cfg
    )
    l_v, _ = model_lib.prefill(
        p_v, tokens, jnp.int32(0), model_lib.init_cache(cfg), cfg
    )
    np.testing.assert_allclose(
        np.asarray(l_row), np.asarray(l_v), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# Q4_1 V-layout kernel (the 6.0-bit streaming path)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def w41():
    from llama_swift_tpu.formats.quant import Q4_1Tensor

    rng = np.random.default_rng(3)
    return Q4_1Tensor.quantize(
        (rng.standard_normal((256, 1024)) * 0.05 + 0.01).astype(np.float32)
    )


def test_q4_1_v_roundtrip(w41):
    from llama_swift_tpu.ops.q4_vpu_pallas import Q4_1TensorV

    v = Q4_1TensorV.from_q4_1(w41)
    back = v.to_q4_1()
    np.testing.assert_array_equal(np.asarray(back.scales), np.asarray(w41.scales))
    np.testing.assert_array_equal(np.asarray(back.mins), np.asarray(w41.mins))
    np.testing.assert_array_equal(np.asarray(back.qs), np.asarray(w41.qs))


def test_q4_1_v_dequant_matches_row_dequant(w41):
    from llama_swift_tpu.ops.q4_vpu_pallas import Q4_1TensorV, dequantize_q4_1v_jnp

    v = Q4_1TensorV.from_q4_1(w41)
    np.testing.assert_allclose(
        np.asarray(dequantize_q4_1v_jnp(v)), w41.dequantize(), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("quantize_acts", [False, True])
def test_q4_1_vpu_matvec_matches_linear(w41, quantize_acts):
    """Kernel vs the row-major jnp path (dense dequant dot, same activation
    fake-quant) — the q4_1 analogue of the q4_0 kernel parity test."""
    from llama_swift_tpu.ops import quantized_matmul as qmm
    from llama_swift_tpu.ops.q4_vpu_pallas import Q4_1TensorV, q4_1_vpu_matvec

    v = Q4_1TensorV.from_q4_1(w41)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    y = q4_1_vpu_matvec(
        jnp.asarray(x), v, quantize_acts=quantize_acts, interpret=True
    )
    y_ref = qmm.linear(
        jnp.asarray(x), w41, quantize_activations=quantize_acts
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-4
    )


def test_q4_1_vpu_matvec_stacked(w41):
    from llama_swift_tpu.formats.quant import Q4_1Tensor
    from llama_swift_tpu.ops import quantized_matmul as qmm
    from llama_swift_tpu.ops.q4_vpu_pallas import (
        Q4_1TensorV,
        q4_1_vpu_matvec_stacked,
    )

    rng = np.random.default_rng(13)
    ws = [w41, Q4_1Tensor.quantize(
        (rng.standard_normal((256, 1024)) * 0.04 - 0.02).astype(np.float32)
    )]
    vs = [Q4_1TensorV.from_q4_1(w) for w in ws]
    stacked = Q4_1TensorV(
        sm_v=jnp.stack([jnp.asarray(v.sm_v) for v in vs]),
        qs4v=jnp.stack([jnp.asarray(v.qs4v) for v in vs]),
    )
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    for il in range(2):
        y = q4_1_vpu_matvec_stacked(
            jnp.asarray(x), stacked, jnp.int32(il), interpret=True
        )
        y_ref = qmm.linear(jnp.asarray(x), ws[il])
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-4
        )


def test_q4_1_v_embedding_lookup(w41):
    from llama_swift_tpu.ops import quantized_matmul as qmm
    from llama_swift_tpu.ops.q4_vpu_pallas import Q4_1TensorV

    v = Q4_1TensorV.from_q4_1(w41)
    ids = jnp.asarray([0, 7, 129, 255], jnp.int32)
    e_v = qmm.embedding_lookup(ids, v)
    e_row = qmm.embedding_lookup(ids, w41)
    np.testing.assert_allclose(
        np.asarray(e_v), np.asarray(e_row), rtol=1e-6, atol=1e-7
    )


def test_model_forward_q4_1_v_matches_rowmajor(tiny_cfg, tiny_tensors):
    """Whole model with Q4_1 V-layout params == row-major Q4_1 params, and
    the decode step routes through the fused kernel when forced."""
    from llama_swift_tpu.config import ModelConfig
    from llama_swift_tpu.formats.quant import Q4_1Tensor
    from llama_swift_tpu.models import llama as model_lib
    from llama_swift_tpu.ops import quantized_matmul as qmm

    cfg = ModelConfig.tiny(n_ctx=32, n_embd=128, n_head=1, n_rot=128,
                           n_vocab=256, n_mult=64, n_layer=2)
    tensors = model_lib.random_params(cfg, seed=9)
    qt = {
        k: (Q4_1Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tensors.items()
    }
    p_row = model_lib.params_from_tensors(qt, cfg, param_dtype=jnp.float32,
                                          q4_layout="none")
    p_v = model_lib.params_from_tensors(qt, cfg, param_dtype=jnp.float32,
                                        q4_layout="v")
    tokens = jnp.asarray([1, 5, 9], jnp.int32)
    l_row, c_row = model_lib.prefill(p_row, tokens, jnp.int32(0),
                                     model_lib.init_cache(cfg), cfg)
    l_v, c_v = model_lib.prefill(p_v, tokens, jnp.int32(0),
                                 model_lib.init_cache(cfg), cfg)
    np.testing.assert_allclose(np.asarray(l_row), np.asarray(l_v),
                               rtol=2e-4, atol=2e-4)
    # decode step through the interpret-mode kernel dispatch
    qmm.FORCE_PALLAS_INTERPRET = True
    try:
        d_v, _ = model_lib.decode_step(p_v, jnp.int32(7), jnp.int32(3), c_v, cfg)
    finally:
        qmm.FORCE_PALLAS_INTERPRET = False
    d_row, _ = model_lib.decode_step(p_row, jnp.int32(7), jnp.int32(3), c_row, cfg)
    np.testing.assert_allclose(np.asarray(d_v), np.asarray(d_row),
                               rtol=2e-4, atol=2e-4)
