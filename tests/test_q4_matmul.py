"""Fused Q4_0 matmul kernel tests (interpret mode on CPU) + layout
round-trips — the kernel-level layer of SURVEY.md §4 test plan item 1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.ops import quantized_matmul as qmm
from llama_swift_tpu.ops.q4_matmul_pallas import (
    Q4_0TensorT,
    dequantize_q4_0t_jnp,
    q4_0_matmul_pallas,
)


@pytest.fixture(scope="module")
def q4_weight():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
    return Q4_0Tensor.quantize(w)


def test_transposed_roundtrip(q4_weight):
    t = Q4_0TensorT.from_q4_0(q4_weight)
    back = t.to_q4_0()
    np.testing.assert_array_equal(np.asarray(back.scales), np.asarray(q4_weight.scales))
    np.testing.assert_array_equal(np.asarray(back.qs), np.asarray(q4_weight.qs))


def test_transposed_dequant_matches_row_dequant(q4_weight):
    t = Q4_0TensorT.from_q4_0(q4_weight)
    np.testing.assert_allclose(
        np.asarray(dequantize_q4_0t_jnp(t)),
        q4_weight.dequantize(),
        rtol=1e-6, atol=1e-7,
    )


def test_kernel_interpret_matches_dense(q4_weight):
    t = Q4_0TensorT.from_q4_0(q4_weight)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    y_kernel = q4_0_matmul_pallas(jnp.asarray(x), t, interpret=True)
    y_ref = x @ q4_weight.dequantize().T
    np.testing.assert_allclose(np.asarray(y_kernel), y_ref, rtol=1e-5, atol=1e-5)


def test_kernel_interpret_single_row(q4_weight):
    """Decode matvec: n=1 padded to the 8-row sublane tile internally."""
    t = Q4_0TensorT.from_q4_0(q4_weight)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 512)).astype(np.float32)
    y = q4_0_matmul_pallas(jnp.asarray(x), t, interpret=True)
    y_ref = x @ q4_weight.dequantize().T
    assert y.shape == (1, 256)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)


def test_kernel_interpret_prefill_rows(q4_weight):
    """N-tiled grid: a prefill-sized activation batch (non-multiple of 128)."""
    t = Q4_0TensorT.from_q4_0(q4_weight)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((200, 512)).astype(np.float32)
    y = q4_0_matmul_pallas(jnp.asarray(x), t, interpret=True)
    y_ref = x @ q4_weight.dequantize().T
    assert y.shape == (200, 256)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


def test_kernel_fallback_for_unaligned_shapes():
    # in-dim too small to tile (kh=32 < 128) → jnp fallback path
    rng = np.random.default_rng(3)
    w = Q4_0Tensor.quantize(rng.standard_normal((128, 64)).astype(np.float32))
    t = Q4_0TensorT.from_q4_0(w)
    x = rng.standard_normal((2, 64)).astype(np.float32)
    y = q4_0_matmul_pallas(jnp.asarray(x), t)  # falls back to jnp path
    np.testing.assert_allclose(np.asarray(y), x @ w.dequantize().T, rtol=1e-5, atol=1e-5)


def test_unaligned_out_dim_stays_row_major(tiny_cfg, tiny_tensors):
    """Weights whose out dim isn't a 128-multiple can't use the tiled layout;
    params_from_tensors keeps them row-major and the jnp path serves them."""
    with pytest.raises(AssertionError):
        Q4_0TensorT.from_q4_0(
            Q4_0Tensor.quantize(np.zeros((96, 64), dtype=np.float32))
        )


def test_linear_dispatch_transposed_matches_rowmajor(q4_weight):
    t = Q4_0TensorT.from_q4_0(q4_weight)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 512)).astype(np.float32))
    y_row = qmm.linear(x, q4_weight, quantize_activations=True)
    y_t = qmm.linear(x, t, quantize_activations=True, prefer_pallas=False)
    np.testing.assert_allclose(np.asarray(y_row), np.asarray(y_t), rtol=1e-5, atol=1e-6)


def test_embedding_lookup_transposed(q4_weight):
    t = Q4_0TensorT.from_q4_0(q4_weight)
    ids = jnp.asarray([0, 5, 255, 17], dtype=jnp.int32)
    e_row = qmm.embedding_lookup(ids, q4_weight)
    e_t = qmm.embedding_lookup(ids, t)
    np.testing.assert_allclose(np.asarray(e_row), np.asarray(e_t), rtol=1e-6, atol=1e-7)


def test_model_forward_transposed_matches_rowmajor(tiny_cfg, tiny_tensors):
    """Whole-model: transposed Q4 params give the same logits as row-major."""
    from llama_swift_tpu.config import ModelConfig
    from llama_swift_tpu.models import llama as model_lib

    cfg = ModelConfig.tiny()
    qt = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tiny_tensors.items()
    }
    tokens = jnp.asarray([1, 5, 9], dtype=jnp.int32)

    p_row = model_lib.params_from_tensors(qt, cfg, param_dtype=jnp.float32,
                                          transpose_q4=False)
    p_t = model_lib.params_from_tensors(qt, cfg, param_dtype=jnp.float32,
                                        transpose_q4=True)
    l_row, _ = model_lib.prefill(p_row, tokens, jnp.int32(0),
                                 model_lib.init_cache(cfg), cfg)
    l_t, _ = model_lib.prefill(p_t, tokens, jnp.int32(0),
                               model_lib.init_cache(cfg), cfg)
    np.testing.assert_allclose(np.asarray(l_row), np.asarray(l_t),
                               rtol=2e-4, atol=2e-4)


def test_phase_kernel_stacked_interpret_matches_dense():
    """Stacked-layer phase kernel (the batched-decode path of ``linear`` for
    StackedQ4Ref) vs per-layer dense dequant, several layers and row counts —
    CI coverage for the dispatch branch the engine takes on TPU."""
    from llama_swift_tpu.ops.q4_matmul_pallas import (
        Q4_0TensorT as T,
        q4_0_matmul_pallas_stacked as mm_stacked,
    )

    rng = np.random.default_rng(13)
    ws = [
        Q4_0Tensor.quantize(rng.standard_normal((256, 1024)).astype(np.float32) * 0.05)
        for _ in range(3)
    ]
    ts = [T.from_q4_0(w) for w in ws]
    stacked = T(
        scales_t=jnp.stack([jnp.asarray(t.scales_t) for t in ts]),
        qs4=jnp.stack([jnp.asarray(t.qs4) for t in ts]),
    )
    for il in range(3):
        for nrows in (1, 4):
            x = rng.standard_normal((nrows, 1024)).astype(np.float32)
            y = mm_stacked(jnp.asarray(x), stacked, jnp.int32(il), interpret=True)
            ref = x @ ws[il].dequantize().T
            np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
            # and the single-layer kernel agrees with the stacked one
            y1 = q4_0_matmul_pallas(jnp.asarray(x), ts[il], interpret=True)
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(y1), rtol=1e-6, atol=1e-6
            )


def test_int_kernel_stacked_interpret_matches_single():
    """Stacked integer kernel vs the single-layer integer kernel (exact
    int4×int4 semantics must be layer-index invariant)."""
    from llama_swift_tpu.ops.q4_matmul_pallas import (
        Q4_0TensorT as T,
        q4_0_int_matmul_pallas as imm,
        q4_0_int_matmul_pallas_stacked as imm_stacked,
    )

    rng = np.random.default_rng(17)
    ws = [
        Q4_0Tensor.quantize(rng.standard_normal((128, 1024)).astype(np.float32) * 0.05)
        for _ in range(2)
    ]
    ts = [T.from_q4_0(w) for w in ws]
    stacked = T(
        scales_t=jnp.stack([jnp.asarray(t.scales_t) for t in ts]),
        qs4=jnp.stack([jnp.asarray(t.qs4) for t in ts]),
    )
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    for il in range(2):
        y = imm_stacked(jnp.asarray(x), stacked, jnp.int32(il), interpret=True)
        y1 = imm(jnp.asarray(x), ts[il], interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y1), rtol=0, atol=0)


def test_phase_kernel_interpret_matches_dense():
    """The phase-dequant kernel (magic extraction + concatenated dot) must
    match dense dequant exactly-ish."""
    from llama_swift_tpu.ops.q4_matmul_pallas import (
        Q4_0TensorT as T, q4_0_matmul_pallas as mm,
    )

    rng = np.random.default_rng(11)
    w = Q4_0Tensor.quantize(rng.standard_normal((256, 1024)).astype(np.float32) * 0.05)
    t = T.from_q4_0(w)
    for nrows in (1, 3, 8):
        x = rng.standard_normal((nrows, 1024)).astype(np.float32)
        y = mm(jnp.asarray(x), t, interpret=True)
        ref = x @ w.dequantize().T
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
