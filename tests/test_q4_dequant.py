"""Phase-major Pallas dequant kernel (interpret mode): the prefill
dense-matmul path of `quantized_matmul.linear` for the V / W / Q4_1-V
layouts must match the jnp dequant path exactly in f32 (every per-element
product is exact; only reduction order may differ — checked tight)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.formats.quant import Q4_0Tensor, Q4_1Tensor
from llama_swift_tpu.ops.q4_dequant_pallas import (
    phase_major_x,
    q4_dense_matmul_pm,
    q4v_dequant_pm,
)
from llama_swift_tpu.ops.q4_fused_layer import Q4_0TensorW, block_perm
from llama_swift_tpu.ops.q4_vpu_pallas import (
    Q4_0TensorV,
    Q4_1TensorV,
    dequantize_q4_0v_jnp,
    dequantize_q4_1v_jnp,
)


@pytest.fixture(scope="module")
def w_q40():
    rng = np.random.default_rng(3)
    return Q4_0Tensor.quantize(
        rng.standard_normal((256, 1024)).astype(np.float32) * 0.05
    )


@pytest.fixture(scope="module")
def w_q41():
    rng = np.random.default_rng(4)
    return Q4_1Tensor.quantize(
        rng.standard_normal((256, 1024)).astype(np.float32) * 0.05
    )


def test_dequant_pm_matches_jnp_q40(w_q40):
    v = Q4_0TensorV.from_q4_0(w_q40)
    dense = dequantize_q4_0v_jnp(v)  # [out, in], logical order
    pm = q4v_dequant_pm(v.qs4v, v.scales_v, dtype=jnp.float32, interpret=True)
    # permuting the LOGICAL dense columns into phase-major order must give
    # the kernel output exactly
    expect = np.asarray(phase_major_x(dense))
    np.testing.assert_array_equal(np.asarray(pm), expect)


def test_dequant_pm_matches_jnp_q41(w_q41):
    v = Q4_1TensorV.from_q4_1(w_q41)
    dense = dequantize_q4_1v_jnp(v)
    pm = q4v_dequant_pm(
        v.qs4v, v.sm_v, is_q41=True, dtype=jnp.float32, interpret=True
    )
    expect = np.asarray(phase_major_x(dense))
    # n·d + m: the kernel's mul-add may contract to an FMA (one rounding)
    # where the jnp path rounds twice — single-ulp tolerance
    np.testing.assert_allclose(np.asarray(pm), expect, rtol=1e-6, atol=1e-7)


def test_dense_matmul_pm_v_layout(w_q40):
    v = Q4_0TensorV.from_q4_0(w_q40)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 1024)).astype(np.float32)
    y = q4_dense_matmul_pm(
        jnp.asarray(x), v.qs4v, v.scales_v,
        mm_dtype=jnp.float32, interpret=True,
    )
    expect = x @ np.asarray(dequantize_q4_0v_jnp(v)).T
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-6, atol=1e-5)


def test_dense_matmul_pm_q41(w_q41):
    v = Q4_1TensorV.from_q4_1(w_q41)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((3, 1024)).astype(np.float32)
    y = q4_dense_matmul_pm(
        jnp.asarray(x), v.qs4v, v.sm_v, is_q41=True,
        mm_dtype=jnp.float32, interpret=True,
    )
    expect = x @ np.asarray(dequantize_q4_1v_jnp(v)).T
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-6, atol=1e-5)


def test_dense_matmul_pm_w_layout():
    rng = np.random.default_rng(9)
    # W layout needs in % 4096 == 0 (λ block permutation over nb % 128 == 0)
    w = Q4_0Tensor.quantize(
        rng.standard_normal((128, 4096)).astype(np.float32) * 0.05
    )
    wt = Q4_0TensorW.from_q4_0(w)
    x = rng.standard_normal((4, 4096)).astype(np.float32)
    y = q4_dense_matmul_pm(
        jnp.asarray(x), wt.qs4w, wt.scales_w,
        w_block_perm=block_perm(4096 // 32),
        mm_dtype=jnp.float32, interpret=True,
    )
    expect = x @ w.dequantize().T
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-6, atol=1e-5)


def test_linear_prefill_pallas_branch_matches_jnp(w_q40):
    """The full linear() dispatch: FORCE_PALLAS_INTERPRET routes the V-layout
    prefill fallback through the kernel; must match the plain jnp branch."""
    from llama_swift_tpu.ops import quantized_matmul as qmm

    v = Q4_0TensorV.from_q4_0(w_q40)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((6, 1024)).astype(np.float32) * 0.3)
    y_jnp = qmm.linear(x, v, quantize_activations=True)
    old = qmm.FORCE_PALLAS_INTERPRET
    qmm.FORCE_PALLAS_INTERPRET = True
    try:
        y_pl = qmm.linear(x, v, quantize_activations=True)
    finally:
        qmm.FORCE_PALLAS_INTERPRET = old
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_jnp), rtol=1e-6, atol=1e-5
    )
