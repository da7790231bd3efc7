"""Integer Q4_0 decode kernel tests (interpret mode): must match the
reference int4×int4 dot semantics exactly (ggml.c:1558-1578)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.ops.q4_matmul_pallas import (
    Q4_0TensorT,
    q4_0_int_matmul_pallas,
    quantize_activations_q4_0_int,
)


@pytest.fixture(scope="module")
def w():
    rng = np.random.default_rng(0)
    return Q4_0Tensor.quantize(rng.standard_normal((256, 1024)).astype(np.float32) * 0.05)


def _reference_int_dot(x, w: Q4_0Tensor):
    """Scalar semantics: quantize activation blocks, int dot, scale products."""
    n, in_dim = x.shape
    nb = in_dim // 32
    out = np.zeros((n, w.shape[0]), dtype=np.float64)
    wq = w.dequantize()  # = dw * (q-8) exactly
    # activation quantization (amax/7, round half away)
    xb = x.reshape(n, nb, 32).astype(np.float64)
    amax = np.abs(xb).max(axis=-1)
    d = (amax / 7.0).astype(np.float32)
    q = np.where(
        d[..., None] > 0,
        np.trunc(xb / np.where(d[..., None] > 0, d[..., None], 1)
                 + np.where(xb >= 0, 0.5, -0.5)),
        0.0,
    )
    xdq = (q * d[..., None]).reshape(n, in_dim).astype(np.float32)
    return xdq @ wq.T


def test_int_kernel_matches_reference(w):
    t = Q4_0TensorT.from_q4_0(w)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    y = q4_0_int_matmul_pallas(jnp.asarray(x), t, interpret=True)
    ref = _reference_int_dot(x, w)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


def test_int_kernel_multi_row(w):
    t = Q4_0TensorT.from_q4_0(w)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    y = q4_0_int_matmul_pallas(jnp.asarray(x), t, interpret=True)
    ref = _reference_int_dot(x, w)
    assert y.shape == (4, 256)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


def test_int_kernel_matches_fakequant_path(w):
    """The int kernel and the fake-quant + dequant-matmul path compute the
    same quantity (associativity differences only)."""
    from llama_swift_tpu.ops.quantized_matmul import fake_quantize_q4_0

    t = Q4_0TensorT.from_q4_0(w)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    y_int = q4_0_int_matmul_pallas(jnp.asarray(x), t, interpret=True)
    xq = fake_quantize_q4_0(jnp.asarray(x))
    y_fq = np.asarray(xq) @ w.dequantize().T
    np.testing.assert_allclose(np.asarray(y_int), y_fq, rtol=2e-5, atol=2e-5)


def test_activation_quantization_int_form():
    x = jnp.asarray([[0.7, -0.7] + [0.0] * 30], dtype=jnp.float32)
    qx, dx = quantize_activations_q4_0_int(x)
    assert qx.shape == (1, 32) and dx.shape == (1, 1)
    assert qx[0, 0] == 7 and qx[0, 1] == -7
    np.testing.assert_allclose(dx[0, 0], 0.1, rtol=1e-6)


def test_zero_activation_block():
    x = jnp.zeros((1, 1024), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    w = Q4_0Tensor.quantize(rng.standard_normal((128, 1024)).astype(np.float32))
    t = Q4_0TensorT.from_q4_0(w)
    y = q4_0_int_matmul_pallas(x, t, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.zeros((1, 128), np.float32))


def test_linear_dispatches_int_kernel_small_n(w, monkeypatch):
    """linear() routes small-N Q4_0TensorT matmuls to the int kernel when
    pallas is preferred."""
    from llama_swift_tpu.ops import quantized_matmul as qmm

    t = Q4_0TensorT.from_q4_0(w)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    # prefer_pallas=True on CPU → compiled pallas path unsupported; use the
    # interpret-mode entry directly for equivalence, and the dispatch flag
    # logic via prefer_pallas=False (jnp fallback)
    y_fallback = qmm.linear(x, t, quantize_activations=True, prefer_pallas=False)
    y_int = q4_0_int_matmul_pallas(x, t, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_fallback), np.asarray(y_int), rtol=2e-4, atol=2e-4
    )
