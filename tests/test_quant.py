"""Q4_0/Q4_1 codec tests against independently-written scalar semantics
(SURVEY.md §4 test layer 1: pack/unpack/dot vs the scalar reference
semantics of ggml.c:568-599 / utils.cpp:431-544)."""

import numpy as np
import pytest

from llama_swift_tpu.config import QK, GGMLType
from llama_swift_tpu.formats import quant
from llama_swift_tpu.formats.quant import (
    Q4_0Tensor,
    Q4_1Tensor,
    dequantize_q4_0_values,
    quantize_q4_0_values,
    round_half_away,
)


def scalar_quantize_q4_0_block(block):
    """Literal transcription of the documented scalar semantics
    (utils.cpp:448-476), element by element."""
    amax = 0.0
    for v in block:
        amax = max(amax, abs(float(v)))
    d = np.float32(amax / 7.0)
    idv = np.float32(1.0 / d) if d else np.float32(0.0)
    qs = []
    for v in block:
        x = np.float32(v) * idv
        # C round(): half away from zero
        r = np.floor(np.abs(x) + 0.5) * np.sign(x) if x != 0 else 0.0
        qs.append(int(r) + 8)
    return d, qs


def test_q4_0_matches_scalar_semantics():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 2 * QK)).astype(np.float32)
    scales, packed = quantize_q4_0_values(x)
    for r in range(4):
        for b in range(2):
            block = x[r, b * QK : (b + 1) * QK]
            d, qs = scalar_quantize_q4_0_block(block)
            assert scales[r, b] == pytest.approx(d, rel=1e-7)
            got = []
            for j in range(QK // 2):
                byte = packed[r, b * QK // 2 + j]
                got.extend([byte & 0xF, byte >> 4])
            assert got == qs


def test_round_half_away_ties():
    v = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49999, -0.49999])
    exp = np.array([1.0, 2.0, 3.0, -1.0, -2.0, -3.0, 0.0, -0.0])
    np.testing.assert_array_equal(round_half_away(v), exp)


def test_q4_0_roundtrip_bounded_error():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 4 * QK)).astype(np.float32)
    t = Q4_0Tensor.quantize(x)
    y = t.dequantize()
    # max error per element <= d/2 per block
    scales = t.scales
    err = np.abs(x - y).reshape(8, 4, QK)
    assert np.all(err <= scales[..., None] / 2 + 1e-7)


def test_q4_0_row_bytes_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 3 * QK)).astype(np.float32)
    t = Q4_0Tensor.quantize(x)
    raw = t.to_row_bytes()
    assert raw.shape == (5, 3 * quant.Q4_0_BLOCK_BYTES)
    t2 = Q4_0Tensor.from_row_bytes(raw)
    np.testing.assert_array_equal(t.scales, t2.scales)
    np.testing.assert_array_equal(t.qs, t2.qs)
    np.testing.assert_array_equal(t.dequantize(), t2.dequantize())


def test_q4_0_file_layout_interleaved():
    """Block layout [f32 d][16 nibble bytes] interleaved (ggml.c:408)."""
    x = np.arange(2 * QK, dtype=np.float32).reshape(1, 2 * QK)
    t = Q4_0Tensor.quantize(x)
    raw = t.to_row_bytes()[0]
    d0 = raw[:4].view(np.float32)[0] if hasattr(raw[:4], "view") else None
    d0 = np.frombuffer(raw[:4].tobytes(), dtype="<f4")[0]
    d1 = np.frombuffer(raw[20:24].tobytes(), dtype="<f4")[0]
    assert d0 == t.scales[0, 0]
    assert d1 == t.scales[0, 1]
    np.testing.assert_array_equal(raw[4:20], t.qs[0, :16])


def test_q4_1_roundtrip_and_planar_layout():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 2 * QK)).astype(np.float32) + 0.7
    t = Q4_1Tensor.quantize(x)
    raw = t.to_row_bytes()
    assert raw.shape == (3, 2 * quant.Q4_1_BLOCK_BYTES)
    # planar per row: [mins x nb][ds x nb][nibbles]  (utils.cpp:497-501)
    mins = np.frombuffer(raw[0, :8].tobytes(), dtype="<f4")
    np.testing.assert_array_equal(mins, t.mins[0])
    t2 = Q4_1Tensor.from_row_bytes(raw)
    np.testing.assert_array_equal(t.dequantize(), t2.dequantize())
    err = np.abs(x - t.dequantize()).reshape(3, 2, QK)
    assert np.all(err <= t.scales[..., None] / 2 + 1e-6)


def test_q4_1_tool_compat_flt_min_quirk():
    """All-negative blocks: the offline tool's max-init is +FLT_MIN
    (utils.cpp:505), so max ≈ 0 and the range stretches to zero."""
    x = -1.0 - np.arange(QK, dtype=np.float32).reshape(1, QK) / QK
    mins_t, d_t, _ = quant.quantize_q4_1_values(x, tool_compat=True)
    mins_r, d_r, _ = quant.quantize_q4_1_values(x, tool_compat=False)
    assert d_t[0, 0] > d_r[0, 0]  # tool variant sees max≈0 → wider range
    assert mins_t[0, 0] == mins_r[0, 0] == x.min()


def test_zero_block():
    x = np.zeros((1, QK), dtype=np.float32)
    scales, packed = quantize_q4_0_values(x)
    assert scales[0, 0] == 0.0
    assert np.all((packed & 0xF) == 8) and np.all((packed >> 4) == 8)
    np.testing.assert_array_equal(dequantize_q4_0_values(scales, packed), x)


def test_histogram_counts():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 2 * QK)).astype(np.float32)
    t = Q4_0Tensor.quantize(x)
    h = t.nibble_histogram()
    assert h.sum() == x.size
    assert h.shape == (16,)


def test_row_nbytes():
    assert quant.row_nbytes(GGMLType.F32, 64) == 256
    assert quant.row_nbytes(GGMLType.F16, 64) == 128
    assert quant.row_nbytes(GGMLType.Q4_0, 64) == 40  # 2 blocks * 20
    assert quant.row_nbytes(GGMLType.Q4_1, 64) == 48  # 2 blocks * 24
