"""GGML file round-trip tests, incl. the multi-part col/row shard merge
(SURVEY.md §4 test layer 4; loader semantics LlamaPredictOperation.mm:306-495)."""

import struct

import numpy as np
import pytest

from llama_swift_tpu.config import GGMLType, ModelConfig
from llama_swift_tpu.formats import ggml
from llama_swift_tpu.formats.quant import Q4_0Tensor, Q4_1Tensor
from llama_swift_tpu.models.llama import random_params


def _write_and_load(tmp_path, cfg, tensors, vocab, n_parts=1, **kw):
    path = str(tmp_path / "model.bin")
    ggml.write_model_file(path, cfg, vocab, tensors, n_parts=n_parts)
    return ggml.load_model_file(path, **kw)


def test_f32_roundtrip(tmp_path, tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    mf = _write_and_load(tmp_path, tiny_cfg, tiny_tensors, tiny_vocab_pieces)
    assert mf.config.n_embd == tiny_cfg.n_embd
    assert mf.config.n_ctx == 512  # caller-supplied, not from file (.mm:133)
    assert mf.vocab == tiny_vocab_pieces
    for name, arr in tiny_tensors.items():
        np.testing.assert_array_equal(mf.tensors[name], arr)


def test_f16_roundtrip(tmp_path, tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    cfg = ModelConfig.tiny(ftype=GGMLType.F16)
    t16 = {
        k: (v.astype(np.float16) if v.ndim == 2 else v)
        for k, v in tiny_tensors.items()
    }
    mf = _write_and_load(tmp_path, cfg, t16, tiny_vocab_pieces)
    for name, arr in t16.items():
        got = mf.tensors[name]
        if arr.ndim == 2:
            assert got.dtype == np.float16
        np.testing.assert_array_equal(np.asarray(got), arr)


def _quantized_tensors(tensors, qcls):
    out = {}
    for k, v in tensors.items():
        out[k] = qcls.quantize(v) if v.ndim == 2 else v
    return out


@pytest.mark.parametrize("qcls", [Q4_0Tensor, Q4_1Tensor])
def test_quantized_roundtrip(tmp_path, tiny_cfg, tiny_tensors, tiny_vocab_pieces, qcls):
    qt = _quantized_tensors(tiny_tensors, qcls)
    ftype = GGMLType.Q4_0 if qcls is Q4_0Tensor else GGMLType.Q4_1
    cfg = ModelConfig.tiny(ftype=ftype)
    mf = _write_and_load(tmp_path, cfg, qt, tiny_vocab_pieces)
    for name, arr in qt.items():
        got = mf.tensors[name]
        if isinstance(arr, (Q4_0Tensor, Q4_1Tensor)):
            np.testing.assert_array_equal(got.dequantize(), arr.dequantize())
        else:
            np.testing.assert_array_equal(got, arr)


@pytest.mark.parametrize(
    "qmode,n_parts",
    [("f32", 2), ("f32", 4), ("q4_0", 2), ("q4_1", 2)],
    # q4 col-splits need >=1 32-elt block per part: tiny n_embd=64 → 2 parts max
)
def test_multipart_merge(tmp_path, tiny_cfg, tiny_tensors, tiny_vocab_pieces, n_parts, qmode):
    """Shards written with the reference's split_type rules must merge back to
    the full tensors (col-split for tok_embeddings/wo/w2, row-split for the
    rest — .mm:358-388)."""
    if qmode == "f32":
        tensors, cfg = tiny_tensors, tiny_cfg
    elif qmode == "q4_0":
        tensors = _quantized_tensors(tiny_tensors, Q4_0Tensor)
        cfg = ModelConfig.tiny(ftype=GGMLType.Q4_0)
    else:
        tensors = _quantized_tensors(tiny_tensors, Q4_1Tensor)
        cfg = ModelConfig.tiny(ftype=GGMLType.Q4_1)
    path = str(tmp_path / "model.bin")
    ggml.write_model_file(path, cfg, tiny_vocab_pieces, tensors, n_parts=n_parts)
    mf = ggml.load_model_file(path, n_parts=n_parts)
    for name, arr in tensors.items():
        got = mf.tensors[name]
        if isinstance(arr, (Q4_0Tensor, Q4_1Tensor)):
            np.testing.assert_array_equal(got.dequantize(), arr.dequantize())
        else:
            np.testing.assert_array_equal(np.asarray(got), arr)


def test_split_type_policy():
    assert ggml.split_type_for("tok_embeddings.weight") == 0
    assert ggml.split_type_for("layers.3.attention.wo.weight") == 0
    assert ggml.split_type_for("layers.10.feed_forward.w2.weight") == 0
    assert ggml.split_type_for("output.weight") == 1
    assert ggml.split_type_for("layers.0.attention.wq.weight") == 1
    assert ggml.split_type_for("layers.0.attention.wk.weight") == 1
    assert ggml.split_type_for("layers.0.attention.wv.weight") == 1
    assert ggml.split_type_for("layers.0.feed_forward.w1.weight") == 1
    assert ggml.split_type_for("layers.0.feed_forward.w3.weight") == 1


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(struct.pack("<I", 0xDEADBEEF) + b"\0" * 64)
    with pytest.raises(ggml.GGMLFormatError, match="bad magic"):
        ggml.load_model_file(str(p))


def test_unknown_tensor_rejected(tmp_path, tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    path = str(tmp_path / "model.bin")
    bad = dict(tiny_tensors)
    bad["not_a_real.weight"] = np.zeros((4, 4), dtype=np.float32)
    ggml.write_model_file(path, tiny_cfg, tiny_vocab_pieces, bad)
    with pytest.raises(ggml.GGMLFormatError, match="unknown tensor"):
        ggml.load_model_file(path)


def test_missing_tensor_rejected(tmp_path, tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    path = str(tmp_path / "model.bin")
    partial = dict(tiny_tensors)
    del partial["layers.1.attention.wq.weight"]
    ggml.write_model_file(path, tiny_cfg, tiny_vocab_pieces, partial)
    with pytest.raises(ggml.GGMLFormatError, match="missing"):
        ggml.load_model_file(path)


def test_n_ff_formula():
    """Exact n_ff integer formula (.mm:135): 7B → 11008."""
    assert ModelConfig.llama_7b().n_ff == 11008
    assert ModelConfig.llama_13b().n_ff == 13824
    assert ModelConfig.llama_65b().n_ff == 22016


def test_n_parts_table():
    assert ModelConfig.llama_7b().n_parts == 1
    assert ModelConfig.llama_13b().n_parts == 2
    assert ModelConfig.llama_30b().n_parts == 4
    assert ModelConfig.llama_65b().n_parts == 8
