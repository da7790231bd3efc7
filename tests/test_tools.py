"""Tool tests: quantize CLI parity (SURVEY.md §4 layer 4) and, when torch +
sentencepiece are importable, the converter record layout."""

import io
import os
import struct

import numpy as np
import pytest

from llama_swift_tpu.config import GGMLType, ModelConfig
from llama_swift_tpu.formats import ggml
from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.tools.quantize import quantize_model_file


def _silent(msg, end="\n"):
    pass


@pytest.fixture()
def f32_model(tmp_path, tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    path = str(tmp_path / "model-f32.bin")
    ggml.write_model_file(path, tiny_cfg, tiny_vocab_pieces, tiny_tensors)
    return path


def test_quantize_q4_0_roundtrip(f32_model, tmp_path, tiny_tensors):
    out = str(tmp_path / "model-q4_0.bin")
    assert quantize_model_file(f32_model, out, 2, log=_silent)
    mf = ggml.load_model_file(out)
    assert mf.config.ftype == GGMLType.Q4_0
    for name, orig in tiny_tensors.items():
        got = mf.tensors[name]
        if orig.ndim == 2:
            # must equal direct quantization of the f32 data
            expect = Q4_0Tensor.quantize(orig)
            np.testing.assert_array_equal(np.asarray(got.scales), expect.scales)
            np.testing.assert_array_equal(np.asarray(got.qs), expect.qs)
        else:
            np.testing.assert_array_equal(np.asarray(got), orig)  # norms stay f32


def test_quantize_q4_1(f32_model, tmp_path):
    out = str(tmp_path / "model-q4_1.bin")
    assert quantize_model_file(f32_model, out, 3, log=_silent)
    mf = ggml.load_model_file(out)
    assert mf.config.ftype == GGMLType.Q4_1


def test_quantize_only_2d_weight_tensors(f32_model, tmp_path):
    """1-D `.weight` tensors (norms) must NOT be quantized (quantize.cpp:185)."""
    out = str(tmp_path / "q.bin")
    quantize_model_file(f32_model, out, 2, log=_silent)
    with open(out, "rb") as f:
        cfg = ggml.read_header(f)
        ggml.read_vocab(f, cfg.n_vocab)
        ftypes = {r.name: r.ftype for r in ggml.iter_tensor_records(f)}
    assert ftypes["norm.weight"] == GGMLType.F32
    assert ftypes["tok_embeddings.weight"] == GGMLType.Q4_0
    assert ftypes["output.weight"] == GGMLType.Q4_0
    assert ftypes["layers.0.attention.wq.weight"] == GGMLType.Q4_0


def test_quantized_file_smaller(f32_model, tmp_path):
    out = str(tmp_path / "q.bin")
    quantize_model_file(f32_model, out, 2, log=_silent)
    # 2-D weights shrink 32bit -> 5bit; whole file must be much smaller
    assert os.path.getsize(out) < 0.35 * os.path.getsize(f32_model)


def test_quantize_histogram_output(f32_model, tmp_path):
    lines = []

    def cap(msg, end="\n"):
        lines.append(str(msg))

    quantize_model_file(f32_model, str(tmp_path / "q.bin"), 2, log=cap)
    assert any("hist:" in l for l in lines)
    assert any("quantizing" in l for l in lines)


def test_generation_from_quantized_file(f32_model, tmp_path):
    """End-to-end: f32 file → quantize tool → runner generates."""
    from llama_swift_tpu.config import RunnerConfig, SamplingConfig
    from llama_swift_tpu.runtime.events import EventKind
    from llama_swift_tpu.runtime.runner import LlamaRunner

    out = str(tmp_path / "model-q4_0.bin")
    quantize_model_file(f32_model, out, 2, log=_silent)
    runner = LlamaRunner(out, n_ctx=64, prefill_bucket=8)
    cfg = RunnerConfig(num_tokens=4, sampling=SamplingConfig(seed=1))
    events = list(runner.run_events("the rain", cfg))
    assert events[-1].kind == EventKind.COMPLETED
    assert sum(e.kind == EventKind.OUTPUT_TOKEN for e in events) > 4


def test_convert_pth_roundtrip(tmp_path):
    """Full convert parity when torch+sentencepiece exist: build a fake
    sentencepiece-less path via monkeypatched tokenizer."""
    torch = pytest.importorskip("torch")

    from llama_swift_tpu.tools import convert_pth

    class FakeTok:
        def vocab_size(self):
            return 256

        def is_unknown(self, i):
            return i == 0

        def is_control(self, i):
            return i in (1, 2)

        def is_byte(self, i):
            return 3 <= i < 7

        def id_to_piece(self, i):
            if 3 <= i < 7:
                return f"<0x{i:02X}>"
            return f"▁tok{i}"

    d = tmp_path / "7Bish"
    d.mkdir()
    # tiny fake checkpoint with reference tensor names
    cfg = ModelConfig.tiny()
    import json

    (d / "params.json").write_text(json.dumps({
        "dim": 4096, "multiple_of": 256, "n_heads": 32, "n_layers": 1,
    }))
    sd = {
        "tok_embeddings.weight": torch.zeros(8, 4),
        "norm.weight": torch.ones(4),
        "layers.0.attention.inner_attention.rope.freqs": torch.zeros(2),
    }
    torch.save(sd, d / "consolidated.00.pth")

    orig_spp = convert_pth
    import llama_swift_tpu.tools.convert_pth as m

    real_import = m.convert.__globals__

    # monkeypatch SentencePieceProcessor via sys.modules shim
    import sys
    import types

    shim = types.ModuleType("sentencepiece")
    shim.SentencePieceProcessor = lambda path: FakeTok()
    sys.modules["sentencepiece"] = shim
    try:
        outs = m.convert(str(d), ftype=1)
    finally:
        del sys.modules["sentencepiece"]

    with open(outs[0], "rb") as f:
        magic = struct.unpack("<I", f.read(4))[0]
        assert magic == 0x67676D6C
        n_vocab, n_embd = struct.unpack("<ii", f.read(8))
        assert (n_vocab, n_embd) == (256, 4096)
        f.seek(4 + 7 * 4)
        pieces = ggml.read_vocab(f, 256)
        assert pieces[0] == " ⁇ ".encode()
        assert pieces[1] == b"" and pieces[2] == b""
        assert pieces[3] == bytes([3])
        assert pieces[8] == b" tok8"
        recs = {r.name: r for r in ggml.iter_tensor_records(f)}
    assert "layers.0.attention.inner_attention.rope.freqs" not in recs
    assert recs["tok_embeddings.weight"].ftype == GGMLType.F16
    assert recs["norm.weight"].ftype == GGMLType.F32
