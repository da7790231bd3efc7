"""Native (C++) host-runtime parity tests: mmap loader vs Python reader,
C tokenizer vs Python tokenizer, C Q4_0 codecs vs numpy codecs, mt19937
sampler determinism.  All skipped when no toolchain is present."""

import numpy as np
import pytest

from llama_swift_tpu.config import GGMLType, ModelConfig, SamplingConfig
from llama_swift_tpu.formats import ggml
from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.tokenizer import Vocab

nb = pytest.importorskip("llama_swift_tpu.native.bindings")

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory, tiny_cfg, tiny_tensors, tiny_vocab_pieces):
    path = str(tmp_path_factory.mktemp("native") / "model.bin")
    ggml.write_model_file(path, tiny_cfg, tiny_vocab_pieces, tiny_tensors)
    return path


def test_native_loader_matches_python(model_path, tiny_tensors, tiny_vocab_pieces):
    mf_native = ggml.load_model_file(model_path, use_native=True)
    mf_python = ggml.load_model_file(model_path, use_native=False)
    assert mf_native.native_handle is not None
    assert mf_python.native_handle is None
    assert mf_native.config == mf_python.config
    assert mf_native.vocab == tiny_vocab_pieces
    for name in tiny_tensors:
        np.testing.assert_array_equal(
            np.asarray(mf_native.tensors[name]), np.asarray(mf_python.tensors[name])
        )


def test_native_loader_quantized(model_path, tmp_path, tiny_tensors):
    from llama_swift_tpu.tools.quantize import quantize_model_file

    qpath = str(tmp_path / "q.bin")
    quantize_model_file(model_path, qpath, 2, log=lambda *a, **k: None)
    mf = ggml.load_model_file(qpath, use_native=True)
    assert mf.config.ftype == GGMLType.Q4_0
    for name, orig in tiny_tensors.items():
        if orig.ndim == 2:
            expect = Q4_0Tensor.quantize(orig)
            np.testing.assert_array_equal(np.asarray(mf.tensors[name].qs), expect.qs)


def test_native_loader_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        ggml.load_model_file(str(tmp_path / "nope.bin"), use_native=True)
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\xde\xad\xbe\xef" + b"\0" * 64)
    with pytest.raises(ggml.GGMLFormatError):
        ggml.load_model_file(str(bad), use_native=True)


def test_native_tokenizer_matches_python(model_path, tiny_vocab_pieces):
    mf = nb.NativeModelFile(model_path)
    try:
        nt = nb.NativeTokenizer(mf)
        pv = Vocab(tiny_vocab_pieces)
        for text in ["the rain in spain", "hello world!", "a the on", "",
                     "THE QUICK brown fox", "ab\xffab"]:
            for bos in (False, True):
                assert nt.tokenize(text, bos) == pv.tokenize(text, bos), text
    finally:
        mf.close()


def test_native_q4_0_codec_bit_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 128)).astype(np.float32)
    py = Q4_0Tensor.quantize(x).to_row_bytes()
    c = nb.quantize_q4_0(x)
    np.testing.assert_array_equal(py, c)
    back = nb.dequant_q4_0(c, 8, 128)
    np.testing.assert_array_equal(back, Q4_0Tensor.from_row_bytes(py).dequantize())


def test_native_quantize_histogram():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    _, hist = nb.quantize_q4_0(x, with_hist=True)
    assert hist.sum() == x.size


def test_native_sampler_deterministic():
    logits = np.random.default_rng(2).standard_normal(100).astype(np.float32)
    s1, s2 = nb.NativeSampler(123), nb.NativeSampler(123)
    seq1 = [s1.sample(logits, [0, 1], repeat_penalty=1.3, top_k=40, top_p=0.95,
                      temp=0.8) for _ in range(10)]
    seq2 = [s2.sample(logits, [0, 1], repeat_penalty=1.3, top_k=40, top_p=0.95,
                      temp=0.8) for _ in range(10)]
    assert seq1 == seq2
    s3 = nb.NativeSampler(124)
    seq3 = [s3.sample(logits, [0, 1], repeat_penalty=1.3, top_k=40, top_p=0.95,
                      temp=0.8) for _ in range(10)]
    assert seq1 != seq3


def test_native_sampler_respects_penalty():
    # a hugely penalized top token must lose
    logits = np.array([10.0, 9.0, 8.0], dtype=np.float32)
    s = nb.NativeSampler(0)
    out = {s.sample(logits, [0], repeat_penalty=1000.0, top_k=3, top_p=1.0,
                    temp=1.0) for _ in range(20)}
    assert 0 not in out


def test_sampler_state_mt19937_impl(model_path):
    from llama_swift_tpu.runtime.sampler import SamplerState

    cfg = SamplingConfig(seed=5, rng_impl="mt19937")
    s1, s2 = SamplerState(cfg), SamplerState(cfg)
    assert s1._native is not None
    logits = np.random.default_rng(3).standard_normal(64).astype(np.float32)
    assert [s1.sample(logits) for _ in range(8)] == [s2.sample(logits) for _ in range(8)]


def test_runner_end_to_end_native_loader(model_path):
    """Runner automatically uses the native mmap loader when available."""
    from llama_swift_tpu.config import RunnerConfig
    from llama_swift_tpu.runtime.events import EventKind
    from llama_swift_tpu.runtime.runner import LlamaRunner

    runner = LlamaRunner(model_path, n_ctx=64, prefill_bucket=8)
    events = list(runner.run_events(
        "the rain", RunnerConfig(num_tokens=4, sampling=SamplingConfig(seed=1))
    ))
    assert events[-1].kind == EventKind.COMPLETED
