"""Multi-host serving entry point tests (single-process invocation; the
process-group flags round-trip; generation runs TP over the CPU mesh)."""

import numpy as np
import pytest

from llama_swift_tpu import serve


def test_flags_roundtrip():
    ap = serve.build_argparser()
    args = ap.parse_args([
        "--model", "/tmp/x.bin", "--coordinator", "host0:8476",
        "--num-processes", "2", "--process-id", "1", "--tp", "16",
        "--n-tokens", "4",
    ])
    assert args.coordinator == "host0:8476"
    assert args.num_processes == 2
    assert args.process_id == 1
    assert args.tp == 16
    assert args.n_tokens == 4


def test_missing_model():
    assert serve.main(["--model", "/nonexistent/file.bin"]) == 1


def test_serve_single_process_tp(tmp_path, tiny_vocab_pieces, capsys):
    """One-shot generation through the shard_map TP path, tp=8 CPU mesh."""
    import jax

    assert len(jax.devices()) >= 8
    from llama_swift_tpu.config import ModelConfig
    from llama_swift_tpu.formats import ggml
    from llama_swift_tpu.models.llama import random_params

    # head_dim 128 so each head is one V tile (serve uses q4_layout="v")
    cfg = ModelConfig.tiny(
        n_embd=1024, n_head=8, n_vocab=256, n_mult=256, n_layer=1, n_ctx=64,
        n_rot=128,
    )
    path = str(tmp_path / "tiny.bin")
    ggml.write_model_file(path, cfg, tiny_vocab_pieces, random_params(cfg, seed=4))
    rc = serve.main([
        "--model", path, "--prompt", "the rain", "--n-tokens", "3",
        "--n-ctx", "64", "--tp", "8", "--seed", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tok/s decode" in out
    assert "mesh tp=8" in out
