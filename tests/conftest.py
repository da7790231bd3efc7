"""Test env: force JAX onto CPU with 8 virtual devices BEFORE jax imports.

This is the TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4 item 5): sharding/collective tests run on a simulated 8-device
host mesh; numerics tests don't need a TPU at all.
"""

import os

# The session environment pins JAX_PLATFORMS to the tunneled TPU ("axon");
# tests must run hermetically on host CPU — force-override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax may already be imported by the pytest bootstrap (its config snapshots
# JAX_PLATFORMS at import) — override through the config API too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig
from llama_swift_tpu.models.llama import random_params


@pytest.fixture(scope="session")
def tiny_cfg() -> ModelConfig:
    return ModelConfig.tiny()


@pytest.fixture(scope="session")
def tiny_tensors(tiny_cfg):
    return random_params(tiny_cfg, seed=0)


@pytest.fixture(scope="session")
def tiny_vocab_pieces(tiny_cfg):
    """A deterministic vocab of n_vocab byte pieces: specials, printable
    ASCII singles, and some multi-char merges."""
    pieces = [b"<unk>", b"<s>", b"</s>"]
    for b in range(32, 127):
        pieces.append(bytes([b]))
    merges = [b"th", b"the", b" the", b"he", b"in", b"ing", b" a", b"on",
              b"re", b"er", b" s", b"at", b"en", b"nd", b" o", b" w"]
    pieces.extend(merges)
    i = 0
    while len(pieces) < tiny_cfg.n_vocab:
        pieces.append(f"<extra_{i}>".encode())
        i += 1
    return pieces[: tiny_cfg.n_vocab]
