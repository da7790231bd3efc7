"""tpu-llama: a TPU-native LLaMA inference framework with the capabilities of
alexrozanski/llama.swift (see SURVEY.md for the reference analysis).

Public API mirrors the reference's Swift surface::

    from llama_swift_tpu import LlamaRunner, RunnerConfig

    runner = LlamaRunner("ggml-model-q4_0.bin")
    async for token in runner.run("Hello", RunnerConfig(num_tokens=128)):
        print(token, end="")
"""

from .config import (
    GGMLType,
    ModelConfig,
    RunnerConfig,
    SamplingConfig,
    QK,
)
from .runtime.errors import (
    ERROR_DOMAIN,
    FailedToLoadModelError,
    LlamaError,
    PredictionFailedError,
)
from .runtime.engine import Engine, StreamHandle
from .runtime.events import Event, EventKind, RunState
from .runtime.runner import LlamaRunner
from .tokenizer import BOS_TOKEN_ID, Vocab

__all__ = [
    "BOS_TOKEN_ID",
    "ERROR_DOMAIN",
    "Engine",
    "StreamHandle",
    "Event",
    "EventKind",
    "FailedToLoadModelError",
    "GGMLType",
    "LlamaError",
    "LlamaRunner",
    "ModelConfig",
    "PredictionFailedError",
    "QK",
    "RunState",
    "RunnerConfig",
    "SamplingConfig",
    "Vocab",
]

__version__ = "0.1.0"
