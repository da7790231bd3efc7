"""`LlamaRunner` — the public streaming-generation API.

Mirrors the reference's Swift API surface (``Sources/llama/LlamaRunner.swift``):

* an async variant — :meth:`LlamaRunner.run` returns an async iterator of
  token strings (the ``AsyncThrowingStream`` analogue, ``LlamaRunner.swift:51-87``)
  with an optional ``state_change_handler`` receiving :class:`RunState`
  transitions;
* a closure variant — :meth:`LlamaRunner.run_with_callback`
  (``LlamaRunner.swift:90-123``);
* plus the underlying synchronous event stream :meth:`LlamaRunner.run_events`
  (the ``_LlamaEvent`` level, which the Swift layer wraps).

Behavioral parity notes (generation loop,
``Sources/llamaObjCxx/bridge/LlamaPredictOperation.mm:768-911``):

* empty prompt → a canned random prompt (``gpt_random_prompt``,
  ``utils.cpp:102-119``; our canned list differs — behavior, not data,
  parity);
* ``n_predict`` is clamped to ``n_ctx - len(prompt_tokens)`` (``:812``);
* the token stream ECHOES the prompt: every consumed prompt token is emitted
  as an ``outputToken`` event before generated ones (``:892-895``);
* the last-n ring starts as ``repeat_last_n`` zeros and is fed prompt tokens
  as they are consumed (``:827-829, 884-885``);
* there is NO eos-stop in this vintage — generation runs to the token budget;
* the reference tokenizes ``reversePrompt`` but never uses it
  (``:815`` — a no-op).  We honor it for real (capability fix, SURVEY.md §7
  phase 3): generation stops when the tail of the emitted ids equals the
  tokenized reverse prompt.

Deliberate fixes over the reference: the model is loaded ONCE per runner
(the reference reloads per run, ``LlamaRunnerBridge.mm:45-48`` + ``:790``),
and all sampling knobs are exposed (``RunnerConfig.sampling``).
"""

from __future__ import annotations

import asyncio
import queue as queue_mod
import threading
import time
from typing import AsyncIterator, Callable, Iterator, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, RunnerConfig
from ..formats import ggml
from ..models import llama as model_lib
from ..tokenizer import Vocab
from .errors import FailedToLoadModelError, LlamaError, PredictionFailedError
from .events import Event, RunState
from .sampler import SamplerState

_RANDOM_PROMPTS = [
    "So",
    "Once upon a time,",
    "When",
    "The",
    "After",
    "If",
    "import",
    "He",
    "She",
    "They",
]


class LlamaRunner:
    """Load a GGML model and stream generated tokens.

    ``model_path`` plays the role of ``modelURL``
    (``LlamaRunner.swift:42-47``); the model is lazily loaded on first run
    and cached for subsequent runs.
    """

    def __init__(
        self,
        model_path: str,
        *,
        n_ctx: int = 512,
        param_dtype=None,
        prefill_bucket: int = 64,
    ):
        self.model_path = model_path
        self.n_ctx = n_ctx
        self.param_dtype = param_dtype
        self.prefill_bucket = prefill_bucket
        self._loaded = False
        self.config: Optional[ModelConfig] = None
        self.vocab: Optional[Vocab] = None
        self.params = None
        # perf counters the reference accumulates but never reports
        # (LlamaPredictOperation.mm:778-871) — we report them (SURVEY §5.1)
        self.stats: dict = {}

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------

    def ensure_loaded(self) -> None:
        if self._loaded:
            return
        t0 = time.perf_counter()
        try:
            mf = ggml.load_model_file(self.model_path, n_ctx=self.n_ctx)
        except FileNotFoundError as e:
            raise FailedToLoadModelError(f"failed to open '{self.model_path}'") from e
        except ggml.GGMLFormatError as e:
            raise FailedToLoadModelError(str(e)) from e
        self.config = mf.config
        self.vocab = Vocab(mf.vocab)
        self.params = model_lib.params_from_tensors(
            mf.tensors, mf.config, param_dtype=self.param_dtype
        )
        self._loaded = True
        self.stats["t_load_s"] = time.perf_counter() - t0

    # ------------------------------------------------------------------
    # core synchronous event loop
    # ------------------------------------------------------------------

    def run_events(
        self, prompt: str, config: Optional[RunnerConfig] = None
    ) -> Iterator[Event]:
        """Synchronous generator of lifecycle events — the ``_LlamaEvent``
        stream (``LlamaPredictOperation.mm:785-900``)."""
        config = config or RunnerConfig()
        yield Event.started_loading_model()
        try:
            self.ensure_loaded()
        except LlamaError as e:
            yield Event.failed(e)
            return
        yield Event.finished_loading_model()
        yield Event.started_generating_output()

        try:
            sampling = config.resolved_sampling()
            sampler = SamplerState(sampling)
            if not prompt:
                prompt = _RANDOM_PROMPTS[int(sampler.rng.integers(len(_RANDOM_PROMPTS)))]

            assert self.vocab is not None and self.config is not None
            cfg = self.config
            prompt_ids = self.vocab.tokenize(prompt, bos=True)
            if len(prompt_ids) >= cfg.n_ctx:
                prompt_ids = prompt_ids[: cfg.n_ctx - 1]
            n_predict = min(sampling.n_predict, cfg.n_ctx - len(prompt_ids))
            reverse_ids = (
                self.vocab.tokenize(config.reverse_prompt, bos=False)
                if config.reverse_prompt
                else []
            )

            t0 = time.perf_counter()
            cache = model_lib.init_cache(cfg)
            if config.chunked_prefill:
                # reference-style n_batch chunked prompt consumption
                # (.mm:878-889); one compiled shape, reused per chunk
                nb = max(1, sampling.n_batch)
                n_done = 0
                logits = None
                while n_done < len(prompt_ids):
                    chunk = prompt_ids[n_done : n_done + nb]
                    padded, length = model_lib.pad_tokens(chunk, nb)
                    logits_all, cache = model_lib.prefill(
                        self.params, jnp.asarray(padded), jnp.int32(n_done),
                        cache, cfg,
                    )
                    logits = np.asarray(logits_all[length - 1])
                    n_done += len(chunk)
            else:
                padded, length = model_lib.pad_tokens(prompt_ids, self.prefill_bucket)
                logits_all, cache = model_lib.prefill(
                    self.params, jnp.asarray(padded), jnp.int32(0), cache, cfg
                )
                logits = np.asarray(logits_all[length - 1])
            self.stats["t_prefill_s"] = time.perf_counter() - t0
            self.stats["prompt_tokens"] = len(prompt_ids)

            # echo prompt tokens through the stream (.mm:892-895)
            for tid in prompt_ids:
                sampler.observe(tid)
                yield Event.output_token(self.vocab.piece_str(tid))

            n_past = len(prompt_ids)
            generated: list[int] = []
            t_decode = 0.0
            if config.device_sampling:
                # N tokens per dispatch, sampling fused into the decode loop
                # (runtime/device_sampler.py) — the serving-throughput path
                yield from self._decode_device(
                    config, sampling, prompt_ids, reverse_ids, n_predict,
                    cache, generated,
                )
            else:
                # host sampler per token: numpy / native-mt19937 RNG-stream
                # parity options (one device round trip per token)
                for _ in range(n_predict):
                    tid = sampler.sample(logits)
                    generated.append(tid)
                    if reverse_ids and generated[-len(reverse_ids):] == reverse_ids:
                        break
                    yield Event.output_token(self.vocab.piece_str(tid))
                    if len(generated) >= n_predict:
                        break
                    t1 = time.perf_counter()
                    step_logits, cache = model_lib.decode_step(
                        self.params, jnp.asarray(tid, dtype=jnp.int32),
                        jnp.int32(n_past), cache, cfg,
                    )
                    logits = np.asarray(step_logits)
                    t_decode += time.perf_counter() - t1
                    n_past += 1
                self.stats["t_decode_s"] = t_decode
                self.stats["generated_tokens"] = len(generated)
                if t_decode > 0 and len(generated) > 1:
                    self.stats["decode_tok_per_s"] = (len(generated) - 1) / t_decode
        except LlamaError as e:
            yield Event.failed(e)
            return
        except Exception as e:  # pragma: no cover - defensive
            yield Event.failed(PredictionFailedError(str(e)))
            return
        yield Event.completed()

    def _decode_device(
        self, config, sampling, prompt_ids, reverse_ids, n_predict,
        cache, generated,
    ) -> Iterator[Event]:
        """On-device chunked sampled decode: ``device_chunk`` tokens per
        dispatch through ``sampled_decode_loop`` (forward + exact reference
        sampling fused into one compiled while-loop).  The reverse-prompt
        check runs between emitted tokens on the host, same semantics as the
        per-token path (stop before emitting the matching token)."""
        import dataclasses as _dc

        import jax

        from ..config import SamplingConfig
        from .device_sampler import init_ring, sampled_decode_loop

        cfg = self.config
        # normalize fields irrelevant to the compiled sampler so one program
        # serves every run (scfg is a static jit arg)
        scfg = _dc.replace(
            sampling, seed=None, n_predict=0, n_batch=8, rng_impl="numpy"
        )
        seed = sampling.seed
        if seed is None or (isinstance(seed, int) and seed < 0):
            import secrets

            seed = 0xFFFFFFFF if seed == -1 else secrets.randbits(31)
        key = jax.random.key(int(seed))
        ring, pos = init_ring(prompt_ids, sampling.repeat_last_n)
        chunk = max(1, int(config.device_chunk))
        last = jnp.asarray(prompt_ids[-1], jnp.int32)
        n_past = len(prompt_ids) - 1  # loop re-evals the last prompt slot
        t_decode = 0.0
        stop = False
        while len(generated) < n_predict and not stop:
            steps = min(chunk, n_predict - len(generated))
            t1 = time.perf_counter()
            toks, cache, ring, pos, key = sampled_decode_loop(
                self.params, last, jnp.int32(n_past), cache, ring, pos, key,
                jnp.int32(steps), cfg, scfg, chunk,
            )
            out = np.asarray(toks)[:steps]
            t_decode += time.perf_counter() - t1
            for tid in out:
                tid = int(tid)
                generated.append(tid)
                if reverse_ids and generated[-len(reverse_ids):] == reverse_ids:
                    stop = True
                    break
                yield Event.output_token(self.vocab.piece_str(tid))
                if len(generated) >= n_predict:
                    break
            last = jnp.asarray(int(out[-1]), jnp.int32)
            n_past += steps
        self.stats["t_decode_s"] = t_decode
        self.stats["generated_tokens"] = len(generated)
        if t_decode > 0 and generated:
            self.stats["decode_tok_per_s"] = len(generated) / t_decode

    # ------------------------------------------------------------------
    # closure variant (LlamaRunner.swift:90-123)
    # ------------------------------------------------------------------

    def run_with_callback(
        self,
        prompt: str,
        config: Optional[RunnerConfig] = None,
        token_handler: Optional[Callable[[str], None]] = None,
        state_change_handler: Optional[Callable[[RunState], None]] = None,
    ) -> None:
        def set_state(s: RunState):
            if state_change_handler:
                state_change_handler(s)

        set_state(RunState.NOT_STARTED)
        for event in self.run_events(prompt, config):
            event.match(
                started_loading_model=lambda: set_state(RunState.INITIALIZING),
                started_generating_output=lambda: set_state(RunState.GENERATING_OUTPUT),
                output_token=(lambda t: token_handler(t)) if token_handler else None,
                completed=lambda: set_state(RunState.COMPLETED),
                failed=lambda e: set_state(RunState.FAILED),
            )

    # ------------------------------------------------------------------
    # async variant (LlamaRunner.swift:51-87)
    # ------------------------------------------------------------------

    def run(
        self,
        prompt: str,
        config: Optional[RunnerConfig] = None,
        state_change_handler: Optional[Callable[[RunState], None]] = None,
    ) -> AsyncIterator[str]:
        """Async iterator of token strings; raises the failure error through
        the iterator like ``AsyncThrowingStream`` (``LlamaRunner.swift:78-81``)."""

        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=256)
        SENTINEL = object()

        def set_state(s: RunState):
            if state_change_handler:
                state_change_handler(s)

        def worker():
            try:
                for event in self.run_events(prompt, config):
                    q.put(event)
            finally:
                q.put(SENTINEL)

        async def agen() -> AsyncIterator[str]:
            set_state(RunState.NOT_STARTED)
            t = threading.Thread(target=worker, daemon=True)
            t.start()
            loop = asyncio.get_running_loop()
            error: Optional[BaseException] = None
            while True:
                item = await loop.run_in_executor(None, q.get)
                if item is SENTINEL:
                    break
                ev: Event = item
                if ev.kind.value == "startedLoadingModel":
                    set_state(RunState.INITIALIZING)
                elif ev.kind.value == "startedGeneratingOutput":
                    set_state(RunState.GENERATING_OUTPUT)
                elif ev.kind.value == "outputToken":
                    yield ev.token or ""
                elif ev.kind.value == "completed":
                    set_state(RunState.COMPLETED)
                elif ev.kind.value == "failed":
                    set_state(RunState.FAILED)
                    error = ev.error
            if error is not None:
                raise error

        return agen()
