"""Continuous-batching inference engine (SURVEY.md §7 phase 7).

The reference serves exactly one stream, reloading the model per prompt
(``LlamaRunnerBridge.mm:45-48``).  This engine holds the model once and
multiplexes up to ``max_slots`` concurrent streams through ONE batched,
jitted decode program:

* the KV cache carries a leading slot axis ([B, L, n_ctx, H, Dh]);
* each decode dispatch advances every *active* slot by one token
  (``jax.vmap`` of the single-sequence forward with per-slot ``n_past``);
* admission = a single-slot prefill written into that slot's cache plane;
  slots are admitted/retired between decode steps without recompiling
  (slot-count static, occupancy dynamic — the admission policy of
  slot-based continuous batching);
* sampling stays host-side per slot with the reference-exact sampler
  (``runtime/sampler.py``), including per-slot last-n rings and RNGs.

API: :meth:`Engine.submit` → :class:`StreamHandle` (blocking iterator of
token strings); the engine loop runs in a background thread.
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SamplingConfig
from ..models import llama as model_lib
from ..tokenizer import Vocab
from .sampler import SamplerState


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def batched_decode(params, tokens, n_pasts, cache, cfg: ModelConfig):
    """One decode step for every slot: tokens [B], n_pasts [B], cache
    layer-major leaves [L, B, ...] -> (logits [B, n_vocab], cache).

    Uses :func:`model_lib.forward_batched`: every matmul sees all B slot
    rows at once, so the packed weights cross HBM exactly once per step
    (``vmap(forward)`` would re-stream them per slot)."""
    return model_lib.forward_batched(params, tokens, n_pasts, cache, cfg)


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("cache",)
)
def slot_prefill(params, tokens, length, slot, cache, cfg: ModelConfig):
    """Prefill a (padded) prompt into one slot's cache plane.

    tokens [P] padded; cache leaves are layer-major [L, B, ...]; returns
    (last-valid-token logits [n_vocab], cache).
    """
    sub = {k: v[:, slot] for k, v in cache.items()}
    logits, sub = model_lib.forward(params, tokens, jnp.int32(0), sub, cfg)
    cache = {
        k: jax.lax.dynamic_update_index_in_dim(cache[k], sub[k], slot, 1)
        for k in cache
    }
    return logits[length - 1], cache


@dataclasses.dataclass
class _Request:
    prompt_ids: list
    sampling: SamplingConfig
    handle: "StreamHandle"
    reverse_ids: list


@dataclasses.dataclass
class _Slot:
    active: bool = False
    n_past: int = 0
    remaining: int = 0
    last_token: int = 0
    sampler: Optional[SamplerState] = None
    handle: Optional["StreamHandle"] = None
    reverse_ids: list = dataclasses.field(default_factory=list)
    generated: list = dataclasses.field(default_factory=list)


class StreamHandle:
    """Per-request token stream: iterate to receive token strings."""

    _DONE = object()

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self.error: Optional[BaseException] = None
        self.token_ids: list[int] = []

    def _put(self, s: str):
        self._q.put(s)

    def _finish(self, error: Optional[BaseException] = None):
        self.error = error
        self._q.put(self._DONE)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self.error:
                    raise self.error
                return
            yield item

    def text(self) -> str:
        return "".join(self)


class Engine:
    """Slot-based continuous-batching engine over one loaded model."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        vocab: Vocab,
        *,
        max_slots: int = 8,
        prefill_bucket: int = 64,
        cache_dtype=jnp.float32,
    ):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.max_slots = max_slots
        self.prefill_bucket = prefill_bucket
        self.cache = model_lib.init_cache_batched(cfg, max_slots, dtype=cache_dtype)
        self.slots = [_Slot() for _ in range(max_slots)]
        self._pending: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {"decode_steps": 0, "tokens_generated": 0, "admitted": 0}

    # ------------------------------------------------------------------

    def submit(
        self,
        prompt: str,
        sampling: Optional[SamplingConfig] = None,
        *,
        reverse_prompt: Optional[str] = None,
    ) -> StreamHandle:
        sampling = sampling or SamplingConfig()
        handle = StreamHandle()
        prompt_ids = self.vocab.tokenize(prompt, bos=True)
        if len(prompt_ids) >= self.cfg.n_ctx:
            prompt_ids = prompt_ids[: self.cfg.n_ctx - 1]
        reverse_ids = (
            self.vocab.tokenize(reverse_prompt, bos=False) if reverse_prompt else []
        )
        self._pending.put(_Request(prompt_ids, sampling, handle, reverse_ids))
        return handle

    # ------------------------------------------------------------------

    def _admit(self) -> None:
        for idx, slot in enumerate(self.slots):
            if slot.active:
                continue
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                return
            padded, length = model_lib.pad_tokens(req.prompt_ids, self.prefill_bucket)
            logits, self.cache = slot_prefill(
                self.params, jnp.asarray(padded), jnp.int32(length),
                jnp.int32(idx), self.cache, self.cfg,
            )
            sampler = SamplerState(req.sampling)
            for t in req.prompt_ids:
                sampler.observe(t)
                req.handle.token_ids.append(t)
                req.handle._put(self.vocab.piece_str(t))  # prompt echo (.mm:892)
            n_predict = min(req.sampling.n_predict, self.cfg.n_ctx - length)
            first = sampler.sample(np.asarray(logits))
            slot.active = True
            slot.n_past = length
            slot.remaining = n_predict
            slot.last_token = first
            slot.sampler = sampler
            slot.handle = req.handle
            slot.reverse_ids = req.reverse_ids
            slot.generated = [first]
            self.stats["admitted"] += 1
            self._emit_or_retire(slot, first)

    def _emit_or_retire(self, slot: _Slot, token: int) -> None:
        """Emit a sampled token (or retire on reverse-prompt/budget)."""
        if slot.reverse_ids and slot.generated[-len(slot.reverse_ids):] == slot.reverse_ids:
            self._retire(slot)
            return
        slot.handle.token_ids.append(token)
        slot.handle._put(self.vocab.piece_str(token))
        self.stats["tokens_generated"] += 1
        slot.remaining -= 1
        if slot.remaining <= 0 or slot.n_past + 1 >= self.cfg.n_ctx:
            self._retire(slot)

    def _retire(self, slot: _Slot) -> None:
        slot.handle._finish()
        slot.active = False
        slot.handle = None
        slot.sampler = None

    # ------------------------------------------------------------------

    def step(self) -> int:
        """Admit pending requests, run one batched decode step.
        Returns number of active slots stepped."""
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s.active]
        if not active:
            return 0
        tokens = np.zeros(self.max_slots, dtype=np.int32)
        n_pasts = np.zeros(self.max_slots, dtype=np.int32)
        for i in active:
            tokens[i] = self.slots[i].last_token
            n_pasts[i] = self.slots[i].n_past
        logits, self.cache = batched_decode(
            self.params, jnp.asarray(tokens), jnp.asarray(n_pasts),
            self.cache, self.cfg,
        )
        logits = np.asarray(logits)
        self.stats["decode_steps"] += 1
        for i in active:
            slot = self.slots[i]
            slot.n_past += 1
            token = slot.sampler.sample(logits[i])
            slot.generated.append(token)
            slot.last_token = token
            self._emit_or_retire(slot, token)
        return len(active)

    # ------------------------------------------------------------------

    def _loop(self):
        while not self._stop.is_set():
            try:
                stepped = self.step()
            except BaseException as e:  # noqa: BLE001 — failure detection:
                # a crashed step must finish every live handle with the error
                # (never hang clients), mirroring the reference's failed-event
                # path (LlamaPredictOperation.mm:791-793)
                with self._lock:
                    for slot in self.slots:
                        if slot.active and slot.handle is not None:
                            slot.handle._finish(e)
                            slot.active = False
                    while True:
                        try:
                            req = self._pending.get_nowait()
                        except queue.Empty:
                            break
                        req.handle._finish(e)
                continue
            if stepped == 0 and self._pending.empty():
                time.sleep(0.001)

    def start(self) -> "Engine":
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
