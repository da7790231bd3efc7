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
    jax.jit,
    static_argnames=("cfg", "top_k", "penalize"),
    donate_argnames=("cache", "rings"),
)
def batched_decode_sampled(
    params, tokens, n_pasts, active, cache, rings, ring_pos, key,
    temps, top_ps, penalties, cfg: ModelConfig, top_k: int, penalize: bool,
):
    """One decode step for every slot WITH fused on-device sampling: the
    only host traffic per engine step is B sampled token ids (the host-
    sampling path fetches B × n_vocab logits — ~1 MB/step at B=8 through
    the tunnel — and runs B float64 samplers per token).

    rings [B, R] per-slot last-n buffers (oldest at ring_pos), temps/
    top_ps/penalties [B] f32 per-slot sampling params (top_k and the
    penalize flag are static — they change compiled shapes).  Inactive
    slots' draws are discarded and their rings left untouched.
    Returns (tokens [B], cache, rings, ring_pos, key)."""
    from .device_sampler import sample_token_dyn

    logits, cache = model_lib.forward_batched(params, tokens, n_pasts, cache, cfg)
    B = tokens.shape[0]
    key, sub = jax.random.split(key)
    keys = jax.random.split(sub, B)
    toks = jax.vmap(
        lambda lg, ring, k, t, p, rp: sample_token_dyn(
            lg, ring, k, top_k=top_k, penalize=penalize,
            temp=t, top_p=p, repeat_penalty=rp,
        )
    )(logits, rings, keys, temps, top_ps, penalties)
    r = rings.shape[1]
    pushed = jax.vmap(
        lambda ring, pos, t: jax.lax.dynamic_update_index_in_dim(ring, t, pos, 0)
    )(rings, ring_pos, toks)
    rings = jnp.where(active[:, None], pushed, rings)
    ring_pos = jnp.where(active, (ring_pos + 1) % r, ring_pos)
    return toks, cache, rings, ring_pos, key


# Host-side state updates use TRACED indices through these tiny jitted
# helpers: a bare ``arr.at[i].set(...)`` with a python-int index bakes the
# index into the program, so every distinct slot/page index compiles a NEW
# XLA executable — ~1 s each through the tunneled backend, measured as
# 11-second admission stalls in the serving engine (r5).


@jax.jit
def _set_cell(arr, i, j, val):
    return arr.at[i, j].set(val)


@jax.jit
def _set_row(arr, i, row):
    return jax.lax.dynamic_update_slice(arr, row[None], (i, jnp.int32(0)))


@jax.jit
def _set_elem(arr, i, val):
    return arr.at[i].set(val)


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("cache",)
)
def slot_prefill_chunk(params, tokens, n_past, slot, cache, cfg: ModelConfig):
    """Prefill ONE (padded) prompt chunk into one slot's cache planes.

    tokens [P] padded; cache leaves are layer-major batched [L, B, ...].
    ``forward(slot=...)`` writes each layer's K/V straight into the donated
    batched cache at (il, slot, :, n_past, :) — no per-leaf unstack/rescatter
    (the old whole-cache materialization per admission), and chunking bounds
    how long a single admission tick can stall active decode slots.
    Returns (chunk logits [P, n_vocab], cache).
    """
    return model_lib.forward(params, tokens, n_past, cache, cfg, slot=slot)


@dataclasses.dataclass
class _Request:
    prompt_ids: list
    sampling: SamplingConfig
    handle: "StreamHandle"
    reverse_ids: list


@dataclasses.dataclass
class _Slot:
    active: bool = False  # decoding (prefill complete)
    n_past: int = 0
    remaining: int = 0
    last_token: int = 0
    sampler: Optional[SamplerState] = None
    handle: Optional["StreamHandle"] = None
    reverse_ids: list = dataclasses.field(default_factory=list)
    generated: list = dataclasses.field(default_factory=list)
    # admission state: prompt ids not yet prefilled (chunked, one
    # prefill_bucket-sized chunk per engine step so active slots keep
    # decoding while a long prompt admits)
    prefill_ids: list = dataclasses.field(default_factory=list)
    prefill_pos: int = 0
    sampling: Optional[SamplingConfig] = None
    #: host-side ring advanced since the device ring copy (activation or a
    #: host-sampled step) — the device step re-syncs before sampling
    ring_dirty: bool = True
    #: page ids owned by this slot (paged KV mode), in position order
    pages: list = dataclasses.field(default_factory=list)

    @property
    def prefilling(self) -> bool:
        return self.handle is not None and not self.active


class StreamHandle:
    """Per-request token stream: iterate to receive token strings."""

    _DONE = object()

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self.error: Optional[BaseException] = None
        self.token_ids: list[int] = []
        self.t_submit: float = time.perf_counter()
        #: wall seconds from submit to the FIRST sampled token (admission
        #: queueing + chunked prefill under load — the engine-level TTFT
        #: the reference never measured)
        self.ttft_s: Optional[float] = None

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
        device_sampling: bool = True,
        ring_size: int = 64,
        seed: Optional[int] = None,
        paged_pages: Optional[int] = None,
        page: int = 128,
    ):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.max_slots = max_slots
        self.prefill_bucket = prefill_bucket
        #: PAGED KV mode (paged_pages = pool size incl. 1 scratch page):
        #: slots consume pages as their sequences grow instead of a dense
        #: per-slot n_ctx preallocation — max_slots can exceed what dense
        #: allocation would fit as long as the SUM of live lengths fits
        self.paged = paged_pages is not None
        if self.paged:
            self.page = min(page, cfg.n_ctx)
            self.cache = model_lib.init_cache_paged(
                cfg, paged_pages, max_slots, dtype=cache_dtype, page=self.page
            )
            # last page is the scratch page for unallocated table entries
            self._free_pages = list(range(paged_pages - 1))
        else:
            self.cache = model_lib.init_cache_batched(
                cfg, max_slots, dtype=cache_dtype
            )
        self.slots = [_Slot() for _ in range(max_slots)]
        #: fused on-device sampling (batched_decode_sampled) when every
        #: active slot shares the engine ring size/top_k and asks for no
        #: fixed seed; otherwise the step transparently falls back to the
        #: host sampler (per-request seeds / odd configs keep working)
        self.device_sampling = device_sampling
        self.ring_size = max(1, ring_size)
        self.rings = jnp.zeros((max_slots, self.ring_size), jnp.int32)
        self.ring_pos = jnp.zeros((max_slots,), jnp.int32)
        if seed is None:
            import secrets

            seed = secrets.randbits(31)
        self.key = jax.random.key(int(seed))
        self._pending: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {
            "decode_steps": 0, "device_sampled_steps": 0,
            "tokens_generated": 0, "admitted": 0,
        }
        #: set to the fatal exception when a step crashed (engine is dead:
        #: the donated cache may be invalid; submits are rejected)
        self.dead: Optional[BaseException] = None

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
        if self.dead is not None:
            handle._finish(self.dead)
            return handle
        prompt_ids = self.vocab.tokenize(prompt, bos=True)
        if len(prompt_ids) >= self.cfg.n_ctx:
            prompt_ids = prompt_ids[: self.cfg.n_ctx - 1]
        reverse_ids = (
            self.vocab.tokenize(reverse_prompt, bos=False) if reverse_prompt else []
        )
        self._pending.put(_Request(prompt_ids, sampling, handle, reverse_ids))
        return handle

    # ------------------------------------------------------------------

    def _alloc_pages(self, idx: int, slot: _Slot, n: int) -> bool:
        """Allocate ``n`` more pages to slot ``idx`` and point its table row
        at them; False if the pool is exhausted."""
        if n <= 0:
            return True
        if len(self._free_pages) < n:
            return False
        new = [self._free_pages.pop() for _ in range(n)]
        lo = len(slot.pages)
        slot.pages.extend(new)
        table = self.cache["page_table"]
        for k, pid in enumerate(new):
            table = _set_cell(
                table, jnp.int32(idx), jnp.int32(lo + k), jnp.int32(pid)
            )
        self.cache["page_table"] = table
        return True

    def _free_slot_pages(self, idx: int, slot: _Slot) -> None:
        if not self.paged or not slot.pages:
            return
        self._free_pages.extend(slot.pages)
        slot.pages = []
        # repoint the table row at the scratch page: inactive slots are
        # still stepped (all B lanes) and their writes must not land on a
        # page that gets reallocated
        scratch = self.cache["k_pool"].shape[0] - 1
        mp = self.cache["page_table"].shape[1]
        self.cache["page_table"] = _set_row(
            self.cache["page_table"], jnp.int32(idx),
            jnp.full((mp,), scratch, jnp.int32),
        )

    def _admit(self) -> None:
        """Assign pending requests to free slots (cheap bookkeeping only —
        the actual prefill happens one chunk per step in
        :meth:`_prefill_tick`).  Paged mode reserves the prompt's pages here
        (deferring admission when the pool is momentarily full); decode
        pages are allocated on demand per step."""
        for idx, slot in enumerate(self.slots):
            if slot.active or slot.prefilling:
                continue
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                return
            if self.paged:
                need = max(1, -(-len(req.prompt_ids) // self.page))
                if not self._alloc_pages(idx, slot, need):
                    self._pending.put(req)  # pool full: retry next step
                    return
            sampler = SamplerState(req.sampling)
            for t in req.prompt_ids:
                sampler.observe(t)
                req.handle.token_ids.append(t)
                req.handle._put(self.vocab.piece_str(t))  # prompt echo (.mm:892)
            slot.handle = req.handle
            slot.sampler = sampler
            slot.sampling = req.sampling
            slot.reverse_ids = req.reverse_ids
            slot.prefill_ids = req.prompt_ids
            slot.prefill_pos = 0
            slot.generated = []
            self.stats["admitted"] += 1

    def _prefill_tick(self) -> None:
        """Advance ONE prefilling slot by ONE prompt chunk (bounded budget:
        active slots stall at most one prefill_bucket-sized forward per
        step, instead of a whole long prompt)."""
        for idx, slot in enumerate(self.slots):
            if not slot.prefilling:
                continue
            length = len(slot.prefill_ids)
            chunk = slot.prefill_ids[
                slot.prefill_pos : slot.prefill_pos + self.prefill_bucket
            ]
            padded, clen = model_lib.pad_tokens(chunk, self.prefill_bucket)
            logits, self.cache = slot_prefill_chunk(
                self.params, jnp.asarray(padded), jnp.int32(slot.prefill_pos),
                jnp.int32(idx), self.cache, self.cfg,
            )
            slot.prefill_pos += clen
            if slot.prefill_pos < length:
                return  # more chunks to go; decode continues meanwhile
            # prompt fully prefilled: sample the first token, go active
            first = slot.sampler.sample(np.asarray(logits[clen - 1]))
            slot.handle.ttft_s = time.perf_counter() - slot.handle.t_submit
            self.stats.setdefault("ttft_s", []).append(slot.handle.ttft_s)
            slot.ring_dirty = True
            n_predict = min(slot.sampling.n_predict, self.cfg.n_ctx - length)
            slot.active = True
            slot.n_past = length
            slot.remaining = n_predict
            slot.last_token = first
            slot.generated = [first]
            self._emit_or_retire(slot, first)
            return

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
        if self.paged:
            self._free_slot_pages(self.slots.index(slot), slot)

    # ------------------------------------------------------------------

    def _device_scfg(self, active) -> Optional[SamplingConfig]:
        """The shared SamplingConfig if every active slot can run the fused
        on-device sampler this step, else None (host fallback)."""
        if not self.device_sampling:
            return None
        s0 = self.slots[active[0]].sampling
        for i in active:
            s = self.slots[i].sampling
            if s.seed is not None:
                return None  # per-request determinism -> host RNG stream
            if max(1, s.repeat_last_n) != self.ring_size:
                return None
            if s.top_k != s0.top_k or (s.repeat_last_n > 0) != (
                s0.repeat_last_n > 0
            ):
                return None
        return s0

    def step(self) -> int:
        """Admit pending requests, advance at most one prefill chunk, run
        one batched decode step.  Returns number of active slots stepped."""
        self._admit()
        self._prefill_tick()
        active = [i for i, s in enumerate(self.slots) if s.active]
        if not active:
            return 0
        if self.paged:
            # this step writes position n_past per slot: grow on demand;
            # a slot that cannot get a page fails its stream (capacity)
            for i in active:
                slot = self.slots[i]
                need = slot.n_past // self.page + 1
                if need > len(slot.pages) and not self._alloc_pages(
                    i, slot, need - len(slot.pages)
                ):
                    from .errors import PredictionFailedError

                    slot.handle._finish(
                        PredictionFailedError("KV page pool exhausted")
                    )
                    slot.active = False
                    slot.handle = None
                    slot.sampler = None
                    self._free_slot_pages(i, slot)
            active = [i for i in active if self.slots[i].active]
            if not active:
                return 0
        tokens = np.zeros(self.max_slots, dtype=np.int32)
        n_pasts = np.zeros(self.max_slots, dtype=np.int32)
        for i in active:
            tokens[i] = self.slots[i].last_token
            n_pasts[i] = self.slots[i].n_past

        s0 = self._device_scfg(active)
        if s0 is not None:
            # fused decode+sample: the only host traffic is B token ids
            for i in active:
                slot = self.slots[i]
                if slot.ring_dirty:
                    buf = [0] * self.ring_size + list(slot.sampler.ring)
                    self.rings = _set_row(
                        self.rings, jnp.int32(i),
                        jnp.asarray(buf[-self.ring_size :], jnp.int32),
                    )
                    self.ring_pos = _set_elem(
                        self.ring_pos, jnp.int32(i), jnp.int32(0)
                    )
                    slot.ring_dirty = False
            temps = np.ones(self.max_slots, np.float32)
            top_ps = np.ones(self.max_slots, np.float32)
            pens = np.ones(self.max_slots, np.float32)
            mask = np.zeros(self.max_slots, bool)
            for i in active:
                s = self.slots[i].sampling
                temps[i], top_ps[i], pens[i] = s.temp, s.top_p, s.repeat_penalty
                mask[i] = True
            toks, self.cache, self.rings, self.ring_pos, self.key = (
                batched_decode_sampled(
                    self.params, jnp.asarray(tokens), jnp.asarray(n_pasts),
                    jnp.asarray(mask), self.cache, self.rings, self.ring_pos,
                    self.key, jnp.asarray(temps), jnp.asarray(top_ps),
                    jnp.asarray(pens), self.cfg,
                    min(int(s0.top_k), self.cfg.n_vocab),
                    s0.repeat_last_n > 0,
                )
            )
            out = np.asarray(toks)
            self.stats["decode_steps"] += 1
            self.stats["device_sampled_steps"] += 1
            for i in active:
                slot = self.slots[i]
                slot.n_past += 1
                token = int(out[i])
                # mirror into the host ring so a later host-fallback step
                # (or re-sync) sees the full window; NOT dirty — the device
                # ring already advanced identically
                slot.sampler.ring.append(token)
                slot.generated.append(token)
                slot.last_token = token
                self._emit_or_retire(slot, token)
            return len(active)

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
            slot.ring_dirty = True
            slot.generated.append(token)
            slot.last_token = token
            self._emit_or_retire(slot, token)
        return len(active)

    # ------------------------------------------------------------------

    def _fail_all(self, e: BaseException) -> None:
        """Failure detection: a crashed step must finish every live handle
        with the error (never hang clients), mirroring the reference's
        failed-event path (LlamaPredictOperation.mm:791-793)."""
        with self._lock:
            for slot in self.slots:
                if slot.handle is not None:
                    slot.handle._finish(e)
                    slot.active = False
                    slot.handle = None
            while True:
                try:
                    req = self._pending.get_nowait()
                except queue.Empty:
                    break
                req.handle._finish(e)

    def _loop(self):
        while not self._stop.is_set():
            try:
                stepped = self.step()
            except BaseException as e:  # noqa: BLE001
                # batched_decode donates the cache, so a failed dispatch may
                # leave self.cache invalidated — the engine cannot safely
                # continue.  Record the error, fail every live/pending
                # handle, reject future submits, and stop.
                import logging

                logging.getLogger(__name__).exception(
                    "engine step failed; marking engine dead"
                )
                self.dead = e
                self._fail_all(e)
                return
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
