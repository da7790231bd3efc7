"""Functional LLaMA forward pass — the TPU-native replacement for
``llama_eval`` (``Sources/llamaObjCxx/bridge/LlamaPredictOperation.mm:510-735``).

Where the reference rebuilds a ~1000-node ggml graph per token and executes
it with a fork-join pthread pool (``ggml.c:9109-9555``), here the whole step
is ONE traced-and-compiled XLA program: ``prefill`` (N tokens) and
``decode_step`` (1 token) are jitted once per shape bucket and reused for the
entire generation.  The KV cache is a preallocated dense array updated with
``lax.dynamic_update_slice`` — the analogue of the reference's strided
``ggml_view_1d`` + ``ggml_cpy`` writes at offset ``(il*n_ctx + n_past)``
(``LlamaPredictOperation.mm:585-591``), except keys are stored POST-rope
(mathematically identical to the reference's in-place mode-1 rope on the
cache view — see ``ops/rope.py``).

Graph parity, op for op (``LlamaPredictOperation.mm:558-712``):
  tok_embedding get_rows → per layer [ norm·attention_norm → wq/wk/wv →
  KV store → rope(Q)/rope(K) → K·Qᵀ → ·1/√d → causal mask(n_past) → softmax →
  ·V → wo → +residual → norm·ffn_norm → silu(w1·x)·(w3·x) → w2 → +residual ]
  → final norm·norm → output matmul.

Numerics notes (SURVEY.md §7): norm is the mean-centered ``ggml_norm``
variant by default; quantized matmuls fake-quantize activations to match the
int4×int4 dot; silu/softmax/exp are exact f32 instead of the reference's
64K-entry fp16 LUTs (``ggml.c:2376-2394``) — an accepted Δ in the parity
budget.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QK, ModelConfig
from ..formats.ggml import GGMLModelFile
from ..formats.quant import Q4_0Tensor, Q4_1Tensor
from ..ops import quantized_matmul as qmm
from ..ops.norms import norm
from ..ops.rope import rope

Params = dict
Cache = dict


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

LAYER_WEIGHTS = (
    "attention_norm", "wq", "wk", "wv", "wo", "ffn_norm", "w1", "w2", "w3",
)


def params_from_tensors(
    tensors: dict,
    cfg: ModelConfig,
    *,
    param_dtype: Optional[Any] = None,
    transpose_q4: Optional[bool] = None,
    q4_layout: Optional[str] = None,
    shard_pad: int = 1,
    stack_layers: Optional[bool] = None,
    dense_dequant: bool = False,
    fuse_shards: int = 1,
) -> Params:
    """Arrange loader output (``formats/ggml.py``) into the model pytree.

    Dense f16/f32 weights are cast to ``param_dtype`` (default: keep f32 as
    f32; f16 → bf16 on TPU, f32 elsewhere); quantized tensors stay packed.
    Norm weights are always f32 (they are 1-D f32 in the file,
    ``convert-pth-to-ggml.py:154-159``).

    ``q4_layout`` picks the Q4_0 device layout: ``"v"`` (default on TPU,
    single-host) = the VPU-matvec layout (``ops/q4_vpu_pallas.py``) whose
    batch-1 decode kernel streams packed nibbles at HBM rate; ``"t"`` = the
    contraction-major tiled layout (``ops/q4_matmul_pallas.py``), used when
    ``shard_pad > 1`` (TP in-dim sharding is undefined on the V layout's
    group-major lanes); ``"none"`` = keep the logical row-major blocks
    (CPU/tests).  ``transpose_q4`` is the legacy boolean for ``"t"``.

    ``shard_pad``: zero-pad the FFN hidden (w1/w3 out + w2 in) and vocab
    (output out) dims up to a multiple of this — pass ``128 * tp`` when
    row-sharding the tiled Q4 layout over a TP mesh (tile granularity ×
    shard count).  Numerically exact: padded rows/blocks have zero scales,
    contribute zero activations, and padded logits are sliced off in
    ``forward``.

    ``stack_layers`` (default on): store layer weights stacked along a
    leading layer axis and run the layer loop as ``lax.scan`` — the traced
    program is one layer instead of n_layer copies (compile time drops
    ~n_layer×; the per-token graph-rebuild pathology of the reference,
    inverted).

    ``dense_dequant``: decode quantized weights ONCE at load into dense
    ``param_dtype`` arrays (2 B/weight in HBM at bf16).  Trades the 5-bit
    streaming advantage for plain XLA matmuls at full efficiency — the
    fastest serving mode until the fused Q4 kernels reach the roofline.
    Activation fake-quant still applies (cfg.quantize_activations), keeping
    the reference's quantized-dot numerics.

    ``fuse_shards``: with ``cfg.fuse_layer_matmuls`` and an out-row-sharded
    TP layout (``parallel/tp.py``), the fused wqkv/w13 out-concats are
    INTERLEAVED per shard — shard r's rows are (q_r; k_r; v_r) and
    (w1_r; w3_r) — so a contiguous out-row split hands each shard its own
    whole fused matrices.  Requires n_head % fuse_shards == 0 and
    ``shard_pad`` = 128·fuse_shards.  The global (fuse_shards=1) concat
    would interleave shards' rows across ranks.
    """
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if param_dtype is None:
        param_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if q4_layout is None:
        if transpose_q4:
            q4_layout = "t"
        elif transpose_q4 is None and on_tpu:
            # fused-layer W kernels serve batch-1 decode fastest at 128-dim
            # heads (hardware-parity-proven, experiments/tpu_selfcheck.py);
            # V matvec layout otherwise; TP in-dim sharding needs the T
            # layout (see parallel/sharding.py)
            if shard_pad > 1:
                q4_layout = "t"
            elif (
                cfg.head_dim == 128
                and cfg.fuse_layer_matmuls
                and cfg.kv_cache_dtype != "int8"
                # (int8 KV decodes through the flash kernel, not the fused
                # blocks — W weights would dense-dequant every step)
            ):
                q4_layout = "w"
            else:
                q4_layout = "v"
        else:
            q4_layout = "none"
    if stack_layers is None:
        stack_layers = True
    if q4_layout == "w" and cfg.head_dim != 128:
        # fused-layer kernels map one 128-dim head per weight tile
        q4_layout = "v"

    from ..ops.q4_fused_layer import Q4_0TensorW
    from ..ops.q4_matmul_pallas import Q4_0TensorT
    from ..ops.q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV

    def cvt_w(a):
        """Layer-weight converter for the fused-layer path (q4_layout="w"):
        contraction-on-sublanes W layout (ops/q4_fused_layer.py), no in-dim
        padding needed (requires in %% 128 == 0, out %% 128 == 0)."""
        if isinstance(a, Q4_0TensorW):  # pre-packed (synthetic bench params)
            return jax.tree_util.tree_map(jnp.asarray, a)
        if (
            isinstance(a, Q4_0Tensor)
            and a.shape[0] % 128 == 0
            and a.shape[1] % 128 == 0
        ):
            in_pad = (a.shape[1] + 4095) // 4096 * 4096
            if in_pad != a.shape[1]:
                a = _pad_weight(a, in_to=in_pad)
            return jax.tree_util.tree_map(jnp.asarray, Q4_0TensorW.from_q4_0(a))
        return cvt(a)

    def cvt(a):
        if dense_dequant and isinstance(a, (Q4_0Tensor, Q4_1Tensor)):
            return jnp.asarray(a.dequantize(), dtype=param_dtype)
        if (
            isinstance(a, Q4_0Tensor)
            and q4_layout in ("t", "v", "w")  # "w": non-layer tensors
            and a.shape[0] % 128 == 0         # (embedding/output) pack as V
        ):
            # in-dim padding per layout: T k-tiles need kh4 = in/8 divisible
            # by a 128-multiple (in % 1024); V keeps block-lanes (in/32)
            # 128-aligned (in % 4096) for its contiguous-slice block
            # reduction.  Zero blocks are exact; matmul wrappers zero-pad
            # activations.
            unit = 1024 if q4_layout == "t" else 4096
            in_dim = a.shape[1]
            in_pad = -(-in_dim // unit) * unit
            if in_pad != in_dim:
                a = _pad_weight(a, in_to=in_pad)
            a = (
                Q4_0TensorT.from_q4_0(a)
                if q4_layout == "t"
                else Q4_0TensorV.from_q4_0(a)
            )
            return jax.tree_util.tree_map(jnp.asarray, a)
        if (
            isinstance(a, Q4_1Tensor)
            and q4_layout == "v"
            and a.shape[0] % 128 == 0
        ):
            in_dim = a.shape[1]
            in_pad = (in_dim + 4095) // 4096 * 4096
            if in_pad != in_dim:
                a = _pad_weight(a, in_to=in_pad)
            return jax.tree_util.tree_map(
                jnp.asarray, Q4_1TensorV.from_q4_1(a)
            )
        if isinstance(
            a,
            (Q4_0Tensor, Q4_1Tensor, Q4_0TensorT, Q4_0TensorV, Q4_1TensorV,
             Q4_0TensorW),
        ):
            return jax.tree_util.tree_map(jnp.asarray, a)
        # keep device arrays on device (no host round trip)
        if a.ndim == 1:
            return jnp.asarray(a, dtype=jnp.float32)
        return jnp.asarray(a, dtype=param_dtype)

    def rup(n):
        return (n + shard_pad - 1) // shard_pad * shard_pad

    ff_pad = rup(cfg.n_ff)
    vocab_pad = rup(cfg.n_vocab)

    params: Params = {
        # tok_embeddings rows pad with output's vocab padding so a
        # vocab-sharded TP layout (parallel/tp.py) shards whole 128-row
        # tiles; padded rows are unreachable (ids < n_vocab)
        "tok_embeddings": cvt(
            _pad_weight(tensors["tok_embeddings.weight"], out_to=vocab_pad)
        ),
        "norm": cvt(tensors["norm.weight"]),
        "output": cvt(_pad_weight(tensors["output.weight"], out_to=vocab_pad)),
        "layers": [],
    }
    for i in range(cfg.n_layer):
        p = f"layers.{i}."

        def get(w):
            key = (
                p + ("attention." + w + ".weight" if w in ("wq", "wk", "wv", "wo")
                     else "feed_forward." + w + ".weight" if w in ("w1", "w2", "w3")
                     else w + ".weight")
            )
            return tensors[key]

        if q4_layout == "w":
            # fused-layer path (ops/q4_fused_layer.py): wqkv/w13 fused
            # out-concats mandatory (one weight stream per kernel); layer
            # weights in the W layout, norms f32
            layer = {
                "attention_norm": cvt(get("attention_norm")),
                "ffn_norm": cvt(get("ffn_norm")),
                "wo": cvt_w(get("wo")),
                "w2": cvt_w(_pad_weight(get("w2"), in_to=ff_pad)),
                "wqkv": cvt_w(_concat_out([get("wq"), get("wk"), get("wv")])),
                "w13": cvt_w(_concat_out([
                    _pad_weight(get("w1"), out_to=ff_pad),
                    _pad_weight(get("w3"), out_to=ff_pad),
                ])),
            }
            params["layers"].append(layer)
            continue
        layer = {
            "attention_norm": cvt(get("attention_norm")),
            "ffn_norm": cvt(get("ffn_norm")),
            "wo": cvt(get("wo")),
            "w2": cvt(_pad_weight(get("w2"), in_to=ff_pad)),
        }
        if cfg.fuse_layer_matmuls:
            # out-dim concat: fewer, larger kernels; numerically exact (Q4
            # block scales are per source row).  fuse_shards > 1 interleaves
            # the concat per TP shard (see docstring).
            layer["wqkv"] = cvt(_concat_out_sharded(
                [get("wq"), get("wk"), get("wv")], fuse_shards
            ))
            layer["w13"] = cvt(_concat_out_sharded([
                _pad_weight(get("w1"), out_to=ff_pad),
                _pad_weight(get("w3"), out_to=ff_pad),
            ], fuse_shards))
        else:
            for w in ("wq", "wk", "wv"):
                layer[w] = cvt(get(w))
            layer["w1"] = cvt(_pad_weight(get("w1"), out_to=ff_pad))
            layer["w3"] = cvt(_pad_weight(get("w3"), out_to=ff_pad))
        params["layers"].append(layer)

    if stack_layers:
        params["layers_stacked"] = stack_layer_params(params.pop("layers"))
    return params


def stack_layer_params(layers: list) -> dict:
    """Stack per-layer pytrees along a new leading layer axis (for the
    ``lax.scan`` layer loop).  Quantized containers stack leaf-wise."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _pad_weight(a, out_to: Optional[int] = None, in_to: Optional[int] = None):
    """Zero-pad a [out, in] weight (dense or quantized) to target dims.

    Zero Q4 blocks (scale 0, nibbles 0) dequantize to exact zeros, so padded
    rows produce zero activations and padded in-columns consume zeros — the
    result is bit-identical on the original span.
    """
    from ..ops.q4_fused_layer import Q4_0TensorW
    from ..ops.q4_matmul_pallas import Q4_0TensorT
    from ..ops.q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV

    if isinstance(a, (Q4_0TensorT, Q4_0TensorV, Q4_1TensorV, Q4_0TensorW)):
        rows, cols = a.shape
        if (out_to or rows) <= rows and (in_to or cols) <= cols:
            return a  # already at/above target (e.g. kernel in-dim padding)
        raise ValueError(
            "shard padding of pre-tiled Q4 device layouts is unsupported; "
            "pad before tiling (pass row-major tensors with shard_pad)"
        )
    if isinstance(a, Q4_0Tensor):
        rows, cols = a.shape
        ro = (out_to or rows) - rows
        co = (in_to or cols) - cols
        if not ro and not co:
            return a
        return Q4_0Tensor(
            scales=np.pad(np.asarray(a.scales), ((0, ro), (0, co // QK))),
            qs=np.pad(np.asarray(a.qs), ((0, ro), (0, co // 2))),
        )
    if isinstance(a, Q4_1Tensor):
        rows, cols = a.shape
        ro = (out_to or rows) - rows
        co = (in_to or cols) - cols
        if not ro and not co:
            return a
        return Q4_1Tensor(
            mins=np.pad(np.asarray(a.mins), ((0, ro), (0, co // QK))),
            scales=np.pad(np.asarray(a.scales), ((0, ro), (0, co // QK))),
            qs=np.pad(np.asarray(a.qs), ((0, ro), (0, co // 2))),
        )
    ro = max(0, (out_to or a.shape[0]) - a.shape[0])
    co = max(0, (in_to or a.shape[1]) - a.shape[1])
    if not ro and not co:
        return a
    if isinstance(a, jnp.ndarray):
        return jnp.pad(a, ((0, ro), (0, co)))  # stays on device
    return np.pad(np.asarray(a), ((0, ro), (0, co)))


def _row_slice(a, lo: int, hi: int):
    """Rows [lo, hi) of a [out, in] weight (dense or logical-quantized)."""
    if isinstance(a, Q4_0Tensor):
        return Q4_0Tensor(scales=a.scales[lo:hi], qs=a.qs[lo:hi])
    if isinstance(a, Q4_1Tensor):
        return Q4_1Tensor(
            mins=a.mins[lo:hi], scales=a.scales[lo:hi], qs=a.qs[lo:hi]
        )
    return a[lo:hi]


def _concat_out_sharded(parts: list, shards: int):
    """Out-concat, interleaved per TP shard: result rows are
    (p0_r; p1_r; ...) for shard r — a contiguous out-row split then hands
    each shard its own whole fused matrices (parallel/tp.py)."""
    if shards <= 1:
        return _concat_out(parts)
    pieces = []
    for r in range(shards):
        for p in parts:
            rows = p.shape[0]
            assert rows % shards == 0, (rows, shards)
            per = rows // shards
            pieces.append(_row_slice(p, r * per, (r + 1) * per))
    return _concat_out(pieces)


def _concat_out(parts: list):
    """Concatenate weights [out, in] along the out axis (rows).

    jnp.concatenate keeps device arrays on device (synthetic/bench params);
    numpy inputs concatenate on host.
    """
    from ..ops.q4_matmul_pallas import Q4_0TensorT
    from ..ops.q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV

    def cat(leaves, axis=0):
        if any(isinstance(l, jnp.ndarray) for l in leaves):
            return jnp.concatenate(leaves, axis=axis)
        return np.concatenate([np.asarray(l) for l in leaves], axis=axis)

    if isinstance(parts[0], Q4_0Tensor):
        return Q4_0Tensor(
            scales=cat([p.scales for p in parts]),
            qs=cat([p.qs for p in parts]),
        )
    if isinstance(parts[0], Q4_1Tensor):
        return Q4_1Tensor(
            mins=cat([p.mins for p in parts]),
            scales=cat([p.scales for p in parts]),
            qs=cat([p.qs for p in parts]),
        )
    if isinstance(parts[0], Q4_0TensorT):
        # tiled layout [out/128, X, 128]: out is axis 0
        return Q4_0TensorT(
            scales_t=cat([p.scales_t for p in parts], axis=0),
            qs4=cat([p.qs4 for p in parts], axis=0),
        )
    if isinstance(parts[0], Q4_0TensorV):
        # VPU layout [out/128, 128, in/8]: out is axes 0+1, tile-aligned
        return Q4_0TensorV(
            scales_v=cat([p.scales_v for p in parts], axis=0),
            qs4v=cat([p.qs4v for p in parts], axis=0),
        )
    if isinstance(parts[0], Q4_1TensorV):
        return Q4_1TensorV(
            sm_v=cat([p.sm_v for p in parts], axis=0),
            qs4v=cat([p.qs4v for p in parts], axis=0),
        )
    from ..ops.q4_fused_layer import Q4_0TensorW

    if isinstance(parts[0], Q4_0TensorW):
        # W layout [out/128, in/8|in/32, 128]: out is axis 0, tile-aligned
        return Q4_0TensorW(
            scales_w=cat([p.scales_w for p in parts], axis=0),
            qs4w=cat([p.qs4w for p in parts], axis=0),
        )
    return cat(list(parts))


def params_from_file(model: GGMLModelFile, *, param_dtype=None) -> Params:
    return params_from_tensors(model.tensors, model.config, param_dtype=param_dtype)


def random_params(
    cfg: ModelConfig, seed: int = 0, scale: float = 0.05, dtype=np.float32
) -> dict:
    """Random numpy weights in loader-tensor naming, for tests/fixtures."""
    from ..formats.ggml import expected_tensor_shapes

    rng = np.random.default_rng(seed)
    out = {}
    for name, shape in expected_tensor_shapes(cfg).items():
        if len(shape) == 1:
            out[name] = (1.0 + scale * rng.standard_normal(shape)).astype(np.float32)
        else:
            out[name] = (scale * rng.standard_normal(shape)).astype(dtype)
    return out


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_cache_batched(cfg: ModelConfig, batch: int, dtype=None) -> Cache:
    """Layer-major batched KV cache [L, B, H, n_ctx, Dh] for
    :func:`forward_batched` — the layer axis leads so the scan-over-layers
    path can slice per-layer planes without transposing (a [B, L, ...]
    layout would copy the whole cache per step to feed the scan)."""
    if dtype is None:
        if cfg.kv_cache_dtype == "int8":
            dtype = jnp.int8
        else:
            dtype = jnp.dtype(cfg.kv_cache_dtype)
    shape = (cfg.n_layer, batch, cfg.n_head, cfg.n_ctx, cfg.head_dim)
    cache = {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}
    if dtype == jnp.int8:
        sshape = shape[:-1] + (1,)
        cache["k_scale"] = jnp.zeros(sshape, dtype=jnp.float32)
        cache["v_scale"] = jnp.zeros(sshape, dtype=jnp.float32)
    return cache


def init_cache_paged(
    cfg: ModelConfig, n_pages: int, max_slots: int, dtype=None,
    page: int = 128,
) -> Cache:
    """PAGED batched KV cache (BASELINE north star): a pool of
    [n_pages, L, H, page, Dh] position-range pages + a [B, MP] page table.
    A slot's HBM footprint grows with its actual sequence length instead of
    a dense per-slot n_ctx preallocation (the reference preallocates the
    whole cache up front, ``LlamaPredictOperation.mm:289-304``).

    The LAST page is a scratch page: unallocated table entries point at it,
    so writes from inactive slots (the engine steps all B lanes) land there
    harmlessly instead of corrupting a live page.
    """
    if dtype is None:
        dtype = (
            jnp.int8 if cfg.kv_cache_dtype == "int8"
            else jnp.dtype(cfg.kv_cache_dtype)
        )
    page = min(page, cfg.n_ctx)
    mp = -(-cfg.n_ctx // page)
    shape = (n_pages, cfg.n_layer, cfg.n_head, page, cfg.head_dim)
    cache = {
        "k_pool": jnp.zeros(shape, dtype=dtype),
        "v_pool": jnp.zeros(shape, dtype=dtype),
        # all entries -> scratch page until the engine allocates
        "page_table": jnp.full((max_slots, mp), n_pages - 1, jnp.int32),
    }
    if dtype == jnp.int8:
        sshape = shape[:-1] + (1,)
        cache["k_scale_pool"] = jnp.zeros(sshape, dtype=jnp.float32)
        cache["v_scale_pool"] = jnp.zeros(sshape, dtype=jnp.float32)
    return cache


def init_cache(cfg: ModelConfig, dtype=None, batch: Optional[int] = None) -> Cache:
    """Dense per-sequence KV cache [L, H, n_ctx, Dh], head-major so each
    head's history is contiguous (k stored post-rope).

    Replaces the reference's two 1-D f32 tensors of n_layer*n_ctx*n_embd
    elements (``LlamaPredictOperation.mm:289-304``).  ``batch`` adds a
    leading axis for vmapped use.
    """
    if dtype is None:
        if cfg.kv_cache_dtype == "int8":
            dtype = jnp.int8
        else:
            dtype = jnp.dtype(cfg.kv_cache_dtype)
    shape = (cfg.n_layer, cfg.n_head, cfg.n_ctx, cfg.head_dim)
    if batch is not None:
        shape = (batch,) + shape
    cache = {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}
    if dtype == jnp.int8:
        # per-(layer, head, position) f32 scales for the int8 quantized cache
        sshape = shape[:-1] + (1,)
        cache["k_scale"] = jnp.zeros(sshape, dtype=jnp.float32)
        cache["v_scale"] = jnp.zeros(sshape, dtype=jnp.float32)
    return cache


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _attention_flash_xla(q, keys, values, n_past, n_ctx, compute_dtype,
                         chunk: int = 512):
    """Online-softmax prefill attention: ``lax.scan`` over key chunks, so
    peak score memory is [H, N, chunk] instead of [H, N, n_ctx] — the
    long-context prefill path (the dense form materializes 34 MB/layer at
    512 ctx and grows quadratically; SURVEY §5.7).  Same mask/numerics as
    :func:`_attention` up to softmax reassociation."""
    N = q.shape[0]
    d = q.shape[-1]
    H = keys.shape[0]
    scale = 1.0 / np.sqrt(float(d))
    qf = q.astype(jnp.float32).transpose(1, 0, 2)  # [H, N, Dh]
    nchunks = n_ctx // chunk
    ks = keys.astype(jnp.float32).reshape(H, nchunks, chunk, d).transpose(
        1, 0, 2, 3
    )
    vs = values.astype(jnp.float32).reshape(H, nchunks, chunk, d).transpose(
        1, 0, 2, 3
    )
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (N, chunk), 0)
    j_off = jax.lax.broadcasted_iota(jnp.int32, (N, chunk), 1)

    def body(carry, kv):
        m, l, acc, c = carry
        kc, vc = kv  # [H, chunk, d]
        s = jnp.einsum(
            "hnd,hjd->hnj", qf, kc,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale  # [H, N, chunk]
        allowed = (c * chunk + j_off) <= (n_past + i_idx)
        s = jnp.where(allowed[None], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # -inf rows (no allowed key in this chunk yet) keep m = -inf; guard
        # the exp against (-inf) - (-inf)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
        p = jnp.exp(jnp.where(jnp.isfinite(s), s - m_safe, -jnp.inf))
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "hnj,hjd->hnd", p, vc,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = acc * alpha + pv
        return (m_new, l, acc, c + 1), None

    m0 = jnp.full((H, N, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((H, N, 1), jnp.float32)
    a0 = jnp.zeros((H, N, d), jnp.float32)
    (m, l, acc, _), _ = jax.lax.scan(
        body, (m0, l0, a0, jnp.int32(0)), (ks, vs)
    )
    ctx = acc / jnp.maximum(l, 1e-30)  # every query attends >= 1 key
    return ctx.transpose(1, 0, 2).astype(compute_dtype)


#: prefill contexts at/above this use the chunked online-softmax attention
#: (peak score memory [H, N, chunk] instead of [H, N, n_ctx])
FLASH_PREFILL_MIN_CTX = 1024


def _attention(q, keys, values, n_past, n_ctx, compute_dtype):
    """Causal attention over the full cache buffer.

    q: [N, H, Dh]; keys/values: [H, n_ctx, Dh] (head-major).  Allowed keys
    for query i: j <= n_past + i — exactly ``ggml_diag_mask_inf(KQ_scaled,
    n_past)`` (``ggml.c:6921-6981``); slots beyond the high-water mark are
    never attended, so stale cache contents are harmless.

    Long contexts route to :func:`_attention_flash_xla` (chunked scores).
    """
    if n_ctx >= FLASH_PREFILL_MIN_CTX and n_ctx % 512 == 0:
        return _attention_flash_xla(
            q, keys, values, n_past, n_ctx, compute_dtype
        )
    N = q.shape[0]
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(float(d))  # 1/sqrt(n_embd/n_head), .mm:620
    scores = jnp.einsum(
        "nhd,hjd->hnj", q.astype(jnp.float32), keys.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (N, n_ctx), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (N, n_ctx), 1)
    allowed = j_idx <= (n_past + i_idx)
    scores = jnp.where(allowed[None, :, :], scores, -jnp.inf)
    # softmax with max-subtraction (ggml.c:6982-7050), exact exp
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    ctx = jnp.einsum(
        "hnj,hjd->nhd", p, values.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return ctx.astype(compute_dtype)


def forward(
    params: Params,
    tokens: jnp.ndarray,  # [N] int32 (may include right-padding)
    n_past: jnp.ndarray,  # scalar int32: tokens already in the cache
    cache: Cache,
    cfg: ModelConfig,
    slot=None,  # optional [] int32: cache leaves are BATCHED [L, B, ...]
) -> tuple[jnp.ndarray, Cache]:
    """One evaluation over N token slots starting at position ``n_past``.

    Returns (logits [N, n_vocab] f32, updated cache).  Pure & jittable; the
    caller slices the logits row it needs (the reference copies only the last
    row, ``LlamaPredictOperation.mm:724-725``; perplexity needs all rows).

    ``slot``: when given, ``cache`` is the continuous-batching engine's
    layer-major batched cache ([L, B, H, n_ctx, Dh] leaves) and this forward
    reads/writes ONLY slot ``slot``'s planes, in place on the donated buffer
    — the admission path of ``runtime/engine.py`` without ever unstacking or
    re-scattering the other slots' cache (one dynamic_update_slice at
    (il, slot, ·) per layer).
    """
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    N = tokens.shape[0]
    lin = functools.partial(
        qmm.linear,
        quantize_activations=cfg.quantize_activations,
        compute_dtype=compute_dtype,
        # prefill (N>1): dense-dequant fallback matmuls run bf16 on TPU —
        # halves the dequantized-weight HBM traffic and uses the MXU's
        # native-rate path (f32 matmuls run multi-pass).  f32 accumulation;
        # decode (N==1) and CPU golden tests are untouched.
        dense_matmul_dtype=(
            jnp.bfloat16 if (cfg.prefill_bf16 and N > 1) else None
        ),
    )
    positions = n_past + jnp.arange(N, dtype=jnp.int32)

    x = qmm.embedding_lookup(
        tokens, params["tok_embeddings"], compute_dtype=compute_dtype
    )[:, : cfg.n_embd]  # drop 1024-padding of the q4 in-dim, if any

    def cache_write(cl: dict, name: str, val):
        """Store [N, H, Dh] states head-major at n_past; int8 cache gets
        per-(head, position) symmetric scales."""
        vt = val.transpose(1, 0, 2)  # [H, N, Dh]
        buf = cl[name]
        if name + "_scale" in cl:
            amax = jnp.max(jnp.abs(vt), axis=-1, keepdims=True)
            scale = amax / 127.0
            inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
            q = jnp.clip(jnp.round(vt * inv), -127, 127).astype(jnp.int8)
            cl = dict(cl)
            cl[name] = jax.lax.dynamic_update_slice(buf, q, (0, n_past, 0))
            cl[name + "_scale"] = jax.lax.dynamic_update_slice(
                cl[name + "_scale"], scale.astype(jnp.float32), (0, n_past, 0)
            )
            return cl
        cl = dict(cl)
        cl[name] = jax.lax.dynamic_update_slice(
            buf, vt.astype(buf.dtype), (0, n_past, 0)
        )
        return cl

    def cache_read(cl: dict, name: str):
        if name + "_scale" in cl:
            return cl[name].astype(jnp.float32) * cl[name + "_scale"]
        return cl[name]

    def cache_write_full(c: dict, name: str, val, il):
        """Store [N, H, Dh] states straight into the FULL stacked cache at
        (il, :, n_past, :) — one in-place dynamic_update_slice on the donated
        buffer.  (Slicing a layer plane out, updating it, and restacking —
        the old unrolled path — made XLA materialize a whole-plane copy per
        layer per step: ~0.8 ms/token at 7B.)  With ``slot``, the cache is
        batched and the write lands at (il, slot, :, n_past, :)."""
        vt = val.transpose(1, 0, 2)[None]  # [1, H, N, Dh]
        idx = (il, 0, n_past, 0)
        if slot is not None:
            vt = vt[None]  # [1, 1, H, N, Dh]
            idx = (il, slot, 0, n_past, 0)
        buf = c[name]
        c = dict(c)
        if name + "_scale" in c:
            amax = jnp.max(jnp.abs(vt), axis=-1, keepdims=True)
            scale = amax / 127.0
            inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
            qv = jnp.clip(jnp.round(vt * inv), -127, 127).astype(jnp.int8)
            c[name] = jax.lax.dynamic_update_slice(buf, qv, idx)
            c[name + "_scale"] = jax.lax.dynamic_update_slice(
                c[name + "_scale"], scale.astype(jnp.float32), idx
            )
            return c
        c[name] = jax.lax.dynamic_update_slice(buf, vt.astype(buf.dtype), idx)
        return c

    def cache_read_full(c: dict, name: str, il):
        plane = (lambda a: a[il, slot]) if slot is not None else (lambda a: a[il])
        if name + "_scale" in c:
            return plane(c[name]).astype(jnp.float32) * plane(c[name + "_scale"])
        return plane(c[name])

    def cache_write_paged(c: dict, name: str, val, il):
        """Slot-path PAGED write: val [N, H, Dh] lands at positions
        n_past..n_past+N-1 of slot ``slot`` via its page-table row.

        When N divides the page size, a prefill chunk starting at an
        N-aligned n_past (the engine's chunked admission always is) lies
        entirely within ONE page → one in-place dynamic_update_slice.
        Otherwise N per-position DUS ops.  NEVER an advanced-index scatter:
        XLA materializes pool-sized copies for it (~pool bytes per layer
        per chunk — measured as a 12x engine-admission slowdown, r5)."""
        pool = c[name + "_pool"]
        page = pool.shape[3]
        c = dict(c)

        def write(buf, vals, vt):  # vals [N, H, X] -> transpose to [H, N, X]
            if page % N == 0:
                pid = jnp.clip(
                    c["page_table"][slot, n_past // page], 0, pool.shape[0] - 1
                )
                return jax.lax.dynamic_update_slice(
                    buf, vt[None, None].astype(buf.dtype),
                    (pid, il, 0, n_past % page, 0),
                )
            for i in range(N):
                pos = n_past + i
                pid = jnp.clip(
                    c["page_table"][slot, pos // page], 0, pool.shape[0] - 1
                )
                buf = jax.lax.dynamic_update_slice(
                    buf,
                    vals[i][None, None, :, None, :].astype(buf.dtype),
                    (pid, il, 0, pos % page, 0),
                )
            return buf

        if name + "_scale_pool" in c:
            amax = jnp.max(jnp.abs(val), axis=-1, keepdims=True)  # [N, H, 1]
            scale = amax / 127.0
            inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
            qv = jnp.clip(jnp.round(val * inv), -127, 127)
            c[name + "_pool"] = write(pool, qv, qv.transpose(1, 0, 2))
            c[name + "_scale_pool"] = write(
                c[name + "_scale_pool"], scale, scale.transpose(1, 0, 2)
            )
            return c
        c[name + "_pool"] = write(pool, val, val.transpose(1, 0, 2))
        return c

    def cache_read_paged(c: dict, name: str, il):
        """Gather slot ``slot``'s pages for layer il into a dense
        [H, n_ctx, Dh] view (prefill XLA attention; decode uses the paged
        flash kernel in forward_batched)."""
        pool = c[name + "_pool"]
        tab = jnp.clip(c["page_table"][slot], 0, pool.shape[0] - 1)  # [MP]
        planes = pool[tab, il]  # [MP, H, page, Dh]
        dense = planes.transpose(1, 0, 2, 3).reshape(
            cfg.n_head, -1, cfg.head_dim
        )[:, : cfg.n_ctx]
        if name + "_scale_pool" in c:
            sc = c[name + "_scale_pool"][tab, il].transpose(1, 0, 2, 3)
            sc = sc.reshape(cfg.n_head, -1, 1)[:, : cfg.n_ctx]
            return dense.astype(jnp.float32) * sc
        return dense

    def layer_fn(x, layer, cl, il=None):
        """One transformer layer.  ``il is None`` (scan path): ``cl`` is this
        layer's cache planes ([H, n_ctx, Dh] (+ scales for int8)).  Otherwise
        (unrolled path): ``cl`` is the FULL stacked cache, written/read in
        place at layer ``il`` — no per-layer plane copies.  Returns
        (x, updated cl)."""
        D = cfg.n_embd
        h = norm(x, layer["attention_norm"], cfg.norm_type, cfg.norm_eps)
        if "wqkv" in layer:
            qkv = lin(h, layer["wqkv"])
            q = qkv[:, 0 * D : 1 * D].reshape(N, cfg.n_head, cfg.head_dim)
            k = qkv[:, 1 * D : 2 * D].reshape(N, cfg.n_head, cfg.head_dim)
            v = qkv[:, 2 * D : 3 * D].reshape(N, cfg.n_head, cfg.head_dim)
        else:
            q = lin(h, layer["wq"]).reshape(N, cfg.n_head, cfg.head_dim)
            k = lin(h, layer["wk"]).reshape(N, cfg.n_head, cfg.head_dim)
            v = lin(h, layer["wv"]).reshape(N, cfg.n_head, cfg.head_dim)
        # rope over the full head dim (eval recomputes n_rot = n_embd/n_head,
        # .mm:528, ignoring the file's n_rot field)
        q = rope(q, positions, cfg.head_dim)
        k = rope(k, positions, cfg.head_dim)
        if il is None:
            cl = cache_write(cl, "k", k)
            cl = cache_write(cl, "v", v)
        elif "page_table" in cl:
            cl = cache_write_paged(cl, "k", k, il)
            cl = cache_write_paged(cl, "v", v, il)
        else:
            cl = cache_write_full(cl, "k", k, il)
            cl = cache_write_full(cl, "v", v, il)
        use_flash = (
            cfg.use_flash_decode and N == 1 and slot is None
            and ("k_scale" not in cl or il is not None)
        )
        if use_flash:
            from ..ops.attention import (
                flash_decode_attention,
                flash_decode_attention_stacked,
                flash_decode_attention_stacked_int8,
            )

            # fine-grained chunks bound KV reads by the n_past high-water
            # mark (clamped index map elides DMA of dead chunks): bytes/step
            # scale with n_past, not n_ctx
            chunk = 128 if cfg.n_ctx % 128 == 0 else cfg.n_ctx
            if il is None:
                ctx = flash_decode_attention(
                    q[0], cl["k"], cl["v"], n_past, chunk=chunk
                )[None].astype(compute_dtype)
            elif "k_scale" in cl:
                # int8 cache: scales applied inside the kernel — the cache
                # streams at 1 B/elem, no dense dequant pass.  The cache
                # buffers pass THROUGH the kernel (aliased) so XLA never
                # copies them around the custom call (attention._alias_shim)
                ctx8, cl["k"], cl["v"] = flash_decode_attention_stacked_int8(
                    q[0], cl["k"], cl["v"], cl["k_scale"], cl["v_scale"],
                    il, n_past, chunk=chunk,
                )
                ctx = ctx8[None].astype(compute_dtype)
            else:
                ctxf, cl["k"], cl["v"] = flash_decode_attention_stacked(
                    q[0], cl["k"], cl["v"], il, n_past, chunk=chunk
                )
                ctx = ctxf[None].astype(compute_dtype)
        elif il is None:
            ctx = _attention(
                q, cache_read(cl, "k"), cache_read(cl, "v"), n_past, cfg.n_ctx,
                compute_dtype,
            )
        elif "page_table" in cl:
            ctx = _attention(
                q, cache_read_paged(cl, "k", il), cache_read_paged(cl, "v", il),
                n_past, cfg.n_ctx, compute_dtype,
            )
        else:
            ctx = _attention(
                q, cache_read_full(cl, "k", il), cache_read_full(cl, "v", il),
                n_past, cfg.n_ctx, compute_dtype,
            )
        x = x + lin(ctx.reshape(N, cfg.n_embd), layer["wo"])
        # feed-forward block: silu(w1·h) * (w3·h) → w2   (.mm:658-684)
        h = norm(x, layer["ffn_norm"], cfg.norm_type, cfg.norm_eps)
        if "w13" in layer:
            g13 = lin(h, layer["w13"])
            half = g13.shape[1] // 2  # n_ff possibly shard-padded
            g1 = g13[:, :half]
            g3 = g13[:, half:]
        else:
            g1 = lin(h, layer["w1"])
            g3 = lin(h, layer["w3"])
        gate = jax.nn.silu(g1.astype(jnp.float32)).astype(compute_dtype)
        x = x + lin(gate * g3, layer["w2"])
        return x, cl

    if "layers_stacked" in params:
        # Q4 weight stacks stay as whole [L, ...] HBM buffers in BOTH modes:
        # a scan slice (or XLA memory-space assignment on per-layer arrays)
        # would materialize weight-sized copies; instead the kernels index
        # the stacked buffer directly (StackedQ4Ref / StackedQ4VRef).
        from ..ops.q4_fused_layer import Q4_0TensorW
        from ..ops.q4_matmul_pallas import Q4_0TensorT, StackedQ4Ref
        from ..ops.q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV, StackedQ4VRef

        stacked = params["layers_stacked"]

        if (
            isinstance(stacked.get("wqkv"), Q4_0TensorW)
            and N == 1
            and slot is None
            and "k_scale" not in cache
            and cfg.quantize_activations
            and cfg.head_dim == 128
        ):
            # fused-stack decode: ONE pallas kernel for ALL layers — norm,
            # quant, rope, flash attention, SwiGLU and residuals all happen
            # between weight-tile DMA waits of a single ring that spans every
            # matmul of every layer, so the HBM weight stream never stops
            # (ops/q4_fused_layer.fused_layers_block)
            from ..ops.q4_fused_layer import (
                fused_layers_block,
                pick_ctx_chunk,
                rope_vectors,
            )

            interp = jax.default_backend() not in ("tpu", "axon")
            cos, sin = rope_vectors(n_past, cfg.head_dim)
            wqkv, wo = stacked["wqkv"], stacked["wo"]
            w13, w2 = stacked["w13"], stacked["w2"]
            H = cfg.n_head
            anorms = stacked["attention_norm"].astype(jnp.float32)
            fnorms = stacked["ffn_norm"].astype(jnp.float32)
            xout, knew, vnew = fused_layers_block(
                x.astype(jnp.float32).reshape(H, cfg.head_dim),
                anorms.reshape(cfg.n_layer, H, cfg.head_dim),
                fnorms.reshape(cfg.n_layer, H, cfg.head_dim),
                cos, sin,
                wqkv.qs4w, wqkv.scales_w, wo.qs4w, wo.scales_w,
                w13.qs4w, w13.scales_w, w2.qs4w, w2.scales_w,
                cache["k"], cache["v"], n_past,
                norm_type=cfg.norm_type, eps=cfg.norm_eps,
                ctx_chunk=pick_ctx_chunk(cfg.n_ctx), interpret=interp,
            )
            new_cache = dict(cache)
            # one in-place all-layers cache write at position n_past on the
            # donated buffers
            new_cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"], knew[:, :, None, :].astype(cache["k"].dtype),
                (0, 0, n_past, 0),
            )
            new_cache["v"] = jax.lax.dynamic_update_slice(
                cache["v"], vnew[:, :, None, :].astype(cache["v"].dtype),
                (0, 0, n_past, 0),
            )
            x = norm(
                xout.reshape(1, cfg.n_embd), params["norm"],
                cfg.norm_type, cfg.norm_eps,
            )
            logits = lin(x.astype(compute_dtype), params["output"]).astype(
                jnp.float32
            )
            return logits[:, : cfg.n_vocab], new_cache

        q4_keys = [
            k
            for k, v in stacked.items()
            if isinstance(v, (Q4_0TensorT, Q4_0TensorV, Q4_1TensorV))
        ]

        def layer_at(il):
            layer = {}
            for k, v in stacked.items():
                if k in q4_keys:
                    ref = (
                        StackedQ4VRef
                        if isinstance(v, (Q4_0TensorV, Q4_1TensorV))
                        else StackedQ4Ref
                    )
                    layer[k] = ref(v, il)
                elif isinstance(v, Q4_0TensorW):
                    # prefill reads the stacked W weights in place (slicing
                    # copies the whole layer's packed bytes)
                    from ..ops.q4_fused_layer import StackedQ4WRef

                    layer[k] = StackedQ4WRef(v, il)
                else:
                    # arrays index directly; "none"-layout logical-block
                    # containers slice leaf-wise
                    layer[k] = jax.tree_util.tree_map(lambda a: a[il], v)
            return layer

        if cfg.scan_layers and slot is None:
            # one traced layer, scanned over per-layer cache planes
            # (compile time ∝ 1 layer, not n_layer); the slot path always
            # unrolls — its in-place (il, slot) writes have no scan xs form
            xs_small = {k: v for k, v in stacked.items() if k not in q4_keys}
            il_seq = jnp.arange(cfg.n_layer, dtype=jnp.int32)

            def scan_body(x, xs):
                il, layer_small, cl = xs
                layer = dict(layer_small)
                for k in q4_keys:
                    ref = (
                        StackedQ4VRef
                        if isinstance(stacked[k], (Q4_0TensorV, Q4_1TensorV))
                        else StackedQ4Ref
                    )
                    layer[k] = ref(stacked[k], il)
                x, cl = layer_fn(x, layer, cl)
                return x, cl

            x, new_cache = jax.lax.scan(scan_body, x, (il_seq, xs_small, cache))
        else:
            # unrolled python loop over the SAME stacked weights: in-place
            # full-cache updates, no scan xs/ys plane copies (decode default)
            new_cache = cache
            for il in range(cfg.n_layer):
                x, new_cache = layer_fn(x, layer_at(il), new_cache, il=il)
    else:
        new_cache = cache
        for il in range(cfg.n_layer):
            x, new_cache = layer_fn(x, params["layers"][il], new_cache, il=il)

    x = norm(x, params["norm"], cfg.norm_type, cfg.norm_eps)
    logits = lin(x, params["output"]).astype(jnp.float32)
    logits = logits[:, : cfg.n_vocab]  # drop shard-padding rows of `output`
    return logits, new_cache


# ---------------------------------------------------------------------------
# Batched decode (continuous batching: one weight stream for all slots)
# ---------------------------------------------------------------------------


def _attention_batched(q, keys, values, n_pasts, compute_dtype):
    """Decode-step attention for B independent slots.

    q: [B, H, Dh] (one new token per slot); keys/values: [B, H, n_ctx, Dh];
    n_pasts: [B].  Slot b's query sits at position n_pasts[b], so allowed
    keys are j <= n_pasts[b] — the batched form of ``ggml_diag_mask_inf``.
    """
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(float(d))
    scores = jnp.einsum(
        "bhd,bhjd->bhj", q.astype(jnp.float32), keys.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    n_ctx = keys.shape[2]
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_ctx), 2)
    allowed = j_idx <= n_pasts[:, None, None]
    scores = jnp.where(allowed, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    ctx = jnp.einsum(
        "bhj,bhjd->bhd", p, values.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return ctx.astype(compute_dtype)


def forward_batched(
    params: Params,
    tokens: jnp.ndarray,  # [B] int32, one pending token per slot
    n_pasts: jnp.ndarray,  # [B] int32 per-slot positions
    cache: Cache,  # layer-major leaves [L, B, H, n_ctx, Dh]
    cfg: ModelConfig,
) -> tuple[jnp.ndarray, Cache]:
    """One decode step for B slots sharing the weights.

    Unlike ``vmap(forward)`` — which would re-stream the packed weights once
    PER SLOT — every matmul here sees all B activation rows at once, so the
    weight bytes cross HBM exactly once per step regardless of occupancy
    (decode stays weight-bandwidth-bound; the reference has no batching at
    all, SURVEY.md §2.6 DP row).

    Returns (logits [B, n_vocab] f32, updated cache).
    """
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    B = tokens.shape[0]
    lin = functools.partial(
        qmm.linear,
        quantize_activations=cfg.quantize_activations,
        compute_dtype=compute_dtype,
    )
    x = qmm.embedding_lookup(
        tokens, params["tok_embeddings"], compute_dtype=compute_dtype
    )[:, : cfg.n_embd]

    def write_plane(buf, val):
        """buf [B, H, n_ctx, Dh], val [B, H, Dh] at per-slot n_past."""
        vt = val[:, :, None, :].astype(buf.dtype)  # [B, H, 1, Dh]
        return jax.vmap(
            lambda b, v, np_: jax.lax.dynamic_update_slice(b, v, (0, np_, 0))
        )(buf, vt, n_pasts)

    def cache_write_b(cl, name, val):
        cl = dict(cl)
        if name + "_scale" in cl:
            amax = jnp.max(jnp.abs(val), axis=-1, keepdims=True)  # [B, H, 1]
            scale = amax / 127.0
            inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
            q = jnp.clip(jnp.round(val * inv), -127, 127)
            cl[name] = write_plane(cl[name], q)
            cl[name + "_scale"] = jax.vmap(
                lambda b, v, np_: jax.lax.dynamic_update_slice(b, v, (0, np_, 0))
            )(cl[name + "_scale"], scale[:, :, None, :], n_pasts)
            return cl
        cl[name] = write_plane(cl[name], val)
        return cl

    def cache_read_b(cl, name):
        if name + "_scale" in cl:
            return cl[name].astype(jnp.float32) * cl[name + "_scale"]
        return cl[name]

    def cache_write_full_b(c, name, val, il):
        """In-place write into the FULL layer-major cache [L, B, H, ctx, Dh]
        at (il, b, :, n_pasts[b], :) — B UNROLLED dynamic_update_slices
        (B is static).  NOT a vmapped DUS: vmap over the non-leading slot
        axis makes XLA materialize a transposed copy of the whole cache —
        measured 4.3 ms/layer at 13B batch-8 (the r5 batched regression);
        the unrolled form is free (in-place on the donated buffer)."""
        c = dict(c)

        def write_all(buf, vals):  # vals [B, H, Dh]
            for b in range(B):
                buf = jax.lax.dynamic_update_slice(
                    buf,
                    vals[b][None, None, :, None, :].astype(buf.dtype),
                    (il, b, 0, n_pasts[b], 0),
                )
            return buf

        if name + "_scale" in c:
            amax = jnp.max(jnp.abs(val), axis=-1, keepdims=True)  # [B, H, 1]
            scale = amax / 127.0
            inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
            q = jnp.clip(jnp.round(val * inv), -127, 127)
            c[name] = write_all(c[name], q)
            c[name + "_scale"] = write_all(c[name + "_scale"], scale)
            return c
        c[name] = write_all(c[name], val)
        return c

    def cache_read_full_b(c, name, il):
        if name + "_scale" in c:
            return c[name][il].astype(jnp.float32) * c[name + "_scale"][il]
        return c[name][il]

    def cache_write_paged_b(c, name, val, il):
        """PAGED write: slot b's new token lands at position n_pasts[b] via
        its page-table row — B unrolled in-place dynamic_update_slices
        (a batched scatter / non-leading vmapped DUS makes XLA copy the
        whole pool; see cache_write_full_b)."""
        pool = c[name + "_pool"]
        page = pool.shape[3]
        pids = jnp.clip(
            c["page_table"][jnp.arange(B), n_pasts // page],
            0, pool.shape[0] - 1,
        )
        offs = n_pasts % page
        c = dict(c)

        def write_all(buf, vals):  # vals [B, H, X]
            for b in range(B):
                buf = jax.lax.dynamic_update_slice(
                    buf,
                    vals[b][None, None, :, None, :].astype(buf.dtype),
                    (pids[b], il, 0, offs[b], 0),
                )
            return buf

        if name + "_scale_pool" in c:
            amax = jnp.max(jnp.abs(val), axis=-1, keepdims=True)  # [B, H, 1]
            scale = amax / 127.0
            inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
            qv = jnp.clip(jnp.round(val * inv), -127, 127)
            c[name + "_pool"] = write_all(pool, qv)
            c[name + "_scale_pool"] = write_all(
                c[name + "_scale_pool"], scale
            )
            return c
        c[name + "_pool"] = write_all(pool, val)
        return c

    def layer_fn(x, layer, cl, il=None):
        """x [B, D].  ``il is None`` (scan path): ``cl`` is this layer's
        cache planes [B, H, n_ctx, Dh].  Otherwise (unrolled): ``cl`` is the
        FULL layer-major cache, updated in place at layer ``il``."""
        D = cfg.n_embd
        h = norm(x, layer["attention_norm"], cfg.norm_type, cfg.norm_eps)
        if "wqkv" in layer:
            qkv = lin(h, layer["wqkv"])
            q = qkv[:, 0 * D : 1 * D].reshape(B, cfg.n_head, cfg.head_dim)
            k = qkv[:, 1 * D : 2 * D].reshape(B, cfg.n_head, cfg.head_dim)
            v = qkv[:, 2 * D : 3 * D].reshape(B, cfg.n_head, cfg.head_dim)
        else:
            q = lin(h, layer["wq"]).reshape(B, cfg.n_head, cfg.head_dim)
            k = lin(h, layer["wk"]).reshape(B, cfg.n_head, cfg.head_dim)
            v = lin(h, layer["wv"]).reshape(B, cfg.n_head, cfg.head_dim)
        # rope treats the slot axis as the position axis: slot b rotates at
        # its own n_pasts[b]
        q = rope(q, n_pasts, cfg.head_dim)
        k = rope(k, n_pasts, cfg.head_dim)
        if il is None:
            cl = cache_write_b(cl, "k", k)
            cl = cache_write_b(cl, "v", v)
            keys, values = cache_read_b(cl, "k"), cache_read_b(cl, "v")
            ctx = _attention_batched(q, keys, values, n_pasts, compute_dtype)
        elif "page_table" in cl:
            # PAGED decode: page-table-indirected flash kernel, per-slot
            # O(n_past) KV traffic over a pool sized by actual usage
            from ..ops.attention import (
                flash_decode_attention_paged,
                flash_decode_attention_paged_int8,
            )

            cl = cache_write_paged_b(cl, "k", k, il)
            cl = cache_write_paged_b(cl, "v", v, il)
            # pools pass THROUGH the kernels (aliased) — no XLA copies
            if "k_scale_pool" in cl:
                ctx8, cl["k_pool"], cl["v_pool"] = (
                    flash_decode_attention_paged_int8(
                        q, cl["k_pool"], cl["v_pool"],
                        cl["k_scale_pool"], cl["v_scale_pool"],
                        cl["page_table"], il, n_pasts,
                    )
                )
                ctx = ctx8.astype(compute_dtype)
            else:
                ctxf, cl["k_pool"], cl["v_pool"] = flash_decode_attention_paged(
                    q, cl["k_pool"], cl["v_pool"], cl["page_table"],
                    il, n_pasts,
                )
                ctx = ctxf.astype(compute_dtype)
        elif cfg.use_flash_decode:
            # batched flash decode reads the layer-major cache in place with
            # per-slot O(n_past) KV traffic (r4's dense path re-read the
            # whole [B, H, n_ctx] cache every step)
            from ..ops.attention import (
                flash_decode_attention_batched,
                flash_decode_attention_batched_int8,
            )

            cl = cache_write_full_b(cl, "k", k, il)
            cl = cache_write_full_b(cl, "v", v, il)
            chunk = 128 if cfg.n_ctx % 128 == 0 else cfg.n_ctx
            # cache buffers pass THROUGH the kernels (aliased) — without
            # this, XLA copies both full caches around every call: measured
            # 24 ms/call at 13B batch-8, 6x the whole step (r5)
            if "k_scale" in cl:
                ctx8, cl["k"], cl["v"] = flash_decode_attention_batched_int8(
                    q, cl["k"], cl["v"], cl["k_scale"], cl["v_scale"],
                    il, n_pasts, chunk=chunk,
                )
                ctx = ctx8.astype(compute_dtype)
            else:
                ctxf, cl["k"], cl["v"] = flash_decode_attention_batched(
                    q, cl["k"], cl["v"], il, n_pasts, chunk=chunk
                )
                ctx = ctxf.astype(compute_dtype)
        else:
            cl = cache_write_full_b(cl, "k", k, il)
            cl = cache_write_full_b(cl, "v", v, il)
            keys = cache_read_full_b(cl, "k", il)
            values = cache_read_full_b(cl, "v", il)
            ctx = _attention_batched(q, keys, values, n_pasts, compute_dtype)
        x = x + lin(ctx.reshape(B, cfg.n_embd), layer["wo"])
        h = norm(x, layer["ffn_norm"], cfg.norm_type, cfg.norm_eps)
        if "w13" in layer:
            g13 = lin(h, layer["w13"])
            half = g13.shape[1] // 2
            g1, g3 = g13[:, :half], g13[:, half:]
        else:
            g1 = lin(h, layer["w1"])
            g3 = lin(h, layer["w3"])
        gate = jax.nn.silu(g1.astype(jnp.float32)).astype(compute_dtype)
        x = x + lin(gate * g3, layer["w2"])
        return x, cl

    if "layers_stacked" in params:
        from ..ops.q4_fused_layer import Q4_0TensorW
        from ..ops.q4_matmul_pallas import Q4_0TensorT, StackedQ4Ref
        from ..ops.q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV, StackedQ4VRef

        stacked = params["layers_stacked"]
        q4_keys = [
            k for k, v in stacked.items()
            if isinstance(v, (Q4_0TensorT, Q4_0TensorV, Q4_1TensorV))
        ]
        def layer_at(il):
            layer = {}
            for k, v in stacked.items():
                if k in q4_keys:
                    ref = (
                        StackedQ4VRef
                        if isinstance(v, (Q4_0TensorV, Q4_1TensorV))
                        else StackedQ4Ref
                    )
                    layer[k] = ref(v, il)
                elif isinstance(v, Q4_0TensorW):
                    from ..ops.q4_fused_layer import StackedQ4WRef

                    layer[k] = StackedQ4WRef(v, il)
                else:
                    # arrays index directly; "none"-layout logical-block
                    # containers slice leaf-wise
                    layer[k] = jax.tree_util.tree_map(lambda a: a[il], v)
            return layer

        if cfg.scan_layers and "page_table" not in cache:
            # (paged caches always take the unrolled path: a page POOL has
            # no per-layer xs slicing — every layer scatters into the same
            # pool in place)
            xs_small = {k: v for k, v in stacked.items() if k not in q4_keys}
            il_seq = jnp.arange(cfg.n_layer, dtype=jnp.int32)

            def scan_body(x, xs):
                il, layer_small, cl = xs
                layer = dict(layer_small)
                for k in q4_keys:
                    ref = (
                        StackedQ4VRef
                        if isinstance(stacked[k], (Q4_0TensorV, Q4_1TensorV))
                        else StackedQ4Ref
                    )
                    layer[k] = ref(stacked[k], il)
                return layer_fn(x, layer, cl)

            x, new_cache = jax.lax.scan(scan_body, x, (il_seq, xs_small, cache))
        else:
            # unrolled loop over the same stacked weights (mirrors forward():
            # in-place full-cache updates, no scan xs/ys plane copies — the
            # faster decode mode per the config.scan_layers docstring)
            new_cache = cache
            for il in range(cfg.n_layer):
                x, new_cache = layer_fn(x, layer_at(il), new_cache, il=il)
    else:
        new_cache = cache
        for il in range(cfg.n_layer):
            x, new_cache = layer_fn(x, params["layers"][il], new_cache, il=il)

    x = norm(x, params["norm"], cfg.norm_type, cfg.norm_eps)
    logits = lin(x, params["output"]).astype(jnp.float32)
    return logits[:, : cfg.n_vocab], new_cache


# ---------------------------------------------------------------------------
# Jitted entry points
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill(params, tokens, n_past, cache, cfg: ModelConfig):
    """Process a (padded) prompt chunk; returns (all logits, cache).
    The cache buffer is donated — updated in place on device."""
    return forward(params, tokens, n_past, cache, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def decode_step(params, token, n_past, cache, cfg: ModelConfig):
    """Single-token decode; returns (logits [n_vocab], cache)."""
    logits, cache = forward(params, token[None], n_past, cache, cfg)
    return logits[0], cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_steps"), donate_argnames=("cache",)
)
def greedy_decode_loop(params, first_token, n_past, cache, cfg: ModelConfig, n_steps: int):
    """n_steps of on-device greedy decode under one ``lax.scan`` — zero host
    round-trips between tokens (per-step dispatch latency would otherwise
    bound decode throughput).  Returns (token ids [n_steps], cache).

    Greedy is a TPU-native extra; sampled decode goes through the host
    sampler for reference parity (``runtime/sampler.py``).
    """

    def body(carry, _):
        token, np_, c = carry
        logits, c = forward(params, token[None], np_, c, cfg)
        nxt = jnp.argmax(logits[0]).astype(jnp.int32)
        return (nxt, np_ + jnp.int32(1), c), nxt

    (_, _, cache), toks = jax.lax.scan(
        body, (first_token, n_past, cache), None, length=n_steps
    )
    return toks, cache


def pad_tokens(ids: list[int], multiple: int) -> tuple[np.ndarray, int]:
    """Right-pad a token list to a shape bucket (pad id 0); returns
    (padded [P] i32, true length)."""
    n = len(ids)
    p = max(multiple, ((n + multiple - 1) // multiple) * multiple)
    out = np.zeros(p, dtype=np.int32)
    out[:n] = ids
    return out, n
