"""Tensor-parallel forward under ``jax.shard_map`` — TP that can execute the
fused Pallas kernels on a real multi-chip mesh.

Why shard_map: ``pallas_call`` under plain ``jit`` + ``NamedSharding`` cannot
be partitioned by GSPMD (no partitioning rule), so the NamedSharding-based
path (``parallel/sharding.py``) only proves the jnp fallback.  Here every
device runs the SAME program on its local weight shards — the Pallas matvec
kernels see local shapes — and the collectives are explicit
``jax.lax.all_gather``s.

Sharding layout (derived from the reference's multi-part split map,
``LlamaPredictOperation.mm:358-388``, adapted so the packed V layout shards
at its native 128-row-tile granularity):

* every 2-D weight is OUT-sharded (row-parallel).  For wq/wk/wv/w1/w3/output
  this IS the file's split_type 1.  For wo/w2 the file col-splits (in-dim);
  we out-shard them instead and all-gather their (replicated-size) outputs —
  at decode batch sizes the comm is a few 10s of KB/layer over ICI, and
  out-sharding keeps each shard a whole number of 128-row V-layout tiles so
  the batch-1 VPU matvec kernel runs UNCHANGED per shard (an in-dim split of
  the group-major packed lanes would not correspond to an in split).
* head_dim = 128 ⟹ each attention head is exactly one weight tile: heads
  shard evenly (n_head % tp == 0), the KV cache is head-sharded
  ([L, H/tp, n_ctx, Dh] local), and attention is fully local.
* tok_embeddings is vocab-sharded: local masked row lookup + psum.
* logits come back vocab-sharded and are all-gathered (the reference
  samples on the full vocab).
* 1-D norm weights replicated.

Comm per layer: all_gather(ctx [N,D]) before wo, all_gather(wo_out),
all_gather(gate [N,n_ff]) before w2, all_gather(w2_out) — 4 tiled
all-gathers, XLA maps them onto ICI rings.

Requires ``params_from_tensors(..., shard_pad=128*tp,
fuse_layer_matmuls=False)`` so n_ff/vocab pad up to whole tiles per shard
(zero rows are exact) and q/k/v stay separate (the fused out-concat would
interleave shards).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models import llama as model_lib
from ..ops import quantized_matmul as qmm
from ..ops.norms import norm
from ..ops.rope import rope

#: [out, in]-style leaves: out axis sharded (axis 0 of every packed layout)
def _out_spec(w):
    from ..ops.q4_matmul_pallas import Q4_0TensorT
    from ..ops.q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV

    if isinstance(w, Q4_0TensorV):
        return Q4_0TensorV(scales_v=P("tp", None, None), qs4v=P("tp", None, None))
    if isinstance(w, Q4_1TensorV):
        return Q4_1TensorV(sm_v=P("tp", None, None), qs4v=P("tp", None, None))
    if isinstance(w, Q4_0TensorT):
        return Q4_0TensorT(scales_t=P("tp", None, None), qs4=P("tp", None, None))
    from ..formats.quant import Q4_0Tensor, Q4_1Tensor

    if isinstance(w, Q4_0Tensor):
        return Q4_0Tensor(scales=P("tp", None), qs=P("tp", None))
    if isinstance(w, Q4_1Tensor):
        return Q4_1Tensor(mins=P("tp", None), scales=P("tp", None), qs=P("tp", None))
    return P("tp", None)


def _lift(spec, w=None):
    """Prepend a replicated layer axis to each leaf spec (stacked params)."""

    def one(s):
        return P(None, *tuple(s))

    return jax.tree_util.tree_map(one, spec, is_leaf=lambda x: isinstance(x, P))


def tp_param_specs(params: dict) -> dict:
    """PartitionSpec tree for the all-row-parallel TP layout."""
    specs: dict = {
        "tok_embeddings": _out_spec(params["tok_embeddings"]),
        "norm": P(None),
        "output": _out_spec(params["output"]),
    }
    layer_spec = lambda k, w: (
        P(None, None) if k in ("attention_norm", "ffn_norm") else _out_spec(w)
    )
    if "layers_stacked" in params:
        specs["layers_stacked"] = {
            k: _lift(layer_spec(k, v)) if k not in ("attention_norm", "ffn_norm")
            else P(None, None)
            for k, v in params["layers_stacked"].items()
        }
    if "layers" in params:
        specs["layers"] = [
            {k: layer_spec(k, v) for k, v in layer.items()}
            for layer in params["layers"]
        ]
    return specs


def tp_cache_spec() -> P:
    return P(None, "tp", None, None)


def shard_params_tp(params: dict, mesh: Mesh) -> dict:
    specs = tp_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, (np.ndarray, jnp.ndarray)),
    )


def shard_cache_tp(cache: dict, mesh: Mesh) -> dict:
    s = NamedSharding(mesh, tp_cache_spec())
    return {k: jax.device_put(v, s) for k, v in cache.items()}


# ---------------------------------------------------------------------------
# local (per-shard) forward
# ---------------------------------------------------------------------------


def _local_forward(params, tokens, n_past, cache, cfg: ModelConfig, tp: int):
    """Forward on ONE shard's weights; runs inside shard_map.

    Mirrors ``models.llama.forward`` op for op
    (``LlamaPredictOperation.mm:558-712``), with explicit collectives:
    embedding psum; all_gather after attention (ctx), wo, w13-gate, w2;
    vocab-sharded logits all-gathered at the end.  The layer loop is
    unrolled (in-place full-cache updates at (il, ·)).
    """
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    N = tokens.shape[0]
    h_local = cfg.n_head // tp
    lin = functools.partial(
        qmm.linear,
        quantize_activations=cfg.quantize_activations,
        compute_dtype=compute_dtype,
    )
    ag = functools.partial(jax.lax.all_gather, axis_name="tp", tiled=True, axis=-1)
    positions = n_past + jnp.arange(N, dtype=jnp.int32)

    # vocab-sharded embedding: local masked lookup + psum.  Local table rows
    # cover ids [rank*vpl, (rank+1)*vpl); out-of-range ids clamp to row 0 and
    # are zeroed before the psum.
    emb = params["tok_embeddings"]
    vpl = emb.shape[0]  # local rows (padded vocab / tp)
    rank = jax.lax.axis_index("tp")
    local_ids = tokens - rank * vpl
    in_range = (local_ids >= 0) & (local_ids < vpl)
    x = qmm.embedding_lookup(
        jnp.where(in_range, local_ids, 0), emb, compute_dtype=compute_dtype
    )
    x = jnp.where(in_range[:, None], x, 0.0)
    x = jax.lax.psum(x, "tp")[:, : cfg.n_embd]

    def cache_write(c, name, val, il):
        """val [N, h_local, Dh] -> in-place at (il, :, n_past, :)."""
        vt = val.transpose(1, 0, 2)[None]
        c = dict(c)
        c[name] = jax.lax.dynamic_update_slice(
            c[name], vt.astype(c[name].dtype), (il, 0, n_past, 0)
        )
        return c

    def layer_fn(x, layer, c, il):
        D = cfg.n_embd
        d_local = D // tp
        h = norm(x, layer["attention_norm"], cfg.norm_type, cfg.norm_eps)
        if "wqkv" in layer:
            # shard-interleaved fused concat (params_from_tensors
            # fuse_shards=tp): this shard's local out rows ARE (q_r; k_r;
            # v_r) — one kernel launch and one activation prep instead of 3
            qkv = lin(h, layer["wqkv"])  # [N, 3·d_local]
            q = qkv[:, 0 * d_local : 1 * d_local]
            k = qkv[:, 1 * d_local : 2 * d_local]
            v = qkv[:, 2 * d_local : 3 * d_local]
            q = q.reshape(N, h_local, cfg.head_dim)
            k = k.reshape(N, h_local, cfg.head_dim)
            v = v.reshape(N, h_local, cfg.head_dim)
        else:
            q = lin(h, layer["wq"]).reshape(N, h_local, cfg.head_dim)
            k = lin(h, layer["wk"]).reshape(N, h_local, cfg.head_dim)
            v = lin(h, layer["wv"]).reshape(N, h_local, cfg.head_dim)
        q = rope(q, positions, cfg.head_dim)
        k = rope(k, positions, cfg.head_dim)
        c = cache_write(c, "k", k, il)
        c = cache_write(c, "v", v, il)
        if cfg.use_flash_decode and N == 1:
            # head-sharded cache is LOCAL: per-shard flash decode, O(n_past)
            # KV traffic, no extra comm (VERDICT r4 #5 — the TP path used to
            # force the dense O(n_ctx) attention)
            from ..ops.attention import flash_decode_attention_stacked

            chunk = 128 if cfg.n_ctx % 128 == 0 else cfg.n_ctx
            ctxf, ck, cv = flash_decode_attention_stacked(
                q[0], c["k"], c["v"], il, n_past, chunk=chunk
            )
            c = dict(c)
            c["k"], c["v"] = ck, cv  # aliased pass-through, no copies
            ctx = ctxf[None].astype(compute_dtype)
        else:
            ctx = model_lib._attention(
                q, c["k"][il], c["v"][il], n_past, cfg.n_ctx, compute_dtype
            )  # [N, h_local, Dh]
        ctx_full = ag(ctx.reshape(N, d_local))  # [N, D] (head-major across ranks)
        xo = lin(ctx_full, layer["wo"])  # [N, D/tp] local out rows
        x = x + ag(xo)
        h = norm(x, layer["ffn_norm"], cfg.norm_type, cfg.norm_eps)
        if "w13" in layer:
            g13 = lin(h, layer["w13"])  # [N, 2·ff_local], (w1_r; w3_r)
            ffl = g13.shape[1] // 2
            g1, g3 = g13[:, :ffl], g13[:, ffl:]
        else:
            g1 = lin(h, layer["w1"])  # [N, ff_local]
            g3 = lin(h, layer["w3"])
        gate = jax.nn.silu(g1.astype(jnp.float32)).astype(compute_dtype) * g3
        gate_full = ag(gate)  # [N, ff_pad] (rank-contiguous = global order)
        x2 = lin(gate_full, layer["w2"])  # [N, D/tp]
        x = x + ag(x2)
        return x, c

    if "layers_stacked" in params:
        from ..ops.q4_matmul_pallas import Q4_0TensorT, StackedQ4Ref
        from ..ops.q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV, StackedQ4VRef

        stacked = params["layers_stacked"]

        def layer_at(il):
            layer = {}
            for k, v in stacked.items():
                if isinstance(v, (Q4_0TensorV, Q4_1TensorV)):
                    layer[k] = StackedQ4VRef(v, il)
                elif isinstance(v, Q4_0TensorT):
                    layer[k] = StackedQ4Ref(v, il)
                else:
                    layer[k] = v[il]
            return layer

        new_cache = cache
        for il in range(cfg.n_layer):
            x, new_cache = layer_fn(x, layer_at(il), new_cache, il)
    else:
        new_cache = cache
        for il in range(cfg.n_layer):
            x, new_cache = layer_fn(x, params["layers"][il], new_cache, il)

    x = norm(x, params["norm"], cfg.norm_type, cfg.norm_eps)
    logits = lin(x, params["output"]).astype(jnp.float32)  # [N, vocab_pad/tp]
    logits = jax.lax.all_gather(logits, "tp", tiled=True, axis=-1)
    return logits[:, : cfg.n_vocab], new_cache


def make_tp_forward(mesh: Mesh, cfg: ModelConfig, params, cache):
    """Build a jitted shard_map forward: (params, tokens [N], n_past, cache)
    -> (logits [N, n_vocab] replicated, cache).  The returned callable runs
    each shard's fused Pallas kernels locally (on TPU) or the jnp/interpret
    path (CPU mesh tests)."""
    tp = mesh.shape["tp"]
    assert cfg.n_head % tp == 0, (cfg.n_head, tp)
    # fused wqkv/w13 ARE supported — but only the shard-interleaved concat
    # (params_from_tensors(..., fuse_shards=tp)); the global concat would
    # interleave shards' rows across ranks.  Not detectable from shapes —
    # the caller owns this invariant (serve.py passes fuse_shards=tp).
    pspecs = tp_param_specs(params)
    cspec = {k: tp_cache_spec() for k in cache}

    local = functools.partial(_local_forward, cfg=cfg, tp=tp)
    fwd = jax.shard_map(
        lambda p, t, n, c: local(p, t, n, c),
        mesh=mesh,
        in_specs=(pspecs, P(), P(), cspec),
        out_specs=(P(), cspec),
        check_vma=False,
    )
    return jax.jit(fwd, donate_argnums=(3,))
