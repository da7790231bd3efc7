"""Tensor-parallel partition specs, derived from the reference's multi-part
file format.

The GGML multi-part checkpoint IS a Megatron TP sharding that the reference
loader merges away (``LlamaPredictOperation.mm:306-495``; SURVEY.md §2.6).
We keep it: the same split map becomes the ``PartitionSpec`` table.

numpy weight layout is ``[out, in]`` (ggml ``ne=(in, out)``), so:

* split_type 1 (file row-split: wq/wk/wv, w1/w3, output) → shard the OUT
  axis → column-parallel Megatron matmuls: no communication on entry, heads/
  ffn-hidden sharded on exit.
* split_type 0 (file col-split: tok_embeddings, wo, w2) → shard the IN axis
  → row-parallel matmuls: partial sums on exit, XLA inserts the psum over
  ``tp`` when the result must be replicated (the residual stream stays
  replicated).
* 1-D norm weights: replicated.
* KV cache: head axis sharded over ``tp`` (consistent with wq/wk/wv out
  sharding — cache writes stay local, no comm in attention except none).
* logits: vocab axis sharded (output is split_type 1); the sampler gathers —
  or later samples shard-wise.

Quantized tensors shard per-leaf with the same axis mapping (scales/mins
``[out, in/32]``, qs ``[out, in/2]`` — both axes scale proportionally, so the
spec is identical).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..formats.quant import Q4_0Tensor, Q4_1Tensor

# [out, in] axis -> mesh axis
ROW_PARALLEL = P("tp", None)   # out sharded  (file split_type 1)
COL_PARALLEL = P(None, "tp")   # in sharded   (file split_type 0)
REPLICATED_1D = P(None)

#: weight-name → spec, exactly the loader's split policy
#: (LlamaPredictOperation.mm:358-388)
LAYER_SPECS = {
    "attention_norm": REPLICATED_1D,
    "wq": ROW_PARALLEL,
    "wk": ROW_PARALLEL,
    "wv": ROW_PARALLEL,
    "wqkv": ROW_PARALLEL,  # fused out-dim concat keeps the row-parallel spec
    "wo": COL_PARALLEL,
    "ffn_norm": REPLICATED_1D,
    "w1": ROW_PARALLEL,
    "w13": ROW_PARALLEL,
    "w2": COL_PARALLEL,
    "w3": ROW_PARALLEL,
}

TOP_SPECS = {
    "tok_embeddings": COL_PARALLEL,
    "norm": REPLICATED_1D,
    "output": ROW_PARALLEL,
}


def _wrap_quant(spec: P, w: Any, stacked: bool = False) -> Any:
    """Expand a 2-D weight spec onto the leaves of a quantized tensor.

    Transposed (contraction-major) Q4 layouts swap the spec axes; ``stacked``
    prepends a replicated layer axis (scan-over-layers param layout)."""
    from ..ops.q4_matmul_pallas import Q4_0TensorT
    from ..ops.q4_vpu_pallas import Q4_0TensorV, Q4_1TensorV

    def lift(s: P) -> P:
        return P(None, *tuple(s)) if stacked else s

    if isinstance(w, Q4_0Tensor):
        return Q4_0Tensor(scales=lift(spec), qs=lift(spec))
    if isinstance(w, Q4_1Tensor):
        return Q4_1Tensor(mins=lift(spec), scales=lift(spec), qs=lift(spec))
    if isinstance(w, Q4_0TensorT):
        # tiled layout [out/128, in-scaled, 128]: out shards on axis 0,
        # in shards on axis 1
        if spec == ROW_PARALLEL:
            tspec = P("tp", None, None)
        elif spec == COL_PARALLEL:
            tspec = P(None, "tp", None)
        else:
            tspec = P(None, None, None)
        return Q4_0TensorT(scales_t=lift(tspec), qs4=lift(tspec))
    if isinstance(w, Q4_0TensorV):
        # VPU layout [out/128, 128, in/8]: out shards on the tile axis.
        # In-dim (COL_PARALLEL) sharding is NOT supported on this layout:
        # group-major lanes interleave nibble groups across the in range, so
        # a lane split does not correspond to an in split (TP in-sharding
        # uses the T/logical layouts; params_from_tensors keeps q4_layout
        # "t" when shard_pad > 1).
        if spec == ROW_PARALLEL:
            vspec = P("tp", None, None)
        else:
            vspec = P(None, None, None)
        return Q4_0TensorV(scales_v=lift(vspec), qs4v=lift(vspec))
    if isinstance(w, Q4_1TensorV):
        if spec == ROW_PARALLEL:
            vspec = P("tp", None, None)
        else:
            vspec = P(None, None, None)
        return Q4_1TensorV(sm_v=lift(vspec), qs4v=lift(vspec))
    return lift(spec)


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching the model param tree."""
    specs: dict = {
        name: _wrap_quant(TOP_SPECS[name], params[name]) for name in TOP_SPECS
    }
    if "layers_stacked" in params:
        specs["layers_stacked"] = {
            k: _wrap_quant(LAYER_SPECS[k], params["layers_stacked"][k], stacked=True)
            for k in params["layers_stacked"]
        }
    if "layers" in params:
        specs["layers"] = [
            {k: _wrap_quant(LAYER_SPECS[k], layer[k]) for k in layer}
            for layer in params["layers"]
        ]
    return specs


def cache_spec(batched: bool = False) -> P:
    """KV cache leaves [L, H, n_ctx, Dh|1] (+ leading B): heads over tp.
    The same spec applies to int8 caches' scale leaves (same leading dims)."""
    if batched:
        return P("dp", None, "tp", None, None)
    return P(None, "tp", None, None)


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place params on the mesh with the TP spec (device_put per leaf)."""
    specs = param_specs(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    spec_leaves, spec_treedef = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    assert treedef == spec_treedef, (treedef, spec_treedef)
    placed = [
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(leaves, spec_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def shard_cache(cache: dict, mesh: Mesh, batched: bool = False) -> dict:
    spec = cache_spec(batched)
    return {
        k: jax.device_put(v, NamedSharding(mesh, spec)) for k, v in cache.items()
    }


def validate_tp_divisibility(
    cfg: ModelConfig, tp: int, *, tiled_q4: bool = False
) -> None:
    """TP must divide heads, ffn hidden, vocab and (for quant) keep whole
    32-element blocks per shard.

    With ``tiled_q4`` (the 128-row-tiled Pallas layout), row-parallel shards
    have 128-row granularity: n_embd must divide by 128·tp; n_ff and vocab
    are zero-padded by ``params_from_tensors(shard_pad=128*tp)`` instead.
    """
    if cfg.n_head % tp:
        raise ValueError(f"n_head {cfg.n_head} not divisible by tp={tp}")
    if cfg.n_ff % (32 * tp) and not tiled_q4:
        raise ValueError(
            f"n_ff {cfg.n_ff} must keep whole Q4 blocks per shard (tp={tp})"
        )
    if cfg.n_vocab % tp and not tiled_q4:
        raise ValueError(f"n_vocab {cfg.n_vocab} not divisible by tp={tp}")
    if cfg.n_embd % (32 * tp):
        raise ValueError(
            f"n_embd {cfg.n_embd} must keep whole Q4 blocks per shard (tp={tp})"
        )
    if tiled_q4 and cfg.n_embd % (128 * tp):
        raise ValueError(
            f"tiled Q4 layout row-shards at 128-row granularity: n_embd "
            f"{cfg.n_embd} must divide by 128*tp={128 * tp}"
        )
