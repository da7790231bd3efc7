"""Batched-decode kernels (interpret mode): the multi-row VPU matmul
(`q4_0_vpu_matmul_multi`) vs exact per-row int4-dot semantics, and the
batched flash-decode attention kernels vs the dense batched reference.

These are the continuous-batching analogues of the batch-1 kernels the
reference's single-stream loop never needed (SURVEY.md §2.6 DP row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_swift_tpu.config import ModelConfig
from llama_swift_tpu.formats.quant import Q4_0Tensor
from llama_swift_tpu.models import llama as model_lib
from llama_swift_tpu.ops.attention import (
    flash_decode_attention_batched,
    flash_decode_attention_batched_int8,
)
from llama_swift_tpu.ops.q4_vpu_pallas import (
    Q4_0TensorV,
    q4_0_vpu_matmul_multi,
    q4_0_vpu_matvec,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(3)


@pytest.mark.parametrize("B", [2, 4, 8])
def test_multi_row_matmul_matches_matvec(rng, B):
    """The B-row kernel must equal B independent runs of the (already
    reference-exact) single-row matvec kernel, row for row."""
    out_dim, in_dim = 256, 4096
    w = Q4_0Tensor.quantize(
        (rng.standard_normal((out_dim, in_dim)) * 0.05).astype(np.float32)
    )
    wv = Q4_0TensorV.from_q4_0(w)
    x = (rng.standard_normal((B, in_dim)) * 0.5).astype(np.float32)
    got = q4_0_vpu_matmul_multi(jnp.asarray(x), wv, interpret=True)
    for b in range(B):
        ref = q4_0_vpu_matvec(jnp.asarray(x[b : b + 1]), wv, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(ref[0]), rtol=1e-6, atol=1e-6
        )


def test_multi_row_matmul_stacked(rng):
    """Stacked (layer-indexed) variant picks the right layer plane."""
    B, out_dim, in_dim, L = 3, 128, 4096, 2
    ws = [
        Q4_0Tensor.quantize(
            (rng.standard_normal((out_dim, in_dim)) * 0.05).astype(np.float32)
        )
        for _ in range(L)
    ]
    stacked = Q4_0TensorV(
        scales_v=jnp.stack([jnp.asarray(Q4_0TensorV.from_q4_0(w).scales_v) for w in ws]),
        qs4v=jnp.stack([jnp.asarray(Q4_0TensorV.from_q4_0(w).qs4v) for w in ws]),
    )
    x = (rng.standard_normal((B, in_dim)) * 0.5).astype(np.float32)
    for il in range(L):
        got = q4_0_vpu_matmul_multi(
            jnp.asarray(x), stacked, jnp.int32(il), interpret=True
        )
        ref = q4_0_vpu_matmul_multi(
            jnp.asarray(x), Q4_0TensorV.from_q4_0(ws[il]), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
        )


@pytest.mark.parametrize("B", [1, 3, 8])
def test_multi_row_t_matmul_matches_v(rng, B):
    """The T-layout multi-row VPU kernel must equal the (reference-exact)
    V-layout single-row matvec, row for row — same int4 dot semantics on a
    different physical layout (1024- vs 4096-aligned in-dims)."""
    from llama_swift_tpu.ops.q4_matmul_pallas import (
        Q4_0TensorT,
        q4_0_t_matmul_multi,
    )

    out_dim, in_dim = 256, 5120  # 5120: fits T alignment, NOT V's
    w = Q4_0Tensor.quantize(
        (rng.standard_normal((out_dim, in_dim)) * 0.05).astype(np.float32)
    )
    wt = Q4_0TensorT.from_q4_0(w)
    wv = Q4_0TensorV.from_q4_0(
        Q4_0Tensor(
            scales=np.pad(np.asarray(w.scales), ((0, 0), (0, (8192 - 5120) // 32))),
            qs=np.pad(np.asarray(w.qs), ((0, 0), (0, (8192 - 5120) // 2))),
        )
    )
    x = (rng.standard_normal((B, in_dim)) * 0.5).astype(np.float32)
    got = q4_0_t_matmul_multi(jnp.asarray(x), wt, interpret=True)
    for b in range(B):
        ref = q4_0_vpu_matvec(
            jnp.asarray(np.pad(x[b : b + 1], ((0, 0), (0, 8192 - 5120)))),
            wv, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(ref[0]), rtol=1e-6, atol=1e-6
        )


def test_multi_row_t_matmul_stacked(rng):
    from llama_swift_tpu.ops.q4_matmul_pallas import (
        Q4_0TensorT,
        q4_0_t_matmul_multi,
    )

    B, out_dim, in_dim, L = 3, 128, 1024, 2
    ws = [
        Q4_0Tensor.quantize(
            (rng.standard_normal((out_dim, in_dim)) * 0.05).astype(np.float32)
        )
        for _ in range(L)
    ]
    stacked = Q4_0TensorT(
        scales_t=jnp.stack(
            [jnp.asarray(Q4_0TensorT.from_q4_0(w).scales_t) for w in ws]
        ),
        qs4=jnp.stack([jnp.asarray(Q4_0TensorT.from_q4_0(w).qs4) for w in ws]),
    )
    x = (rng.standard_normal((B, in_dim)) * 0.5).astype(np.float32)
    for il in range(L):
        got = q4_0_t_matmul_multi(
            jnp.asarray(x), stacked, jnp.int32(il), interpret=True
        )
        ref = q4_0_t_matmul_multi(
            jnp.asarray(x), Q4_0TensorT.from_q4_0(ws[il]), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
        )


def _dense_batched_reference(q, keys, values, n_pasts):
    """[B, H, Dh] x [B, H, ctx, Dh] masked softmax attention (f32)."""
    s = jnp.einsum(
        "bhd,bhjd->bhj", q.astype(jnp.float32), keys.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) / np.sqrt(float(q.shape[-1]))
    j = jnp.arange(keys.shape[2])[None, None, :]
    s = jnp.where(j <= n_pasts[:, None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhj,bhjd->bhd", p, values.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_batched(rng, dtype):
    L, B, H, CTX, DH = 2, 4, 4, 256, 128
    keys = (rng.standard_normal((L, B, H, CTX, DH)) * 0.5).astype(np.float32)
    vals = (rng.standard_normal((L, B, H, CTX, DH)) * 0.5).astype(np.float32)
    q = rng.standard_normal((B, H, DH)).astype(np.float32)
    n_pasts = jnp.asarray([0, 7, 130, 255], jnp.int32)
    kd = jnp.asarray(keys).astype(dtype)
    vd = jnp.asarray(vals).astype(dtype)
    for il in range(L):
        got, _, _ = flash_decode_attention_batched(
            jnp.asarray(q), kd, vd, jnp.int32(il), n_pasts, interpret=True
        )
        ref = _dense_batched_reference(
            jnp.asarray(q), kd[il].astype(jnp.float32),
            vd[il].astype(jnp.float32), n_pasts,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_flash_batched_int8(rng):
    L, B, H, CTX, DH = 2, 3, 4, 256, 128
    k8 = rng.integers(-127, 128, (L, B, H, CTX, DH)).astype(np.int8)
    v8 = rng.integers(-127, 128, (L, B, H, CTX, DH)).astype(np.int8)
    ks = (0.01 + 0.05 * rng.random((L, B, H, CTX, 1))).astype(np.float32)
    vs = (0.01 + 0.05 * rng.random((L, B, H, CTX, 1))).astype(np.float32)
    q = rng.standard_normal((B, H, DH)).astype(np.float32)
    n_pasts = jnp.asarray([3, 128, 200], jnp.int32)
    got, _, _ = flash_decode_attention_batched_int8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8),
        jnp.asarray(ks), jnp.asarray(vs), jnp.int32(1), n_pasts,
        interpret=True,
    )
    ref = _dense_batched_reference(
        jnp.asarray(q), jnp.asarray(k8[1].astype(np.float32) * ks[1]),
        jnp.asarray(v8[1].astype(np.float32) * vs[1]), n_pasts,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8"])
def test_forward_batched_flash_matches_dense(kv_dtype):
    """Whole forward_batched: flash kernels (interpret) == XLA attention."""
    import dataclasses

    from llama_swift_tpu.ops import quantized_matmul as qmm

    cfg = ModelConfig.tiny(
        n_ctx=128, n_embd=256, n_head=2, n_rot=128, n_vocab=256, n_mult=128,
        n_layer=2, kv_cache_dtype=kv_dtype, scan_layers=False,
        use_flash_decode=True,
    )
    tensors = model_lib.random_params(cfg, seed=11)
    qt = {
        k: (Q4_0Tensor.quantize(v) if v.ndim == 2 else v)
        for k, v in tensors.items()
    }
    params = model_lib.params_from_tensors(
        qt, cfg, param_dtype=jnp.float32, q4_layout="v"
    )
    B = 3
    toks = jnp.asarray([3, 5, 9], jnp.int32)
    n_pasts = jnp.asarray([0, 4, 9], jnp.int32)
    outs = {}
    orig = qmm.FORCE_PALLAS_INTERPRET
    qmm.FORCE_PALLAS_INTERPRET = True  # take the kernel branches (interpret)

    def random_history(cache, seed=42):
        """Realistic random cache contents.  NOT zeros/ones: degenerate
        history makes softmax outputs land exactly on activation-quant
        rounding boundaries, where a 1-ulp attention-order difference flips
        a whole 4-bit level (a property of the reference's act-quant
        semantics, not of the kernels)."""
        r = np.random.default_rng(seed)
        out = {}
        for k, v in cache.items():
            if v.dtype == jnp.int8:
                out[k] = jnp.asarray(
                    r.integers(-127, 128, v.shape).astype(np.int8)
                )
            elif k.endswith("_scale"):
                out[k] = jnp.asarray(
                    (0.001 + 0.01 * r.random(v.shape)).astype(np.float32)
                )
            else:
                out[k] = jnp.asarray(
                    (0.3 * r.standard_normal(v.shape)).astype(np.float32)
                ).astype(v.dtype)
        return out

    try:
        for name, cfg_run in [
            ("flash", cfg),
            ("dense", dataclasses.replace(cfg, use_flash_decode=False)),
        ]:
            cache = random_history(model_lib.init_cache_batched(cfg_run, B))
            logits, _ = model_lib.forward_batched(
                params, toks, n_pasts, cache, cfg_run
            )
            outs[name] = np.asarray(logits)
    finally:
        qmm.FORCE_PALLAS_INTERPRET = orig
    np.testing.assert_allclose(
        outs["flash"], outs["dense"], rtol=3e-4, atol=3e-4
    )
