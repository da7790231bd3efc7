"""Independent NumPy golden-reference implementation of the reference's
forward pass (SURVEY.md §3.2), written straight from the documented graph —
used to cross-check the JAX model.

Deliberately scalar-ish/naive and separate from the production code path:
float64 accumulation in norms (ggml uses double accumulators), explicit
adjacent-pair rope, dense causal attention, CTRL sampler. Cites:
``Sources/llamaObjCxx/bridge/LlamaPredictOperation.mm:510-735``.
"""

from __future__ import annotations

import numpy as np

from llama_swift_tpu.config import QK, ModelConfig


def ggml_norm_ref(x: np.ndarray, w: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    x64 = x.astype(np.float64)
    mean = x64.mean(axis=-1, keepdims=True)
    c = x64 - mean
    var = (c * c).mean(axis=-1, keepdims=True)
    return (c / np.sqrt(var + eps) * w.astype(np.float64)).astype(np.float32)


def rope_ref(x: np.ndarray, positions: np.ndarray, n_dims: int) -> np.ndarray:
    """x: [N, H, D]; adjacent-pair rotation, theta = 10000^(-i0/n_dims)
    (ggml.c:7106-7131)."""
    out = x.astype(np.float64).copy()
    N, H, D = x.shape
    for n in range(N):
        p = float(positions[n])
        for h in range(H):
            for i0 in range(0, n_dims, 2):
                theta = 10000.0 ** (-float(i0) / n_dims)
                ct, st = np.cos(p * theta), np.sin(p * theta)
                x0, x1 = out[n, h, i0], out[n, h, i0 + 1]
                out[n, h, i0] = x0 * ct - x1 * st
                out[n, h, i0 + 1] = x0 * st + x1 * ct
    return out.astype(np.float32)


def fake_quant_q4_0_ref(x: np.ndarray) -> np.ndarray:
    """Quantize-dequantize rows through Q4_0 scalar semantics."""
    shape = x.shape
    blocks = x.astype(np.float32).reshape(-1, QK).astype(np.float64)
    amax = np.abs(blocks).max(axis=1)
    d = (amax / 7.0).astype(np.float32).astype(np.float64)
    out = np.zeros_like(blocks)
    for i in range(blocks.shape[0]):
        if d[i] != 0:
            q = np.trunc(blocks[i] / d[i] + np.where(blocks[i] >= 0, 0.5, -0.5))
            out[i] = q * d[i]
    return out.reshape(shape).astype(np.float32)


def forward_ref(
    tensors: dict,
    cfg: ModelConfig,
    tokens: list[int],
    kv_k: np.ndarray,  # [L, n_ctx, H, Dh] — mutated
    kv_v: np.ndarray,
    n_past: int,
    *,
    quantize_activations: bool = False,
) -> np.ndarray:
    """Returns logits [N, n_vocab] f32 and updates the kv buffers in place.

    ``tensors`` holds dense f32 arrays in loader naming (already dequantized
    if the model is quantized; activation fake-quant is applied when
    ``quantize_activations``)."""
    N = len(tokens)
    D, H = cfg.n_embd, cfg.n_head
    Dh = cfg.head_dim

    def maybe_q(a):
        return fake_quant_q4_0_ref(a) if quantize_activations else a

    def lin(x, w):
        return maybe_q(x) @ w.T.astype(np.float32)

    x = tensors["tok_embeddings.weight"][np.asarray(tokens)]
    positions = np.arange(n_past, n_past + N)

    for il in range(cfg.n_layer):
        p = f"layers.{il}."
        h = ggml_norm_ref(x, tensors[p + "attention_norm.weight"])
        q = lin(h, tensors[p + "attention.wq.weight"]).reshape(N, H, Dh)
        k = lin(h, tensors[p + "attention.wk.weight"]).reshape(N, H, Dh)
        v = lin(h, tensors[p + "attention.wv.weight"]).reshape(N, H, Dh)
        q = rope_ref(q, positions, Dh)
        k = rope_ref(k, positions, Dh)
        kv_k[il, n_past : n_past + N] = k
        kv_v[il, n_past : n_past + N] = v
        ctx = np.zeros((N, H, Dh), dtype=np.float32)
        for i in range(N):
            t = n_past + i + 1  # keys 0..n_past+i inclusive
            keys = kv_k[il, :t]  # [t, H, Dh]
            vals = kv_v[il, :t]
            for hh in range(H):
                s = (keys[:, hh, :] @ q[i, hh, :]) / np.sqrt(float(Dh))
                s = s - s.max()
                e = np.exp(s)
                a = e / e.sum()
                ctx[i, hh] = a @ vals[:, hh, :]
        x = x + lin(ctx.reshape(N, D), tensors[p + "attention.wo.weight"])
        h = ggml_norm_ref(x, tensors[p + "ffn_norm.weight"])
        g = lin(h, tensors[p + "feed_forward.w1.weight"])
        g = g / (1.0 + np.exp(-g.astype(np.float64))).astype(np.float32)
        u = lin(h, tensors[p + "feed_forward.w3.weight"])
        x = x + lin(g * u, tensors[p + "feed_forward.w2.weight"])

    x = ggml_norm_ref(x, tensors["norm.weight"])
    return lin(x, tensors["output.weight"]).astype(np.float32)
