"""Multi-head self-attention — TPU-native.

The reference computes attention with a Python loop over per-head
``nn.Linear`` modules and materializes the full (T, T) weight matrix per head
(``src/VisionTransformer/transformer.py:9-49``). Here the whole multi-head op
is one fused QKV matmul + either a Pallas flash-attention kernel (TPU fast
path, O(T) memory) or a jnp reference path (used for parity tests and when
per-head attention probabilities are requested, mirroring the reference's
``attention_probs`` API at transformer.py:39,48).

Scaling is the standard ``1/sqrt(head_dim)`` — the reference's Python stack
*multiplies* by sqrt(head_dim) (transformer.py:24, a bug); its C stack divides
(``csrc/vit.c:297,206-212``), which is the behavior we keep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reference_attention(q, k, v, *, return_probs=False, scale=None):
    """Plain XLA attention. q/k/v: (B, H, T, D). Returns (out, probs|None).

    Stable softmax (max-subtracted) in fp32 — the reference C softmax has no
    max subtraction (csrc/vit.c:215-229) which we deliberately do not copy.
    ``scale``: override the logit scale (default 1/sqrt(head_dim)); the
    bug-exact parity mode passes +sqrt(head_dim) (transformer.py:24).
    """
    dtype = q.dtype
    head_dim = q.shape[-1]
    if scale is None:
        scale = 1.0 / (head_dim ** 0.5)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)  # fp32, max-subtracted inside
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    return (out, probs) if return_probs else (out, None)


def _qk_layer_norm(t, scale, eps):
    """Per-head LayerNorm over head_dim with a learned scale, no bias
    (ViT-22B QK-Norm). t: (B, H, T, D); scale: (H, D). fp32 statistics."""
    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
    normed = (tf - mu) * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)[None, :, None, :]).astype(
        t.dtype)


def multi_head_attention(
    x,
    wqkv,
    bqkv,
    wo,
    bo,
    *,
    num_heads: int,
    impl: str = "auto",
    return_probs: bool = False,
    probs_mode: str = "full",
    scale: float | None = None,
    qk_scales=None,
    qk_eps: float = 1e-5,
    rope=None,
):
    """Fused multi-head self-attention over tokens.

    Args:
      x: (B, T, E) activations.
      wqkv: (E, 3, H, D) combined QKV projection weight.
      bqkv: (3, H, D) or None.
      wo: (E, E) output projection; bo: (E,) or None.
      num_heads: H.
      impl: "auto" | "flash" | "reference".
      return_probs: also return attention probabilities (the instrumented
        flash variant or the reference path).
      probs_mode: "full" -> (B, H, T, T); "mean" -> head-mean (B, T, T),
        H-fold less HBM traffic — all the rollout consumer needs.
      qk_scales: optional (scale_q, scale_k) pair of (H, D) LayerNorm
        scales — enables QK-Norm (ViT-22B): per-head LN (no bias) on q and
        k before the logits. Composes with the flash kernel (normalization
        happens before the kernel call).
      rope: optional (cos, sin) pair of (T, D) rotation tables (2D axial
        RoPE, vitx/nn/vit.py::rope_tables) applied to q and k after the
        projection (and after QK-Norm, which normalizes the raw
        projections — rotation is an isometry, so the order only affects
        which statistics the LN sees). Composes with the flash kernel.

    Returns:
      (out, probs) — out is (B, T, E); probs is (B, H, T, T) fp32 or None.
    """
    B, T, E = x.shape
    H = num_heads
    D = E // H

    if scale is not None:
        # non-standard logit scale (bug-exact parity): the flash kernel
        # hard-codes 1/sqrt(D) — use the XLA path
        use_flash = False
    elif impl == "flash":
        use_flash = True
    elif impl == "auto":
        use_flash = jax.default_backend() == "tpu" and D >= 32 and T >= 128
    else:
        use_flash = False

    # Three per-projection einsums, each emitting the kernel's (B,H,T,D)
    # layout directly from the matmul. NOT one stacked "bte,eshd->sbhtd"
    # einsum + slices: splitting the stacked (3,B,H,T,D) output is a pure
    # HBM copy that cost 16.7 ms/call at ViT-L@384 (profiled round 2);
    # weight slices are weight-sized and free.
    w = wqkv.astype(x.dtype)
    bq = bk = bv = None
    if bqkv is not None:
        b3 = bqkv.astype(x.dtype).reshape(3, 1, H, 1, D)
        bq, bk, bv = b3[0], b3[1], b3[2]

    def proj(s, bias):
        r = jnp.einsum("bte,ehd->bhtd", x, w[:, s],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return r if bias is None else r + bias

    q, k, v = proj(0, bq), proj(1, bk), proj(2, bv)
    if qk_scales is not None:
        q = _qk_layer_norm(q, qk_scales[0], qk_eps)
        k = _qk_layer_norm(k, qk_scales[1], qk_eps)
    if rope is not None:
        from vitx.nn.vit import apply_rope

        cos, sin = rope
        q = apply_rope(q, cos.astype(q.dtype), sin.astype(q.dtype))
        k = apply_rope(k, cos.astype(k.dtype), sin.astype(k.dtype))

    if use_flash and return_probs and probs_mode == "mean":
        from vitx.kernels.flash_attention import (
            flash_attention_with_mean_probs,
        )

        out, probs = flash_attention_with_mean_probs(q, k, v)
    elif use_flash and return_probs:
        from vitx.kernels.flash_attention import flash_attention_with_probs

        out, probs = flash_attention_with_probs(q, k, v)
    elif use_flash:
        from vitx.kernels.flash_attention import flash_attention

        out = flash_attention(q, k, v)
        probs = None
    else:
        out, probs = reference_attention(q, k, v, return_probs=return_probs,
                                         scale=scale)
        if probs is not None and probs_mode == "mean":
            probs = jnp.mean(probs, axis=1)

    # proj reads the (B, H, T, D) layout directly; XLA folds the transpose
    # into this matmul's input like it folded the one above into an output.
    out = jnp.einsum("bhtd,hdf->btf", out,
                     wo.astype(x.dtype).reshape(H, D, E),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bo is not None:
        out = out + bo.astype(x.dtype)
    return out, probs
