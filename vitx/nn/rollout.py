"""Attention rollout — the attention-map analysis API.

The reference exposes raw per-head attention weights via the
``attention_probs`` attribute stash (``src/VisionTransformer/
transformer.py:39,48``) and its notebook visualizes them
(``src/vit.ipynb``, README.md:37-39). BASELINE.json config 5 asks for
attention-rollout extraction; this implements the standard rollout
(average heads, add identity for the residual path, renormalize, chain
matrix products through the layers) on-device.
"""

from __future__ import annotations

import jax.numpy as jnp


def attention_rollout(attn_probs, *, head_fusion: str = "mean",
                      num_prefix_tokens: int = 1, num_registers: int = 0):
    """Chain per-layer attention into an input-attribution map.

    Args:
      attn_probs: (depth, B, H, T, T) attention probabilities as returned by
        ``forward_with_attn``, or already-head-fused (depth, B, T, T) from
        ``forward_with_attn(..., probs_mode="mean")``.
      head_fusion: "mean" | "max" | "min" across heads (ignored for 4-D
        pre-fused input).
      num_prefix_tokens: special tokens before the patches — 1 (CLS) for
        plain ViTs, 2 for distill-token models (cfg.num_prefix_tokens).
      num_registers: register tokens trailing the patches
        (cfg.num_registers); their columns are dropped like the prefix.

    Returns:
      (B, N) rollout weights of the CLS token over the N patch tokens,
      normalized to sum to 1 per image.
    """
    if attn_probs.ndim == 4:          # already head-fused (probs_mode="mean")
        fused = attn_probs
    elif head_fusion == "mean":
        fused = jnp.mean(attn_probs, axis=2)
    elif head_fusion == "max":
        fused = jnp.max(attn_probs, axis=2)
    elif head_fusion == "min":
        fused = jnp.min(attn_probs, axis=2)
    else:
        raise ValueError(f"unknown head_fusion {head_fusion!r}")

    depth, B, T, _ = fused.shape
    eye = jnp.eye(T, dtype=fused.dtype)
    # residual connection: half attention, half identity; rows renormalized
    aug = 0.5 * fused + 0.5 * eye
    aug = aug / jnp.sum(aug, axis=-1, keepdims=True)

    rollout = aug[0]
    for layer in range(1, depth):
        rollout = jnp.einsum("bij,bjk->bik", aug[layer], rollout)

    # CLS row, patch cols (registers, when present, trail the patches)
    end = T - num_registers
    cls_to_patches = rollout[:, 0, num_prefix_tokens:end]
    denom = jnp.sum(cls_to_patches, axis=-1, keepdims=True)
    return cls_to_patches / jnp.maximum(denom, 1e-12)


def rollout_heatmap(rollout_weights, grid_size: int):
    """(B, N) rollout weights -> (B, grid, grid) heatmap."""
    B = rollout_weights.shape[0]
    return rollout_weights.reshape(B, grid_size, grid_size)
