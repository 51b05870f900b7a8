"""Class-specific saliency for ViT classifiers (Grad-CAM over token features).

Attention rollout (vitx/nn/rollout.py — the reference's ``src/vit.ipynb``
visualization) is class-AGNOSTIC: it shows where the CLS token looked, not
what drove a particular class's logit. This module adds the class-specific
counterpart: Grad-CAM (Selvaraju et al. 2017) adapted to ViT.

The target features are the tokens ENTERING THE LAST BLOCK (the standard
ViT adaptation): the classifier head reads only the CLS token, so gradients
w.r.t. the encoder OUTPUT's patch tokens are identically zero — the last
block's attention is what routes patch evidence into CLS, and
differentiating through it yields the per-patch contributions. Gradients of
the chosen class logit w.r.t. those tokens are mean-pooled into per-channel
weights, then ReLU(weighted sum) over the patch tokens gives the heatmap.

One jittable function, no hooks (the torch implementations need forward
hooks; here the split point is an explicit value, so this is a plain
``jax.grad`` through the last block + head). Cost: one forward plus a
one-block backward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vitx.core.config import ViTConfig
from vitx.nn.layers import layer_norm
from vitx.nn.vit import (_append_registers, _encoder_block, _join_cls,
                         add_pos_embed, classify, classify_dist,
                         patch_embed, run_blocks)


def _embed(params, images, cfg: ViTConfig):
    """The pre-encoder part of ``encode``: patchify + CLS/DIST + pos embed
    + register tokens (deterministic — no dropout)."""
    tokens = patch_embed(params, images, cfg)
    B = tokens.shape[0]
    x = _join_cls(params, tokens, cfg, B)
    x = add_pos_embed(params, x, cfg)
    return _append_registers(params, x, cfg, B)


def _last_block_params(params, cfg: ViTConfig):
    """The last encoder block's (unstacked) params — the trailing MoE block
    for MoE models (vitx/nn/moe.py), else the last dense block."""
    stack = (params["moe_blocks"] if cfg.moe_experts else params["blocks"])
    return jax.tree_util.tree_map(lambda a: a[-1], stack)


def _logits_from_last_block_input(params, f, cfg: ViTConfig):
    """Tokens entering the last block -> fused classifier logits."""
    last_bp = _last_block_params(params, cfg)
    x, mlp_out, _ = _encoder_block(f, jnp.zeros_like(f), last_bp, cfg,
                                   rng=None, deterministic=True,
                                   return_probs=False)
    x = x + mlp_out
    if cfg.final_norm:
        fn = params["final_norm"]
        x = layer_norm(x, fn["scale"], fn["bias"], eps=cfg.layer_norm_eps)
    lg = classify(params, x, cfg)
    if cfg.distill_token:
        lg = 0.5 * (lg + classify_dist(params, x, cfg))
    return lg


def grad_cam(params, images, cfg: ViTConfig, *, class_idx=None):
    """Images (B, H, W, C) -> (heatmap (B, num_patches) fp32, logits).

    ``class_idx``: int, (B,) int array, or None (= each sample's argmax
    class). The heatmap is non-negative (ReLU of the channel-weighted token
    activations) in patch-raster order — reshape to (grid, grid) to
    overlay. Always runs the full-token encoder (no ToMe merging), so with
    ``cfg.distill_token`` the returned logits equal ``forward``'s DeiT
    head fusion.
    """
    x0 = _embed(params, images, cfg)
    B = x0.shape[0]
    # blocks 0..L-2 (a length-(L-1) scan; empty and fine at depth == 1),
    # resolving the pending residual so f IS the last block's input
    if cfg.moe_experts:
        km = cfg.moe_block_count
        f, _ = run_blocks(params["blocks"], x0, cfg,
                          depth=cfg.dense_block_count)
        if km > 1:
            moe_head = jax.tree_util.tree_map(lambda a: a[:-1],
                                              params["moe_blocks"])
            f, _ = run_blocks(moe_head, f, cfg, depth=km - 1)
    else:
        head_blocks = jax.tree_util.tree_map(lambda a: a[:-1],
                                             params["blocks"])
        f, _ = run_blocks(head_blocks, x0, cfg)

    logits = _logits_from_last_block_input(params, f, cfg)
    if class_idx is None:
        idx = jnp.argmax(logits, axis=-1)
    else:
        import numpy as np

        # concrete indices validate host-side (take_along_axis clamps
        # out-of-bounds under jit instead of erroring — a silent wrong-
        # class heatmap otherwise); traced arrays pass through
        concrete = np.asarray(class_idx) if isinstance(
            class_idx, (int, np.integer, list, tuple, np.ndarray)) else None
        if concrete is not None and (np.any(concrete < 0) or
                                     np.any(concrete >= cfg.num_classes)):
            raise ValueError(f"class_idx {class_idx} out of range "
                             f"[0, {cfg.num_classes})")
        idx = jnp.broadcast_to(jnp.asarray(class_idx, jnp.int32), (B,))

    def scalar_fn(tokens):
        lg = _logits_from_last_block_input(params, tokens, cfg)
        return jnp.sum(jnp.take_along_axis(lg, idx[:, None], axis=1))

    grads = jax.grad(scalar_fn)(f)                       # (B, T, E)
    # patch-token slice: bug_exact keeps the reference layout (patches
    # first, CLS appended — vit.py:41); corrected prepends CLS (+DIST),
    # registers sit at the tail and are excluded either way
    s = 0 if cfg.parity == "bug_exact" else cfg.num_prefix_tokens
    g = grads[:, s:s + cfg.num_patches].astype(jnp.float32)
    fp = f[:, s:s + cfg.num_patches].astype(jnp.float32)
    weights = jnp.mean(g, axis=1, keepdims=True)         # (B, 1, E)
    cam = jnp.maximum(jnp.sum(weights * fp, axis=-1), 0.0)
    return cam, logits
