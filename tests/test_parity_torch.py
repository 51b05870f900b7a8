"""Logit parity vs the corrected PyTorch reference (BASELINE.md target:
<= 1e-4 relative error, fp32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vitx import ViTConfig, forward, forward_with_attn

from tests.torch_reference import TorchViT, export_to_vitx


def _parity_case(image_size, patch_size, embed_dim, depth, num_heads,
                 num_classes=10, batch=2, seed=0):
    torch.manual_seed(seed)
    model = TorchViT(
        image_size=image_size, patch_size=patch_size, num_channels=3,
        num_classes=num_classes, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads,
    ).eval()

    cfg = ViTConfig(
        image_size=image_size, patch_size=patch_size, num_channels=3,
        num_classes=num_classes, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, mlp_act="relu", head_type="reference",
        final_norm=False, qkv_bias=False, dropout=0.0,
        compute_dtype="float32",
    )
    params = jax.tree.map(jnp.asarray,
                          export_to_vitx(model, patch_size, num_heads))

    x_nchw = torch.randn(batch, 3, image_size, image_size)
    with torch.no_grad():
        ref_logits = model(x_nchw).numpy()

    x_nhwc = jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))
    return model, cfg, params, x_nhwc, ref_logits


def _rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)


@pytest.mark.parametrize(
    "image_size,patch_size,embed_dim,depth,num_heads",
    [
        (32, 8, 16, 2, 2),       # micro
        (64, 8, 64, 4, 4),       # ViT-Tiny shape (BASELINE config 1)
        (256, 16, 8, 8, 8),      # the reference notebook config (BASELINE.md)
    ],
)
def test_logit_parity(image_size, patch_size, embed_dim, depth, num_heads):
    _, cfg, params, x, ref_logits = _parity_case(
        image_size, patch_size, embed_dim, depth, num_heads, num_classes=10)
    logits = np.asarray(forward(params, x, cfg))
    assert _rel_err(logits, ref_logits) < 1e-4, _rel_err(logits, ref_logits)


def test_attention_probs_parity():
    """Per-head attention probabilities match the torch reference stash
    (the attention_probs API, reference transformer.py:39,48)."""
    model, cfg, params, x, _ = _parity_case(32, 8, 16, 2, 2)
    with torch.no_grad():
        model(torch.asarray(np.asarray(x).transpose(0, 3, 1, 2)))
    ref_probs = np.stack([blk.attn.attention_probs.numpy()
                          for blk in model.blocks])   # (L, B, H, T, T)
    _, probs = forward_with_attn(params, x, cfg)
    np.testing.assert_allclose(np.asarray(probs), ref_probs,
                               rtol=1e-4, atol=1e-6)


def test_bf16_close_to_fp32():
    """bf16 compute path stays within loose tolerance of fp32 logits."""
    _, cfg, params, x, ref_logits = _parity_case(64, 8, 64, 4, 4,
                                                 num_classes=10)
    bf16_logits = np.asarray(forward(params, x, cfg.replace(
        compute_dtype="bfloat16")))
    assert _rel_err(bf16_logits, ref_logits) < 0.05
