"""Grad-CAM saliency tests (vitx/nn/saliency.py).

Class-specific explainability — the counterpart to the class-agnostic
attention rollout the reference's notebook visualizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx import ViTConfig, forward, grad_cam, init_params

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")


def _images(seed, batch=3, cfg=CFG):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (batch, cfg.image_size, cfg.image_size, 3))


def test_grad_cam_shapes_and_default_class():
    """Heatmap is (B, num_patches), non-negative fp32; the returned logits
    equal forward's; class_idx=None equals passing each sample's argmax."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    imgs = _images(1)
    cam, logits = grad_cam(params, imgs, CFG)
    assert cam.shape == (3, CFG.num_patches) and cam.dtype == jnp.float32
    assert np.all(np.asarray(cam) >= 0.0)
    assert np.any(np.asarray(cam) > 0.0)   # gradients reach the patches
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(forward(params, imgs, CFG)),
                               rtol=0, atol=1e-5)
    idx = np.argmax(np.asarray(logits), axis=-1)
    cam_explicit, _ = grad_cam(params, imgs, CFG, class_idx=idx)
    np.testing.assert_allclose(np.asarray(cam), np.asarray(cam_explicit),
                               rtol=0, atol=1e-6)


def test_grad_cam_is_class_specific():
    """Different target classes give different heatmaps (rollout cannot)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    imgs = _images(2, batch=2)
    cam0, _ = grad_cam(params, imgs, CFG, class_idx=0)
    cam1, _ = grad_cam(params, imgs, CFG, class_idx=1)
    assert not np.allclose(np.asarray(cam0), np.asarray(cam1), atol=1e-6)


def test_grad_cam_excludes_special_tokens():
    """Register tokens and the distill token never appear in the heatmap
    (length stays num_patches) and the distill config's logits match the
    DeiT-fused forward."""
    cfg = CFG.replace(num_registers=2, distill_token=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    imgs = _images(3, cfg=cfg)
    cam, logits = grad_cam(params, imgs, cfg)
    assert cam.shape == (3, cfg.num_patches)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(forward(params, imgs, cfg)),
                               rtol=0, atol=1e-5)


def test_grad_cam_bug_exact_layout():
    """bug_exact parity slices the patch tokens from the front (reference
    layout: patches first, CLS appended)."""
    cfg = CFG.replace(parity="bug_exact")
    params = init_params(jax.random.PRNGKey(0), cfg)
    imgs = _images(4, batch=1, cfg=cfg)
    cam, _ = grad_cam(params, imgs, cfg)
    assert cam.shape == (1, cfg.num_patches)
    assert np.all(np.isfinite(np.asarray(cam)))


def test_grad_cam_jits():
    params = init_params(jax.random.PRNGKey(0), CFG)
    imgs = _images(5)
    jitted = jax.jit(lambda p, x: grad_cam(p, x, CFG))
    cam_j, _ = jitted(params, imgs)
    cam_e, _ = grad_cam(params, imgs, CFG)
    np.testing.assert_allclose(np.asarray(cam_j), np.asarray(cam_e),
                               rtol=0, atol=1e-5)


def test_grad_cam_rejects_out_of_range_class():
    params = init_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="out of range"):
        grad_cam(params, _images(6, batch=1), CFG, class_idx=99)
    with pytest.raises(ValueError, match="out of range"):
        grad_cam(params, _images(6, batch=1), CFG, class_idx=-1)
