"""Config-composition sweep: every model variant knob must compose with the
full inference surface (forward, feature extraction, Grad-CAM, rollout).

Single-purpose tests pin each feature's semantics; this sweep pins that the
COMBINATIONS keep working as the config space grows (the class of bug where
a new token kind or stem silently breaks an older instrumentation path).
"""

import jax
import numpy as np
import pytest

from vitx import (ViTConfig, forward, forward_features, forward_with_rollout,
                  grad_cam, init_params)

BASE = dict(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
            depth=2, num_heads=2, compute_dtype="float32")

VARIANTS = {
    "base": {},
    "registers": {"num_registers": 2},
    "distill": {"distill_token": True},
    "conv_stem": {"stem": "conv"},
    "reference_head": {"head_type": "reference"},
    "bug_exact": {"parity": "bug_exact"},
    "final_norm": {"final_norm": True},
    "gelu_tanh": {"mlp_act": "gelu_tanh"},
    "drop_path": {"drop_path": 0.1},
    "registers+distill+final_norm": {"num_registers": 2,
                                     "distill_token": True,
                                     "final_norm": True},
    "moe": {"moe_experts": 2, "moe_blocks": 1},
    "moe+registers+final_norm": {"moe_experts": 2, "moe_blocks": 1,
                                 "num_registers": 2, "final_norm": True},
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_inference_surface_composes(name):
    cfg = ViTConfig(**BASE, **VARIANTS[name])
    params = init_params(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (2, cfg.image_size, cfg.image_size, 3))

    logits = np.asarray(forward(params, imgs, cfg))
    assert logits.shape == (2, cfg.num_classes)
    assert np.all(np.isfinite(logits))

    for pool in ("cls", "gap"):
        f = np.asarray(forward_features(params, imgs, cfg, pool=pool))
        assert f.shape == (2, cfg.embed_dim) and np.all(np.isfinite(f))

    cam, cam_logits = grad_cam(params, imgs, cfg)
    assert np.asarray(cam).shape == (2, cfg.num_patches)
    assert np.all(np.isfinite(np.asarray(cam)))
    assert np.all(np.asarray(cam) >= 0.0)
    np.testing.assert_allclose(np.asarray(cam_logits), logits,
                               rtol=0, atol=1e-5)

    if cfg.parity != "bug_exact":
        lg_r, roll = forward_with_rollout(params, imgs, cfg)
        assert np.asarray(roll).shape == (2, cfg.num_patches)
        assert np.all(np.isfinite(np.asarray(roll)))
        np.testing.assert_allclose(np.asarray(lg_r), logits,
                                   rtol=0, atol=1e-5)
