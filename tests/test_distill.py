"""Knowledge-distillation tests (vitx/train/distill.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitx import get_config, init_params
from vitx.core.config import ViTConfig
from vitx.train import create_train_state
from vitx.train.distill import (distill_loss, make_distill_train_step)
from vitx.train.step import cross_entropy_loss, make_optimizer

TEACHER_CFG = get_config("tiny", compute_dtype="float32")
STUDENT_CFG = ViTConfig(image_size=64, patch_size=8, num_classes=4,
                        embed_dim=32, depth=2, num_heads=2,
                        compute_dtype="float32")


def test_distill_loss_limits():
    """alpha=0 is plain CE; soft KD with an identical teacher is ~0;
    tau scaling is applied."""
    k = jax.random.PRNGKey(0)
    logits = jax.random.normal(k, (8, 4))
    labels = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])

    ce = cross_entropy_loss(logits, labels)
    np.testing.assert_allclose(
        float(distill_loss(logits, logits, labels, alpha=0.0)), float(ce),
        rtol=1e-6)
    # teacher == student -> KL term vanishes
    np.testing.assert_allclose(
        float(distill_loss(logits, logits, labels, alpha=1.0)), 0.0,
        atol=1e-6)
    # hard distillation vs a disagreeing teacher is positive
    other = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    assert float(distill_loss(logits, other, labels, alpha=1.0,
                              hard=True)) > 0.1


def test_student_learns_teacher():
    """A student distilled from a frozen random teacher (alpha=1) comes to
    agree with it on the training batch."""
    opt = make_optimizer(lr=3e-3)
    teacher_params = init_params(jax.random.PRNGKey(0), TEACHER_CFG)
    state = create_train_state(jax.random.PRNGKey(1), STUDENT_CFG, opt)
    step = make_distill_train_step(STUDENT_CFG, TEACHER_CFG, opt,
                                   alpha=1.0, tau=2.0)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (16, 64, 64, 3))
    labels = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4)
    batch = {"image": imgs, "label": labels}

    first = None
    for _ in range(60):
        state, m = step(state, batch, teacher_params, None)
        if first is None:
            first = m
    assert float(m["loss"]) < float(first["loss"]) * 0.5
    assert float(m["teacher_agreement"]) > float(first["teacher_agreement"])
    assert float(m["teacher_agreement"]) >= 0.75


def test_distill_step_with_mask_and_hard():
    """Padded rows are excluded; hard mode runs and is finite."""
    opt = make_optimizer(lr=1e-3)
    teacher_params = init_params(jax.random.PRNGKey(0), TEACHER_CFG)
    state = create_train_state(jax.random.PRNGKey(1), STUDENT_CFG, opt)
    step = make_distill_train_step(STUDENT_CFG, TEACHER_CFG, opt,
                                   alpha=0.5, hard=True)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (8, 64, 64, 3))
    labels = jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 4)
    mask = jnp.array([1, 1, 1, 1, 1, 1, 0, 0], jnp.int32)
    state, m = step(state, {"image": imgs, "label": labels, "mask": mask},
                    teacher_params, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["teacher_agreement"]) <= 1.0


def test_distill_token_forward_semantics():
    """distill_token=True: T = patches + 2, both heads exist, forward is the
    DeiT eval-time head average, and rollout weights cover the patches."""
    from vitx import forward, forward_heads, forward_with_rollout
    from vitx.nn.vit import classify_dist

    cfg = ViTConfig(image_size=64, patch_size=8, num_classes=4,
                    embed_dim=32, depth=2, num_heads=2,
                    compute_dtype="float32", distill_token=True)
    assert cfg.seq_len == cfg.num_patches + 2
    assert cfg.num_prefix_tokens == 2
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "dist_token" in params and "dist_head" in params
    assert params["pos_embed"].shape[1] == cfg.seq_len

    imgs = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 64, 3))
    cls_logits, dist_logits = forward_heads(params, imgs, cfg)
    assert cls_logits.shape == dist_logits.shape == (3, 4)
    # dist head starts zero-init -> uniform logits, different from cls head
    fused = forward(params, imgs, cfg)
    np.testing.assert_allclose(np.asarray(fused),
                               0.5 * (np.asarray(cls_logits)
                                      + np.asarray(dist_logits)),
                               rtol=1e-5, atol=1e-5)

    logits_r, weights = forward_with_rollout(params, imgs, cfg)
    assert weights.shape == (3, cfg.num_patches)
    np.testing.assert_allclose(np.asarray(weights).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_r), np.asarray(fused),
                               rtol=2e-4, atol=2e-4)

    # bug_exact parity cannot carry a distill token
    import pytest
    with pytest.raises(ValueError, match="distill_token"):
        ViTConfig(image_size=64, patch_size=8, num_classes=4, embed_dim=32,
                  depth=2, num_heads=2, parity="bug_exact",
                  distill_token=True)


def test_distill_token_student_learns_teacher():
    """DeiT distillation-through-attention: the distill head (trained on the
    teacher term only) comes to agree with the teacher; CE trains the CLS
    head; inference averages both."""
    from vitx import forward_heads

    cfg = ViTConfig(image_size=64, patch_size=8, num_classes=4,
                    embed_dim=32, depth=2, num_heads=2,
                    compute_dtype="float32", distill_token=True)
    opt = make_optimizer(lr=3e-3)
    teacher_params = init_params(jax.random.PRNGKey(0), TEACHER_CFG)
    state = create_train_state(jax.random.PRNGKey(1), cfg, opt)
    step = make_distill_train_step(cfg, TEACHER_CFG, opt, alpha=0.5, tau=2.0)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (16, 64, 64, 3))
    labels = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4)
    batch = {"image": imgs, "label": labels}

    from vitx.nn.vit import forward as _fwd
    teacher_logits = _fwd(teacher_params, imgs, TEACHER_CFG)
    losses = []
    for _ in range(60):
        state, m = step(state, batch, teacher_params, None)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    cls_logits, dist_logits = forward_heads(state.params, imgs, cfg)
    dist_agree = np.mean(np.argmax(np.asarray(dist_logits), -1)
                         == np.argmax(np.asarray(teacher_logits), -1))
    cls_acc = np.mean(np.argmax(np.asarray(cls_logits), -1)
                      == np.asarray(labels))
    assert dist_agree >= 0.8      # distill head follows the teacher
    assert cls_acc >= 0.8         # CLS head follows the labels


def test_cli_distill_rejects_unsupported_recipe_flags(tmp_path, capsys):
    """--distill-from injects its own train step, which does not implement
    mixup/cutmix/SAM — the CLI must refuse loudly instead of silently
    dropping the flags."""
    from vitx.cli.train import main as train_main

    rc = train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--distill-from", str(tmp_path / "t"), "--sam-rho", "0.05",
    ])
    assert rc == 1
    assert "sam-rho" in capsys.readouterr().err
