"""Patch dropout (Liu et al. 2022 "PatchDropout"; FLIP, Li et al. 2023):
during training each sample keeps a random STATIC-count subset of its patch
tokens, cutting encoder FLOPs (attention quadratically) with negligible
accuracy cost. Inference always runs the full token set — a pure training
accelerator, unlike ToMe (inference-side merging)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.nn.vit import _patch_drop, encode, forward, init_params

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32",
                patch_drop=0.5)


def _images(B=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (B, CFG.image_size, CFG.image_size, 3))


def test_keep_count_and_validation():
    assert CFG.num_patches == 16 and CFG.patch_keep_count == 8
    # floor semantics: N - floor(N * p)
    assert CFG.replace(patch_drop=0.3).patch_keep_count == 16 - 4
    assert CFG.replace(patch_drop=0.0).patch_keep_count == 16
    with pytest.raises(ValueError, match="patch_drop"):
        CFG.replace(patch_drop=1.0)
    with pytest.raises(ValueError, match="patch_drop"):
        CFG.replace(patch_drop=-0.1)
    with pytest.raises(ValueError, match="patch_drop"):
        ViTConfig(image_size=16, patch_size=4, patch_drop=0.5,
                  parity="bug_exact")


def test_training_encode_runs_reduced_tokens():
    """Non-deterministic encode sees prefix + kept patches (+ registers);
    deterministic encode keeps the full sequence."""
    cfg = CFG.replace(num_registers=2, dropout=0.1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x, _ = encode(params, _images(), cfg, rng=jax.random.PRNGKey(1),
                  deterministic=False)
    assert x.shape == (3, cfg.num_prefix_tokens + cfg.patch_keep_count + 2,
                       cfg.embed_dim)
    x_full, _ = encode(params, _images(), cfg)
    assert x_full.shape == (3, cfg.seq_len, cfg.embed_dim)


def test_inference_identical_to_patch_drop_zero():
    """patch_drop only changes training: deterministic forward is bit-equal
    to the same params under patch_drop=0."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    a = np.asarray(forward(params, _images(), CFG))
    b = np.asarray(forward(params, _images(), CFG.replace(patch_drop=0.0)))
    np.testing.assert_array_equal(a, b)


def test_kept_tokens_are_an_ordered_subset():
    """_patch_drop passes prefix/register tokens through and selects an
    index-ascending subset of the patch tokens, per row independently."""
    cfg = CFG.replace(num_registers=2)
    p, n, keep = cfg.num_prefix_tokens, cfg.num_patches, cfg.patch_keep_count
    B, T = 4, p + n + 2
    # token t of row b carries the value 1000*b + t in every channel
    vals = (1000 * jnp.arange(B)[:, None] + jnp.arange(T)[None, :])
    x = jnp.broadcast_to(vals[:, :, None], (B, T, cfg.embed_dim)).astype(
        jnp.float32)
    out = np.asarray(_patch_drop(x, cfg, jax.random.PRNGKey(3)))
    assert out.shape == (B, p + keep + 2, cfg.embed_dim)
    np.testing.assert_array_equal(out[:, :p], np.asarray(x[:, :p]))
    np.testing.assert_array_equal(out[:, p + keep:], np.asarray(x[:, p + n:]))
    ids = out[:, p:p + keep, 0] - 1000 * np.arange(B)[:, None]
    for b in range(B):
        row = ids[b]
        assert (np.diff(row) > 0).all(), "kept patch order must be ascending"
        assert set(row.astype(int)) <= set(range(p, p + n))
    # rows select independently: at 16-choose-8 per row, 4 identical rows
    # would be astronomically unlikely
    assert any(not np.array_equal(ids[0], ids[b]) for b in range(1, B))


def test_patch_drop_trains_and_steps_vary():
    """A patch-drop model overfits a batch; different steps drop different
    patches (the fold_in(step) rng reaches _patch_drop)."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    cfg = CFG.replace(patch_drop=0.25)
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = {"image": _images(B=8, seed=5),
             "label": jax.random.randint(jax.random.PRNGKey(6), (8,), 0, 4)}
    first = None
    losses = []
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
        first = losses[0] if first is None else first
    assert losses[-1] < first * 0.3
    # consecutive steps see different token subsets -> non-identical losses
    assert len({round(v, 9) for v in losses[:5]}) > 1


def test_cli_train_patch_drop(tmp_path, capsys):
    """e2e: --patch-drop trains, checkpoints record it, eval (full tokens)
    restores cleanly."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main

    rc = main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3", "--patch-drop", "0.5",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["loss"])
    rc = eval_main(["--preset", "tiny", "--data", "synthetic",
                    "--batch-size", "16",
                    "--checkpoint", str(tmp_path / "c")])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(report["accuracy"])
