"""Uniform model soup (Wortsman et al. 2022): averaging the weights of
same-geometry fine-tunes at inference time. vitx exposes it as
``eval --soup`` over the whole artifact surface (checkpoint dirs, .ckpt,
.quant.npz, reference .pt)."""

import json

import jax
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.train.checkpoint import (load_artifact_params, save_checkpoint,
                                   soup_params)
from vitx.train.step import create_train_state, make_optimizer

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")


def _ckpt(tmp_path, name, seed):
    state = create_train_state(jax.random.PRNGKey(seed), CFG,
                               make_optimizer(lr=1e-3))
    d = tmp_path / name
    save_checkpoint(d, state, 0,
                    meta={"config": json.loads(CFG.to_json())})
    return d, state.params


def test_soup_is_the_elementwise_mean(tmp_path):
    d1, p1 = _ckpt(tmp_path, "a", seed=1)
    d2, p2 = _ckpt(tmp_path, "b", seed=2)
    base, _ = load_artifact_params(d1, CFG)
    souped = soup_params(base, CFG, [str(d2)])
    np.testing.assert_allclose(
        np.asarray(souped["cls_token"]),
        0.5 * (np.asarray(p1["cls_token"]) + np.asarray(p2["cls_token"])),
        rtol=1e-6)
    w = "patch_embed"
    np.testing.assert_allclose(
        np.asarray(souped[w]["kernel"]),
        0.5 * (np.asarray(p1[w]["kernel"]) + np.asarray(p2[w]["kernel"])),
        rtol=1e-6)
    # dtype preserved
    assert souped["cls_token"].dtype == np.asarray(p1["cls_token"]).dtype


def test_soup_with_itself_is_identity(tmp_path):
    d1, p1 = _ckpt(tmp_path, "a", seed=1)
    base, _ = load_artifact_params(d1, CFG)
    souped = soup_params(base, CFG, [str(d1), str(d1)])
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(souped),
            jax.tree_util.tree_leaves_with_path(base)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(kp))


def test_soup_rejects_mismatched_geometry(tmp_path):
    d1, _ = _ckpt(tmp_path, "a", seed=1)
    other_cfg = CFG.replace(embed_dim=64, num_heads=4)
    state = create_train_state(jax.random.PRNGKey(3), other_cfg,
                               make_optimizer(lr=1e-3))
    d2 = tmp_path / "wide"
    save_checkpoint(d2, state, 0,
                    meta={"config": json.loads(other_cfg.to_json())})
    base, _ = load_artifact_params(d1, CFG)
    with pytest.raises(ValueError, match="geometry"):
        soup_params(base, CFG, [str(d2)])


def test_cli_eval_soup(tmp_path, capsys):
    """e2e: two 1-epoch runs from different seeds, souped eval reports
    finite accuracy and exports capture the averaged weights."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    for name, seed in (("r1", "0"), ("r2", "7")):
        rc = train_main([
            "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
            "--batch-size", "16", "--lr", "1e-3", "--seed", seed,
            "--checkpoint-dir", str(tmp_path / name),
            "--compute-dtype", "float32",
        ])
        assert rc == 0
    capsys.readouterr()
    rc = eval_main(["--preset", "tiny", "--data", "synthetic",
                    "--batch-size", "16",
                    "--checkpoint", str(tmp_path / "r1"),
                    "--soup", str(tmp_path / "r2"),
                    "--export-quantized",
                    str(tmp_path / "soup.quant.npz")])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(report["accuracy"])

    # the exported artifact holds the SOUP, not r1: its dequantized
    # head bias (exact under int8: biases are not quantized) must match
    # the elementwise mean of the two runs
    from vitx.core.config import get_config
    from vitx.train.checkpoint import resolve_artifact_config

    cfg = resolve_artifact_config(str(tmp_path / "r1"), None, "tiny")
    p1, _ = load_artifact_params(str(tmp_path / "r1"), cfg)
    p2, _ = load_artifact_params(str(tmp_path / "r2"), cfg)
    ps, _ = load_artifact_params(str(tmp_path / "soup.quant.npz"), cfg)
    np.testing.assert_allclose(
        np.asarray(ps["head"]["b2"]),
        0.5 * (np.asarray(p1["head"]["b2"]) + np.asarray(p2["head"]["b2"])),
        rtol=1e-5, atol=1e-7)
