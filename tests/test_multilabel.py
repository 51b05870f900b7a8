"""Multi-label classification (--loss bce): sigmoid BCE training, multi-hot
synthetic dataset, sklearn-parity F1/mAP metrics, CLI e2e."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.metrics.multilabel import multilabel_metrics
from vitx.train.step import sigmoid_bce_loss

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=5, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")


def test_bce_loss_torch_parity():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 5)).astype(np.float32)
    targets = (rng.random((6, 5)) < 0.4).astype(np.float32)
    ours = float(sigmoid_bce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                             torch.tensor(targets)))
    # rtol 3e-5: fp32 log-sigmoid drift on TPU is 3e-6 plain and
    # 1.5e-5 on the masked reduction (chip round 4)
    np.testing.assert_allclose(ours, ref, rtol=3e-5)

    # masked rows excluded exactly
    mask = np.array([1, 1, 1, 1, 0, 0], np.int32)
    ours_m = float(sigmoid_bce_loss(jnp.asarray(logits),
                                    jnp.asarray(targets), jnp.asarray(mask)))
    ref_m = float(torch.nn.BCEWithLogitsLoss()(torch.tensor(logits[:4]),
                                               torch.tensor(targets[:4])))
    np.testing.assert_allclose(ours_m, ref_m, rtol=3e-5)


def test_metrics_sklearn_parity():
    from sklearn.metrics import average_precision_score, f1_score

    rng = np.random.default_rng(1)
    scores = rng.normal(size=(64, 5)).astype(np.float32)
    targets = (rng.random((64, 5)) < 0.35).astype(np.int32)
    targets[:, 4] = 0                      # one class with no positives
    m = multilabel_metrics(scores, targets)
    pred = (scores > 0).astype(np.int32)
    np.testing.assert_allclose(
        m["f1_micro"], f1_score(targets, pred, average="micro",
                                zero_division=0.0), rtol=1e-9)
    np.testing.assert_allclose(
        m["f1_macro"], f1_score(targets, pred, average="macro",
                                zero_division=0.0), rtol=1e-9)
    # mAP: macro over classes WITH positives, sklearn AP per class
    aps = [average_precision_score(targets[:, c], scores[:, c])
           for c in range(4)]
    np.testing.assert_allclose(m["mAP"], np.mean(aps), rtol=1e-9)
    assert np.isnan(m["average_precision_per_class"][4])


def test_multilabel_dataset_and_loader():
    from vitx.data import BatchLoader
    from vitx.data.synthetic import SyntheticMultiLabelDataset

    ds = SyntheticMultiLabelDataset(num_examples=33, image_size=16,
                                    num_classes=5, seed=0)
    img, hot = ds.get_example(0)
    assert img.shape == (16, 16, 3) and hot.shape == (5,)
    assert ds.labels.shape == (33, 5)
    assert (ds.labels.sum(axis=1) >= 1).all()       # at least one active
    assert (ds.labels.sum(axis=1) <= 3).all()
    batches = list(BatchLoader(ds, 16))
    assert batches[0]["label"].shape == (16, 5)
    last = batches[-1]                               # ragged: 33 % 16 == 1
    assert last["label"].shape == (16, 5)
    assert last["mask"].sum() == 1
    assert (last["label"][1:] == 0).all()            # padded rows zeroed


def test_bce_training_learns_multilabel():
    import optax

    from vitx.data import BatchLoader
    from vitx.data.synthetic import SyntheticMultiLabelDataset
    from vitx.nn.vit import forward
    from vitx.train.step import create_train_state, make_optimizer, \
        make_train_step

    ds = SyntheticMultiLabelDataset(num_examples=64, image_size=16,
                                    num_classes=5, seed=2, noise=0.1)
    batch = next(iter(BatchLoader(ds, 64)))
    batch = {"image": jnp.asarray(batch["image"], jnp.float32) / 255.0,
             "label": jnp.asarray(batch["label"])}
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt, loss="bce")
    m0 = None
    for i in range(600):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        if i == 0:
            m0 = m
    assert float(m["loss"]) < 0.5 * float(m0["loss"])
    logits = forward(state.params, batch["image"], CFG)
    rep = multilabel_metrics(np.asarray(logits), np.asarray(batch["label"]))
    assert rep["mAP"] > 0.9                          # overfits the batch
    assert rep["f1_micro"] > 0.8


def test_bce_rejects_single_label_knobs():
    from vitx.train.step import loss_fn

    params_batch_rng = None  # loss_fn validates kwargs before any compute
    with pytest.raises(ValueError, match="bce"):
        loss_fn(params_batch_rng, None, CFG, None, loss="bce",
                label_smoothing=0.1)
    with pytest.raises(ValueError, match="unknown loss"):
        loss_fn(params_batch_rng, None, CFG, None, loss="nope")


def test_cli_train_eval_multilabel_e2e(tmp_path, capsys):
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic-ml", "--loss", "bce",
        "--epochs", "2", "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    out = capsys.readouterr().out
    hist = json.loads(out.strip().splitlines()[-1])
    assert "val_mAP" in hist and 0.0 <= hist["val_mAP"] <= 1.0

    rc = eval_main(["--preset", "tiny", "--data", "synthetic-ml",
                    "--checkpoint", str(tmp_path / "c"),
                    "--batch-size", "48"])       # ragged final batch
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["num_examples"] == 512
    assert 0.0 <= report["mAP"] <= 1.0 and "f1_micro" in report
    # a 2-epoch tiny run separates the gratings well past chance
    assert report["mAP"] > 0.5

    rc = eval_main(["--preset", "tiny", "--data", "synthetic-ml",
                    "--checkpoint", str(tmp_path / "c"),
                    "--batch-size", "48", "--tta"])
    assert rc == 1                               # single-label-only surface
