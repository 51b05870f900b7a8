"""Metrics parity vs sklearn (the reference's metric oracle, train.py:10,39-42:
accuracy_score, precision_score/recall_score(average='weighted',
zero_division=0.0))."""

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import accuracy_score, precision_score, recall_score

from vitx.metrics import (
    accuracy,
    confusion_matrix,
    confusion_to_metrics,
    per_class_accuracy,
    weighted_precision,
    weighted_recall,
)


def _case(seed, n=257, num_classes=7, skew=False):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=n)
    if skew:
        # leave some classes unpredicted / absent to exercise zero_division
        preds = rng.integers(0, max(2, num_classes // 2), size=n)
    else:
        preds = rng.integers(0, num_classes, size=n)
    return preds, labels, num_classes


def test_confusion_matrix_counts():
    preds, labels, C = _case(0)
    cm = np.asarray(confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), C))
    assert cm.sum() == len(preds)
    for t in range(C):
        for p in range(C):
            assert cm[t, p] == np.sum((labels == t) & (preds == p))


def test_sklearn_parity():
    for seed in range(5):
        for skew in (False, True):
            preds, labels, C = _case(seed, skew=skew)
            cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), C)
            np.testing.assert_allclose(
                float(accuracy(cm)), accuracy_score(labels, preds), rtol=1e-6)
            np.testing.assert_allclose(
                float(weighted_precision(cm)),
                precision_score(labels, preds, average="weighted",
                                zero_division=0.0),
                rtol=1e-6)
            np.testing.assert_allclose(
                float(weighted_recall(cm)),
                recall_score(labels, preds, average="weighted",
                             zero_division=0.0),
                rtol=1e-6)


def test_per_class_accuracy():
    preds = jnp.asarray(np.array([0, 0, 1, 1, 2, 2]))
    labels = jnp.asarray(np.array([0, 1, 1, 1, 0, 2]))
    cm = confusion_matrix(preds, labels, 4)
    pca = np.asarray(per_class_accuracy(cm))
    np.testing.assert_allclose(pca, [0.5, 2 / 3, 1.0, 0.0], rtol=1e-6)


def test_confusion_to_metrics_keys():
    preds, labels, C = _case(3)
    m = confusion_to_metrics(
        confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), C))
    assert set(m) == {"accuracy", "precision_weighted", "recall_weighted",
                      "per_class_accuracy", "per_class_f1", "f1_macro"}
    assert m["per_class_accuracy"].shape == (C,)
    assert m["per_class_f1"].shape == (C,)


def test_f1_sklearn_parity():
    """per-class F1 and macro F1 match sklearn (zero_division=0, all-labels
    averaging) on an imbalanced prediction set with an absent class."""
    from sklearn.metrics import f1_score

    from vitx.metrics import confusion_matrix, macro_f1, per_class_f1

    rng = np.random.default_rng(3)
    labels = rng.integers(0, 3, 200)          # class 3 absent from y_true
    preds = np.where(rng.random(200) < 0.3,
                     rng.integers(0, 4, 200), labels)
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 4)
    ours_pc = np.asarray(per_class_f1(cm))
    want_pc = f1_score(labels, preds, labels=range(4), average=None,
                       zero_division=0)
    np.testing.assert_allclose(ours_pc, want_pc, rtol=1e-6, atol=1e-7)
    want_macro = f1_score(labels, preds, labels=range(4), average="macro",
                          zero_division=0)
    np.testing.assert_allclose(float(macro_f1(cm)), want_macro,
                               rtol=1e-6, atol=1e-7)


def test_eval_cli_reports_f1_and_confusion(tmp_path, capsys):
    """The eval report carries f1_macro, per-class F1 and (small label
    spaces) the full confusion matrix, consistent with each other."""
    import json

    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main(["--preset", "tiny", "--data", "synthetic", "--epochs", "1",
                "--batch-size", "32", "--compute-dtype", "float32",
                "--checkpoint-dir", str(tmp_path / "c")])
    capsys.readouterr()
    rc = eval_main(["--checkpoint", str(tmp_path / "c"),
                    "--data", "synthetic", "--batch-size", "64"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["f1_macro"] <= 1.0
    assert len(out["per_class_f1"]) == 4
    cm = np.asarray(out["confusion_matrix"])
    assert cm.shape == (4, 4)
    assert cm.sum() == out["num_examples"]
    np.testing.assert_allclose(np.trace(cm) / cm.sum(), out["accuracy"],
                               atol=1e-6)
