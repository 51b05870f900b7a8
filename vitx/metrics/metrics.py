"""Classification metrics, sklearn-parity, computed on device.

The reference evaluates by shipping every batch to the host and calling
sklearn's ``accuracy_score`` / weighted ``precision_score`` / ``recall_score``
(``src/train.py:29-44``). Here the eval loop accumulates ONE confusion matrix
on device (a (C, C) int32 array summed with ``psum`` under data parallelism)
and derives every metric from it with a single host transfer at the end.

Semantics match sklearn with ``average='weighted', zero_division=0.0``
(train.py:42): test oracles in tests/test_metrics.py check this directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_matrix(preds, labels, num_classes: int):
    """(B,) int preds and labels -> (C, C) int32 counts, rows = true class."""
    idx = labels * num_classes + preds
    flat = jnp.zeros((num_classes * num_classes,), jnp.int32)
    flat = flat.at[idx].add(1)
    return flat.reshape(num_classes, num_classes)


def accuracy(cm):
    """Overall accuracy from a confusion matrix."""
    total = jnp.sum(cm)
    return jnp.where(total > 0, jnp.trace(cm) / total, 0.0)


def per_class_accuracy(cm):
    """Recall per class (diagonal / row sums); 0 where a class is absent.

    "Per-class accuracy" in the BASELINE.json north-star sense.
    """
    support = jnp.sum(cm, axis=1)
    diag = jnp.diagonal(cm)
    return jnp.where(support > 0, diag / jnp.maximum(support, 1), 0.0)


def weighted_precision(cm):
    """sklearn precision_score(average='weighted', zero_division=0)."""
    support = jnp.sum(cm, axis=1).astype(jnp.float32)       # true counts
    pred_count = jnp.sum(cm, axis=0).astype(jnp.float32)    # predicted counts
    diag = jnp.diagonal(cm).astype(jnp.float32)
    prec = jnp.where(pred_count > 0, diag / jnp.maximum(pred_count, 1.0), 0.0)
    total = jnp.sum(support)
    return jnp.where(total > 0, jnp.sum(prec * support) / total, 0.0)


def weighted_recall(cm):
    """sklearn recall_score(average='weighted', zero_division=0).

    Weighted recall over true-class support equals overall accuracy when
    every sample is counted once — kept as its own function for clarity and
    for parity tests against sklearn.
    """
    support = jnp.sum(cm, axis=1).astype(jnp.float32)
    diag = jnp.diagonal(cm).astype(jnp.float32)
    rec = jnp.where(support > 0, diag / jnp.maximum(support, 1.0), 0.0)
    total = jnp.sum(support)
    return jnp.where(total > 0, jnp.sum(rec * support) / total, 0.0)


def per_class_f1(cm):
    """F1 per class — sklearn f1_score(average=None, zero_division=0):
    0 where precision + recall is 0."""
    support = jnp.sum(cm, axis=1).astype(jnp.float32)
    pred_count = jnp.sum(cm, axis=0).astype(jnp.float32)
    diag = jnp.diagonal(cm).astype(jnp.float32)
    prec = jnp.where(pred_count > 0, diag / jnp.maximum(pred_count, 1.0), 0.0)
    rec = jnp.where(support > 0, diag / jnp.maximum(support, 1.0), 0.0)
    pr = prec + rec
    return jnp.where(pr > 0, 2.0 * prec * rec / jnp.maximum(pr, 1e-12), 0.0)


def macro_f1(cm):
    """sklearn f1_score(average='macro', labels=range(C), zero_division=0) —
    the unweighted class mean, the imbalanced-data headline metric."""
    return jnp.mean(per_class_f1(cm))


def confusion_to_metrics(cm):
    """Confusion matrix -> dict of scalar metrics (+ per-class vectors)."""
    return {
        "accuracy": accuracy(cm),
        "precision_weighted": weighted_precision(cm),
        "recall_weighted": weighted_recall(cm),
        "per_class_accuracy": per_class_accuracy(cm),
        "per_class_f1": per_class_f1(cm),
        "f1_macro": macro_f1(cm),
    }
