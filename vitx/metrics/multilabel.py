"""Multi-label evaluation metrics (host-side, sklearn-parity).

Ranking metrics (average precision) need the FULL score array sorted per
class, which has no cheap on-device streaming form — so multi-label eval
gathers (scores, targets) to host per batch (eval only; the training loss
stays fully on device). Pinned against sklearn in
tests/test_multilabel.py.
"""

from __future__ import annotations

import numpy as np


def _average_precision(scores, targets) -> float:
    """AP for one class — sklearn ``average_precision_score`` semantics
    (step-wise interpolation-free sum of P(k) * dR(k))."""
    order = np.argsort(-scores, kind="stable")
    t = targets[order]
    tp = np.cumsum(t)
    precision = tp / np.arange(1, len(t) + 1)
    n_pos = t.sum()
    if n_pos == 0:
        return float("nan")
    return float(np.sum(precision * t) / n_pos)


def multilabel_metrics(scores, targets, threshold: float = 0.0) -> dict:
    """scores: (N, C) logits (threshold 0.0 == probability 0.5); targets:
    (N, C) multi-hot. Returns micro/macro F1 at the threshold, mAP (macro
    over classes that have at least one positive — sklearn's AP is NaN for
    empty classes), and element accuracy."""
    scores = np.asarray(scores, np.float32)
    targets = np.asarray(targets) > 0.5
    pred = scores > threshold

    tp = (pred & targets).sum(axis=0).astype(np.float64)
    fp = (pred & ~targets).sum(axis=0).astype(np.float64)
    fn = (~pred & targets).sum(axis=0).astype(np.float64)

    def f1(tp, fp, fn):
        denom = 2 * tp + fp + fn
        return np.where(denom > 0, 2 * tp / np.maximum(denom, 1e-12), 0.0)

    f1_per_class = f1(tp, fp, fn)
    micro = float(f1(tp.sum(), fp.sum(), fn.sum()))
    aps = np.array([_average_precision(scores[:, c], targets[:, c])
                    for c in range(scores.shape[1])])
    have_pos = ~np.isnan(aps)
    return {
        "f1_micro": micro,
        "f1_macro": float(f1_per_class.mean()),
        "f1_per_class": f1_per_class,
        "mAP": float(aps[have_pos].mean()) if have_pos.any() else 0.0,
        "average_precision_per_class": aps,
        "accuracy": float((pred == targets).mean()),
        "num_examples": int(scores.shape[0]),
    }
