from vitx.metrics.metrics import (
    accuracy,
    confusion_matrix,
    confusion_to_metrics,
    per_class_accuracy,
    weighted_precision,
    weighted_recall,
)

__all__ = [
    "accuracy",
    "confusion_matrix",
    "confusion_to_metrics",
    "per_class_accuracy",
    "weighted_precision",
    "weighted_recall",
]
