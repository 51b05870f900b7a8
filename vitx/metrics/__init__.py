from vitx.metrics.calibration import (
    calibration_report,
    expected_calibration_error,
    fit_temperature,
)
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
    "calibration_report",
    "confusion_matrix",
    "confusion_to_metrics",
    "expected_calibration_error",
    "fit_temperature",
    "per_class_accuracy",
    "weighted_precision",
    "weighted_recall",
]
