"""Calibration metrics (vitx/metrics/calibration.py, Guo 2017)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitx.metrics.calibration import (
    calibration_report,
    expected_calibration_error,
    fit_temperature,
)


def _well_calibrated_logits(key, n=4096, c=10):
    """Draw labels FROM the model's own softmax -> calibrated by
    construction."""
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (n, c)) * 2.0
    labels = jax.random.categorical(k2, logits)
    return logits, labels


def test_ece_detects_overconfidence():
    """Sharpening calibrated logits by 4x must raise ECE substantially;
    the calibrated set itself stays near zero."""
    logits, labels = _well_calibrated_logits(jax.random.PRNGKey(0))
    probs = jax.nn.softmax(logits, axis=-1)
    ece_cal = float(expected_calibration_error(probs, labels))
    probs_hot = jax.nn.softmax(logits * 4.0, axis=-1)
    ece_hot = float(expected_calibration_error(probs_hot, labels))
    assert ece_cal < 0.05
    assert ece_hot > ece_cal + 0.1


def test_fit_temperature_recovers_known_scale():
    """Logits sharpened by T* are fixed by dividing with T ≈ T*."""
    logits, labels = _well_calibrated_logits(jax.random.PRNGKey(1))
    for t_true in (0.5, 3.0):
        temp = float(fit_temperature(logits * t_true, labels))
        assert abs(temp - t_true) / t_true < 0.15, (t_true, temp)


def test_calibration_report_improves_ece_and_nll():
    logits, labels = _well_calibrated_logits(jax.random.PRNGKey(2))
    rep = calibration_report(np.asarray(logits) * 4.0, np.asarray(labels))
    assert rep["ece_after"] < rep["ece_before"]
    assert rep["nll_after"] < rep["nll_before"]
    assert 3.0 < rep["temperature"] < 5.5


def test_server_temperature_scaling():
    """A served T>1 must soften confidences without changing top-1."""
    from vitx.core.config import ViTConfig
    from vitx.nn.vit import init_params
    from vitx.serve import InferenceServer

    cfg = ViTConfig(image_size=32, patch_size=4, num_classes=4,
                    embed_dim=32, depth=2, num_heads=2,
                    compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (32, 32, 3)))

    with InferenceServer(params, cfg, batch_size=4) as plain, \
            InferenceServer(params, cfg, batch_size=4,
                            temperature=4.0) as cooled:
        a, b = plain.predict(x), cooled.predict(x)
    assert a["classes"][0] == b["classes"][0]
    assert b["probs"][0] < a["probs"][0]        # softened confidence
    assert b["probs"][0] > 1.0 / 4 - 1e-6       # still >= uniform


def test_cli_eval_calibrate(tmp_path, capsys):
    import json

    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32",
                    "--calibrate"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cal = out["calibration"]
    assert cal["temperature"] > 0
    assert 0.0 <= cal["ece_after"] <= 1.0
    # temperature scaling can only improve (or match) the fitted NLL
    assert cal["nll_after"] <= cal["nll_before"] + 1e-6

    # --tta (flip-averaged logits) produces a well-formed report over the
    # same checkpoint; sample count must be exact despite ragged batches
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "48", "--tta"])
    assert rc == 0
    tta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tta["num_examples"] == out["num_examples"] == 512
    assert 0.0 <= tta["accuracy"] <= 1.0


def test_cli_eval_top5(tmp_path, capsys):
    """top5_accuracy appears when a logits pass runs on a >5-class head,
    and bounds top-1 from above."""
    import json

    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main
    from vitx.core.config import ViTConfig

    cfg = ViTConfig(image_size=32, patch_size=4, num_classes=10,
                    embed_dim=32, depth=2, num_heads=2,
                    compute_dtype="float32")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    train_main([
        "--config-json", str(cfg_path), "--data", "synthetic",
        "--epochs", "1", "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
    ])
    capsys.readouterr()
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32",
                    "--calibrate"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "top5_accuracy" in out
    assert out["top5_accuracy"] >= out["accuracy"]
    assert 0.0 <= out["top5_accuracy"] <= 1.0
