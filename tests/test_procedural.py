"""Procedural shape-counting dataset + device-resident loader.

The convergence-run data path (CONVERGENCE.md): ProceduralShapes must be
deterministic, label-consistent, and genuinely hard for linear models;
DeviceBatchLoader must follow BatchLoader's exact batch stream so a
device-cached run is trajectory-identical to a host-loaded run.
"""

import numpy as np
import pytest

from vitx.data.device_cache import DeviceBatchLoader
from vitx.data.loader import BatchLoader
from vitx.data.procedural import NUM_CLASSES, ProceduralShapes


def test_procedural_deterministic_and_typed():
    a = ProceduralShapes(num_examples=8, image_size=64, seed=3)
    b = ProceduralShapes(num_examples=8, image_size=64, seed=3)
    for i in range(8):
        ia, la = a.get_example(i)
        ib, lb = b.get_example(i)
        assert ia.shape == (64, 64, 3) and ia.dtype == np.uint8
        assert la == lb and np.array_equal(ia, ib)
    c = ProceduralShapes(num_examples=8, image_size=64, seed=4)
    assert not np.array_equal(a.get_example(0)[0], c.get_example(0)[0])


def test_procedural_targets_present():
    """Saturated target pixels must exist and scale with the circle count:
    the class signal is actually painted into the image."""
    ds = ProceduralShapes(num_examples=256, image_size=96, seed=0)
    # count near-saturated pixels (targets use s,v >= 0.75; background is
    # muted in [0.25, 0.75] + small waves, distractors in [0.15, 0.95])
    sat_frac = {k: [] for k in range(NUM_CLASSES)}
    for i in range(128):
        img, lab = ds.get_example(i)
        x = img.astype(np.float32) / 255.0
        mx, mn = x.max(-1), x.min(-1)
        sat = (mx >= 0.72) & ((mx - mn) >= 0.55)   # high value + chroma
        sat_frac[lab].append(sat.mean())
    ones = np.mean(sat_frac[0] + sat_frac[1])      # 1 circle (+/- square)
    fives = np.mean(sat_frac[8] + sat_frac[9])     # 5 circles
    assert fives > ones * 1.5, (ones, fives)


def test_procedural_materialize_cache(tmp_path):
    ds = ProceduralShapes(num_examples=6, image_size=48, seed=1,
                          cache_dir=str(tmp_path))
    imgs, labels = ds.materialize()
    assert imgs.shape == (6, 48, 48, 3) and len(labels) == 6
    # second instance loads the disk cache and serves identical examples
    ds2 = ProceduralShapes(num_examples=6, image_size=48, seed=1,
                           cache_dir=str(tmp_path))
    imgs2, _ = ds2.materialize()
    assert np.array_equal(imgs, imgs2)
    assert np.array_equal(ds2.get_example(3)[0], imgs[3])


def test_procedural_linear_probe_fails_vit_features_do_not_exist_yet():
    """The 'hard for linear models' claim, in-miniature: closed-form ridge
    on raw pixels stays near chance on held-out data (the full-size version
    is in CONVERGENCE.md)."""
    ds = ProceduralShapes(num_examples=512, image_size=64, seed=7)
    X = np.stack([ds.get_example(i)[0].reshape(-1) for i in range(512)])
    X = X.astype(np.float32) / 255.0
    y = ds.labels[:512]
    Xtr, Xte, ytr, yte = X[:384], X[384:], y[:384], y[384:]
    mu = Xtr.mean(0)
    A, B = Xtr - mu, Xte - mu
    Y = np.eye(NUM_CLASSES, dtype=np.float32)[ytr]
    # ridge in feature space via the kernel form (n < d)
    K = A @ A.T + 1e2 * np.eye(len(A), dtype=np.float32)
    preds = (B @ A.T) @ np.linalg.solve(K, Y)
    acc = float(np.mean(preds.argmax(-1) == yte))
    assert acc < 0.3, acc     # 10-class chance = 0.1


@pytest.mark.parametrize("drop_last", [False, True])
def test_device_loader_matches_host_loader(drop_last):
    """DeviceBatchLoader yields the EXACT batch stream of BatchLoader —
    same (seed, epoch) shuffle, same ragged-final-batch padding+mask — so
    device-cached training is trajectory-identical to host-loaded."""
    ds = ProceduralShapes(num_examples=45, image_size=32, seed=2)
    host = BatchLoader(ds, 16, shuffle=True, seed=5, drop_last=drop_last)
    dev = DeviceBatchLoader(ds, 16, shuffle=True, seed=5,
                            drop_last=drop_last)
    assert len(host) == len(dev)
    for epoch in (0, 1):
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        hb = list(host)
        db = list(dev)
        assert len(hb) == len(db) == len(host)
        for h, d in zip(hb, db):
            assert np.array_equal(h["image"], np.asarray(d["image"]))
            assert np.array_equal(h["label"], np.asarray(d["label"]))
            assert np.array_equal(h["mask"], np.asarray(d["mask"]))


def test_device_cache_train_cli(tmp_path, capsys):
    """End-to-end: --data procedural --device-cache trains, checkpoints,
    and eval reproduces the trainer's val accuracy from the artifact."""
    import json

    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    rc = train_main([
        "--preset", "tiny", "--data", "procedural:96,32",
        "--device-cache", "--epochs", "1", "--batch-size", "32",
        "--lr", "1e-3", "--compute-dtype", "float32",
        "--checkpoint-dir", str(tmp_path / "c"),
    ])
    assert rc in (0, None)
    capsys.readouterr()
    rc = eval_main(["--data", "procedural:96,32", "--batch-size", "32",
                    "--checkpoint", str(tmp_path / "c")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_examples"] == 32


def test_device_cache_composes_with_steps_per_dispatch(tmp_path):
    """--device-cache batches (device-resident gathers) flow through the
    --steps-per-dispatch k-step scan (loop.py::run_multi stacks them on
    device) — the two dispatch-overhead answers compose."""
    from vitx.cli.train import main as train_main

    rc = train_main([
        "--preset", "tiny", "--data", "procedural:128,32",
        "--device-cache", "--steps-per-dispatch", "2",
        "--epochs", "2", "--batch-size", "32", "--lr", "1e-3",
        "--compute-dtype", "float32",
        "--checkpoint-dir", str(tmp_path / "c"),
    ])
    assert rc in (0, None)


def test_device_loader_multilabel_batches():
    """(B, C) multi-hot labels gather and pad correctly (mask broadcast
    per row)."""
    from vitx.data.synthetic import SyntheticMultiLabelDataset

    ds = SyntheticMultiLabelDataset(num_examples=20, image_size=16,
                                    num_classes=5, seed=0)
    host = BatchLoader(ds, 8)
    dev = DeviceBatchLoader(ds, 8)
    for h, d in zip(host, dev):
        assert np.array_equal(h["label"], np.asarray(d["label"]))
        assert np.array_equal(h["image"], np.asarray(d["image"]))
