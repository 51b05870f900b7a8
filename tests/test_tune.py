"""Throughput autotuner (vitx.cli.tune): sweep batch/remat/unroll on the
current device, emit one JSON line per candidate + a best summary."""

import json

import pytest


def test_tune_cli_train_sweep(capsys):
    from vitx.cli.tune import main

    rc = main(["--preset", "tiny", "--mode", "train",
               "--batches", "4,8", "--remat", "none",
               "--unroll", "1", "--iters", "2", "--reps", "1"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(x) for x in lines[:-1]]
    assert len(rows) == 2
    assert all("images_per_sec" in r for r in rows)
    summary = json.loads(lines[-1])
    assert summary["candidates"] == 2 and summary["failed"] == 0
    best_ips = max(r["images_per_sec"] for r in rows)
    assert summary["best"]["images_per_sec"] == best_ips


def test_tune_cli_infer_and_out_file(tmp_path, capsys):
    from vitx.cli.tune import main

    out = tmp_path / "tune.json"
    rc = main(["--preset", "tiny", "--mode", "infer",
               "--batches", "4", "--unroll", "1",
               "--iters", "2", "--reps", "1", "--out", str(out)])
    assert rc == 0
    saved = json.loads(out.read_text())
    assert saved["best"]["batch"] == 4
    assert len(saved["results"]) == 1


def test_tune_failed_candidates_are_rows_not_crashes(capsys):
    from vitx.core.config import get_config
    from vitx.cli.tune import run_sweep

    cfg = get_config("tiny")
    # an invalid remat policy fails per-candidate, not the sweep
    rows = run_sweep(cfg, "infer", [4], ["bogus"], [1], iters=1, reps=1,
                     emit=lambda s: None)
    assert len(rows) == 1 and "error" in rows[0]
