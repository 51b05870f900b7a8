"""The long-horizon convergence study (CONVERGENCE.md).

Reference counterpart: the ~50-epoch CIFAR-10 run in
``/root/reference/src/vit.ipynb`` cell 28 (training loop
``/root/reference/src/train.py:86-119``) — the reference's only empirical
accuracy artifact. CIFAR is unreachable here (zero egress), so the task is
the procedural shape-counting dataset (vitx/data/procedural.py): 12.8k
train / 2.56k val at 224^2, 10 classes, provably hard for linear models
(this script measures the raw-pixel ridge probe next to the ViT runs).

Three ViT-S/16 runs with the FULL recipe exercised jointly — RandAugment
(m5, device-resident), cosine + warmup, weight-decay exclusion, EMA,
early stopping — at equal epochs, differing only in the token policy:

  full   : every token, every step (the baseline semantics)
  tome   : --tome-r to128 --tome-train (train == serve merge semantics)
  pdrop  : --patch-drop 0.5 (FLIP random token subsets; train/serve shift)

All three run DEVICE-CACHED (vitx/data/device_cache.py): both splits live
in HBM and training runs at device rate — on this 1-core host behind the
16-40 MB/s axon tunnel, the host-fed path caps at ~140-380 img/s while
these runs sustain >1500 img/s.

Run: ``python examples/convergence.py [--epochs 50] [--out examples/convergence]``
Each variant is a subprocess of the REAL train CLI (logs kept per-variant);
the script then writes a summary table (consumed by CONVERGENCE.md).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import subprocess
import sys
import time

# runnable as `python examples/convergence.py` from the repo root: the
# script dir shadows the repo on sys.path, so add the repo root back
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

RECIPE = [
    "--preset", "small16", "--data", "procedural", "--device-cache",
    "--batch-size", "128", "--lr", "3e-4", "--schedule", "cosine",
    "--warmup-steps", "300", "--weight-decay", "0.05", "--wd-exclude",
    "--randaug", "5", "--ema-decay", "0.999", "--early-stop", "10",
    "--seed", "0", "--log-every", "100",
]

VARIANTS = {
    "full": [],
    "tome": ["--tome-r", "to128", "--tome-train"],
    "pdrop": ["--patch-drop", "0.5"],
}


def pixel_probe_baseline(n_train=6144, n_val=2560, pool=4):
    """Closed-form ridge on raw (pool x pool mean-pooled) pixels — the
    'linear models fail at this task' measurement. Pooling is linear, so
    this lower-bounds full-resolution linear probing only mildly while
    keeping the kernel solve tractable on one core."""
    import numpy as np

    from vitx.data.procedural import NUM_CLASSES, ProceduralShapes

    tr = ProceduralShapes(num_examples=n_train, image_size=224, seed=0,
                          cache_dir=".procdata")
    va = ProceduralShapes(num_examples=n_val, image_size=224, seed=1,
                          cache_dir=".procdata")

    def feats(ds, n):
        imgs, labels = ds.materialize()
        x = imgs[:n].astype(np.float32) / 255.0
        B, S, _, C = x.shape
        x = x.reshape(B, S // pool, pool, S // pool, pool, C).mean((2, 4))
        return x.reshape(B, -1), labels[:n]

    Xtr, ytr = feats(tr, n_train)
    Xte, yte = feats(va, n_val)
    mu = Xtr.mean(0)
    A, B = Xtr - mu, Xte - mu
    Y = np.eye(NUM_CLASSES, dtype=np.float32)[ytr]
    K = A @ A.T + 1e2 * np.eye(len(A), dtype=np.float32)
    preds = (B @ A.T) @ np.linalg.solve(K, Y)
    return float(np.mean(preds.argmax(-1) == yte))


def run_variant(name, extra, epochs, out_dir):
    log = out_dir / f"run_{name}.log"
    ckpt = out_dir / f"ckpt_{name}"
    tb = out_dir / f"tb_{name}"
    cmd = [sys.executable, "-m", "vitx.cli.train", *RECIPE,
           "--epochs", str(epochs), "--checkpoint-dir", str(ckpt),
           "--log-dir", str(tb), *extra]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    t0 = time.time()
    with open(log, "w") as fh:
        fh.write("# " + " ".join(cmd) + "\n")
        fh.flush()
        rc = subprocess.call(cmd, stdout=fh, stderr=subprocess.STDOUT)
    wall = time.time() - t0
    if rc != 0:
        raise SystemExit(f"variant {name} failed rc={rc} — see {log}")
    return parse_log(log, wall)


def parse_log(log, wall):
    """Pull the per-epoch stats lines the train CLI prints."""
    hist = []
    pat = re.compile(r"epoch (\d+): (.*)")
    for line in open(log):
        m = pat.match(line.strip())
        if not m:
            continue
        row = {"epoch": int(m.group(1))}
        for kv in m.group(2).split(", "):
            k, _, v = kv.partition("=")
            try:
                row[k] = float(v)
            except ValueError:
                pass
        hist.append(row)
    return {"wall_s": wall, "history": hist}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--out", default="examples/convergence")
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args(argv)
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    summary = {"epochs": args.epochs}
    if not args.skip_probe:
        print("pixel ridge probe ...", flush=True)
        summary["pixel_probe_val_acc"] = pixel_probe_baseline()
        print(f"pixel probe val acc: {summary['pixel_probe_val_acc']:.4f}",
              flush=True)

    for name, extra in VARIANTS.items():
        summary[name] = run_variant(name, extra, args.epochs, out_dir)
        hist = summary[name]["history"]
        best = max((r.get("val_accuracy", 0.0) for r in hist), default=0.0)
        rates = [r["images_per_sec"] for r in hist[1:]
                 if "images_per_sec" in r]
        summary[name]["best_val_acc"] = best
        summary[name]["steady_images_per_sec"] = (
            sorted(rates)[len(rates) // 2] if rates else 0.0)
        print(f"[{name}] best val acc {best:.4f}, "
              f"median {summary[name]['steady_images_per_sec']:.0f} img/s, "
              f"wall {summary[name]['wall_s']:.0f}s", flush=True)

    with open(out_dir / "summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"wrote {out_dir}/summary.json", flush=True)


if __name__ == "__main__":
    main()
