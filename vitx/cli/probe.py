"""Representation probing CLI: ``python -m vitx.cli.probe --checkpoint DIR``.

Evaluates the quality of a trained backbone's FEATURES rather than its head —
the standard self-supervised evaluation protocols (beyond-reference
capability; the reference's ``src/train.py`` only ever reads head logits):

- **Linear probe**: closed-form ridge regression from frozen features to
  one-hot targets (fit on the train split, reported on both splits) — the
  MAE paper's frozen-encoder protocol in its cheapest deterministic form.
- **k-NN**: cosine-similarity weighted vote over the train-split features
  (the DINO protocol, ``exp(sim/T)`` weighting, T=0.07).
- **Feature export** (``--features OUT.npz``): raw (features, labels) for
  both splits, for any downstream analysis.

Features come from :func:`vitx.nn.vit.forward_features` (CLS token or
patch-mean pooling). Any artifact the eval/serve CLIs accept works here —
discovery and loading go through the same shared rules
(vitx/train/checkpoint.py::{resolve_artifact_config,load_artifact_params}):
vitx ``{epoch}.ckpt`` dirs (EMA-aware restore), ``.quant.npz`` int8
artifacts, or reference ``.pt`` files.

    python -m vitx.cli.probe --checkpoint ckpt/run --data folder:data \
        --pool cls --knn 20 --features /tmp/feats.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import numpy as np

from vitx.core.config import PRESETS, ViTConfig
from vitx.data import BatchLoader
from vitx.data.pipeline import make_preprocess


def _feat_fn(params, x, cfg: ViTConfig, pool: str):
    from vitx.nn.vit import forward_features

    return forward_features(params, x, cfg, pool=pool)


# one jit cache entry per (cfg, pool): the train- and val-split extractions
# (and repeat calls, e.g. the exploration notebook) share the compile
_feat_jit = jax.jit(_feat_fn, static_argnames=("cfg", "pool"))
# ... and per mesh for the --dp path (same sharing rationale)
_mesh_feat_jits = {}


def _mesh_feat_jit(mesh):
    if mesh not in _mesh_feat_jits:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data", None, None, None))
        _mesh_feat_jits[mesh] = jax.jit(
            _feat_fn, static_argnames=("cfg", "pool"),
            in_shardings=(rep, bsh))
    return _mesh_feat_jits[mesh]


def extract_features(params, dataset, cfg: ViTConfig, *, pool: str = "cls",
                     batch_size: int = 64, normalize: bool = True,
                     pre=None, mesh=None):
    """Dataset -> (features (N, E) fp32, labels (N,)) with mask-exact ragged
    batches (padded rows never reach the output). ``pre``: a
    ``make_preprocess`` callable to reuse across calls (built per call
    otherwise). ``mesh``: a ``vitx.parallel.make_mesh`` mesh — batches
    shard over its data axis (batch_size must divide), params replicate."""
    if pre is None:
        pre = make_preprocess(
            out_size=cfg.image_size,
            mean=(0.5, 0.5, 0.5) if normalize else None,
            std=(0.5, 0.5, 0.5) if normalize else None,
            random_flip=False)
    feat = _feat_jit
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["data"]
        if batch_size % dp:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"the mesh's data axis ({dp})")
        params = jax.device_put(params, NamedSharding(mesh, P()))
        feat = _mesh_feat_jit(mesh)
    feats, labels = [], []
    for batch in BatchLoader(dataset, batch_size):
        x = pre(batch["image"], None, train=False)
        f = np.asarray(feat(params, x, cfg, pool))
        keep = np.asarray(batch["mask"]).astype(bool)
        feats.append(f[keep])
        labels.append(np.asarray(batch["label"])[keep])
    return np.concatenate(feats), np.concatenate(labels)


def fit_linear_probe(train_x, train_y, num_classes: int, lam: float = 1e-2):
    """Closed-form ridge probe: standardized features + bias column onto
    one-hot targets. Returns a ``predict(features) -> labels`` closure.

    One (E+1)x(E+1) solve — exact, deterministic, and seconds even at
    ViT-L's E=1024 (vs an SGD probe's schedule/epoch knobs)."""
    mu = train_x.mean(axis=0)
    sd = train_x.std(axis=0) + 1e-6
    xs = (train_x - mu) / sd
    xs = np.concatenate([xs, np.ones((xs.shape[0], 1), xs.dtype)], axis=1)
    onehot = np.eye(num_classes, dtype=np.float64)[train_y]
    a = xs.T.astype(np.float64) @ xs.astype(np.float64)
    a += lam * len(xs) * np.eye(xs.shape[1])
    w = np.linalg.solve(a, xs.T.astype(np.float64) @ onehot)

    def predict(x):
        z = (x - mu) / sd
        z = np.concatenate([z, np.ones((z.shape[0], 1), z.dtype)], axis=1)
        return np.argmax(z @ w, axis=-1)

    return predict


def knn_predict(train_x, train_y, test_x, num_classes: int, *, k: int = 20,
                temperature: float = 0.07, chunk: int = 256):
    """Cosine k-NN with exp(sim/T)-weighted votes (DINO protocol)."""
    def _norm(x):
        return x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-8)

    tr, te = _norm(train_x), _norm(test_x)
    k = min(k, len(train_x))
    preds = []
    for i in range(0, len(te), chunk):
        sims = te[i:i + chunk] @ tr.T                        # (c, Ntrain)
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.arange(len(idx))[:, None]
        w = np.exp(sims[rows, idx] / temperature)            # (c, k)
        votes = np.zeros((len(idx), num_classes))
        np.add.at(votes, (rows, train_y[idx]), w)
        preds.append(np.argmax(votes, axis=1))
    return np.concatenate(preds)


def main(argv=None):
    from vitx.core.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="vitx.probe")
    p.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    p.add_argument("--config-json", default=None)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir / {epoch}.ckpt / orbax / .quant.npz "
                        "/ reference .pt")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic', 'cifar10:<dir>' or 'folder:<dir>'")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--pool", default="cls", choices=["cls", "gap"],
                   help="cls: token 0 (what the head reads); gap: mean over "
                        "patch tokens (MAE fine-tune pooling)")
    p.add_argument("--ridge-lambda", type=float, default=1e-2,
                   help="linear-probe ridge regularizer (per-example scale)")
    p.add_argument("--knn", type=int, default=0, metavar="K",
                   help="also report cosine k-NN accuracy with K neighbors")
    p.add_argument("--features", default=None, metavar="OUT.npz",
                   help="also export raw features+labels for both splits")
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--dp", type=int, default=None,
                   help="extract features over a data-parallel mesh of "
                        "this many chips (batch-size must divide)")
    args = p.parse_args(argv)

    from vitx.cli.train import make_datasets
    from vitx.train.checkpoint import (load_artifact_params,
                                       resolve_artifact_config)

    cfg = resolve_artifact_config(args.checkpoint, args.config_json,
                                  args.preset)
    train_ds, eval_ds = make_datasets(args.data, cfg, seed=0)
    classes = getattr(train_ds, "classes", None)
    n_classes = getattr(train_ds, "num_classes",
                        len(classes) if classes else cfg.num_classes)
    if n_classes != cfg.num_classes:
        cfg = cfg.replace(num_classes=n_classes)

    params, _ = load_artifact_params(args.checkpoint, cfg)

    pre = make_preprocess(
        out_size=cfg.image_size,
        mean=None if args.no_normalize else (0.5, 0.5, 0.5),
        std=None if args.no_normalize else (0.5, 0.5, 0.5),
        random_flip=False)
    mesh = None
    if args.dp:
        from vitx.parallel import make_mesh

        mesh = make_mesh(dp=args.dp, tp=1)
    kw = dict(pool=args.pool, batch_size=args.batch_size, pre=pre,
              mesh=mesh)
    train_x, train_y = extract_features(params, train_ds, cfg, **kw)
    val_x, val_y = extract_features(params, eval_ds, cfg, **kw)

    if args.features:
        np.savez(args.features,
                 train_features=train_x, train_labels=train_y,
                 val_features=val_x, val_labels=val_y,
                 pool=np.asarray(args.pool),
                 config=np.asarray(cfg.to_json()))
        print(f"wrote features to {args.features}", file=sys.stderr)

    predict = fit_linear_probe(train_x, train_y, cfg.num_classes,
                               lam=args.ridge_lambda)
    out = {
        "pool": args.pool,
        "dim": int(train_x.shape[1]),
        "num_train": int(len(train_y)),
        "num_val": int(len(val_y)),
        "linear_probe_train_acc": round(
            float((predict(train_x) == train_y).mean()), 6),
        "linear_probe_val_acc": round(
            float((predict(val_x) == val_y).mean()), 6),
    }
    if args.knn:
        knn = knn_predict(train_x, train_y, val_x, cfg.num_classes,
                          k=args.knn)
        out["knn_val_acc"] = round(float((knn == val_y).mean()), 6)
        out["knn_k"] = int(min(args.knn, len(train_y)))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
