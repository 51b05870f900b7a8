"""Evaluation CLI: ``python -m vitx.cli.eval --checkpoint DIR --data ...``.

Restores the newest checkpoint and reports accuracy, weighted
precision/recall (sklearn semantics, train.py:39-42) and per-class accuracy
(BASELINE.json north star) from one on-device confusion matrix.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import numpy as np

from vitx.core.cache import enable_persistent_cache
from vitx.core.config import PRESETS
from vitx.data import BatchLoader
from vitx.data.pipeline import make_preprocess
from vitx.metrics import confusion_to_metrics
from vitx.train import make_eval_step


def main(argv=None):
    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="vitx.eval")
    p.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    p.add_argument("--config-json", default=None)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint directory (resumes from newest epoch)")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic', 'cifar10:<dir>', 'folder:<dir>' or "
                        "'shards:<dir>' (tar shards, vitx/data/shards.py)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--predict", default=None, metavar="OUT.jsonl",
                   help="also write per-example predictions (id, label, "
                        "pred, prob) as JSON lines")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation: average logits over the "
                        "horizontal flip (2 forwards/batch); applies to "
                        "the report, --predict and --calibrate alike")
    p.add_argument("--calibrate", action="store_true",
                   help="fit temperature scaling on this eval set and "
                        "report ECE/NLL before and after "
                        "(vitx/metrics/calibration.py, Guo 2017)")
    p.add_argument("--soup", nargs="+", default=None, metavar="CKPT",
                   help="uniform model soup (Wortsman 2022): average the "
                        "--checkpoint params with these same-geometry "
                        "artifacts before evaluating; exports capture the "
                        "souped weights")
    p.add_argument("--export-quantized", default=None, metavar="OUT.quant.npz",
                   help="also write the restored (EMA-aware) params as a "
                        "weight-only int8 artifact (vitx/quant.py; ~4x "
                        "smaller than fp32, serves directly)")
    p.add_argument("--export-stablehlo", default=None,
                   metavar="OUT.stablehlo",
                   help="also serialize the inference forward (params baked "
                        "in, symbolic batch dim) via jax.export — runs on "
                        "any StableHLO consumer with no model code "
                        "(vitx/export.py)")
    from vitx.nn.tome import parse_tome_r
    p.add_argument("--patch-size", type=int, default=None, metavar="P",
                   help="FlexiViT PI-resize (Beyer 2023): run the checkpoint "
                        "at a different patch size — the patchify kernel is "
                        "pseudo-inverse-resized and the input scales "
                        "proportionally (token grid unchanged)")
    p.add_argument("--tome-r", type=parse_tome_r, default=0,
                   help="ToMe token merging: merge this many patch-token "
                        "pairs per block at inference (vitx/nn/tome.py), "
                        "a comma-separated per-block schedule, or 'toN' "
                        "(e.g. to128: merge to N total tokens — lane-exact "
                        "attention tiles when N is a multiple of 128); "
                        "works on any checkpoint, trades a small accuracy "
                        "delta for throughput")
    args = p.parse_args(argv)

    from vitx.cli.train import make_datasets
    from vitx.train.checkpoint import (load_artifact_params,
                                       resolve_artifact_config)

    # shared discovery rule (checkpoints are self-describing: the Trainer
    # stores the exact model config in meta, int8 artifacts in user meta —
    # the restored geometry always matches, even when training mutated the
    # preset, e.g. --init-from sets final_norm)
    cfg = resolve_artifact_config(args.checkpoint, args.config_json,
                                  args.preset)
    _, eval_ds = make_datasets(args.data, cfg, seed=0)
    classes = getattr(eval_ds, "classes", None)
    # mirror the train CLI's class-count adjustment (cli/train.py), else the
    # restored head and the confusion matrix would disagree silently
    n_classes = getattr(eval_ds, "num_classes",
                        len(classes) if classes else cfg.num_classes)
    if n_classes != cfg.num_classes:
        cfg = cfg.replace(num_classes=n_classes)
    if args.tome_r:
        tr = args.tome_r
        if isinstance(tr, str):          # "toN" -> lane-aligned schedule
            from vitx.nn.tome import aligned_schedule

            tr = aligned_schedule(cfg, target_tokens=int(tr[2:]))
        cfg = cfg.replace(tome_r=tr)

    try:
        # shared loading rule: vitx dirs/files (EMA shadow restored for
        # --ema-decay runs via a rebuilt optimizer template), .quant.npz
        # int8 artifacts, reference .pt
        params, meta = load_artifact_params(args.checkpoint, cfg)
    except FileNotFoundError:
        print(f"error: no checkpoint under {args.checkpoint}",
              file=sys.stderr)
        return 1
    if args.soup:
        from vitx.train.checkpoint import soup_params

        params = soup_params(params, cfg, args.soup)
        print(f"souped {1 + len(args.soup)} models", file=sys.stderr)
    if args.patch_size and args.patch_size != cfg.patch_size:
        from vitx.nn.flexivit import resize_patch_embed

        params, cfg = resize_patch_embed(params, cfg,
                                         patch_size=args.patch_size)
        # the input resolution scaled proportionally — retarget the eval
        # split's decode size (every vitx dataset decodes at .image_size;
        # cheaper than re-scanning folder trees / shard headers)
        if (hasattr(eval_ds, "image_size")
                and getattr(eval_ds, "_cache", None) is None):
            eval_ds.image_size = cfg.image_size
        else:
            _, eval_ds = make_datasets(args.data, cfg, seed=0)
        print(f"PI-resized patchify to patch {cfg.patch_size} "
              f"(input {cfg.image_size}px)", file=sys.stderr)
    if args.export_quantized:
        from vitx.quant import save_quantized

        # store the model config WITHOUT inference-only overrides: a
        # --tome-r used for THIS eval must not silently re-activate on
        # every later eval/serve of the artifact
        save_quantized(args.export_quantized, params,
                       meta={"config": json.loads(
                                 cfg.replace(tome_r=0).to_json()),
                             "epoch": meta.get("epoch")})
        print(f"wrote int8 artifact {args.export_quantized}",
              file=sys.stderr)
    if args.export_stablehlo:
        from vitx.export import save_exported

        # ToMe merges need static shapes -> pin the batch for tome configs
        nbytes = save_exported(
            args.export_stablehlo, params, cfg,
            batch_size=args.batch_size if cfg.tome_r else None)
        print(f"wrote stablehlo artifact {args.export_stablehlo} "
              f"({nbytes/1e6:.1f} MB)", file=sys.stderr)

    pre = make_preprocess(
        out_size=cfg.image_size,
        mean=None if args.no_normalize else (0.5, 0.5, 0.5),
        std=None if args.no_normalize else (0.5, 0.5, 0.5),
        random_flip=False)

    if meta.get("loss_type") == "bce":
        # multi-label checkpoint (trained with --loss bce): the confusion-
        # matrix machinery below is single-label; report micro/macro F1 +
        # mAP from gathered logits instead (vitx/metrics/multilabel.py)
        if args.predict or args.calibrate or args.tta:
            print("error: --predict/--calibrate/--tta are single-label "
                  "surfaces; this checkpoint was trained with --loss bce",
                  file=sys.stderr)
            return 1
        from vitx.metrics.multilabel import multilabel_metrics
        from vitx.nn.vit import forward as _fwd
        from vitx.train.step import sigmoid_bce_loss

        fwd = jax.jit(lambda p, x: _fwd(p, x, cfg))
        scores, targets = [], []
        loss_sum = 0.0
        for batch in BatchLoader(eval_ds, args.batch_size):
            img = pre(batch["image"], None, train=False)
            lg = fwd(params, img)
            keep = np.asarray(batch["mask"]).astype(bool)
            loss_sum += float(sigmoid_bce_loss(
                lg, batch["label"], batch["mask"])) * int(keep.sum())
            scores.append(np.asarray(lg)[keep])
            targets.append(np.asarray(batch["label"])[keep])
        report = multilabel_metrics(np.concatenate(scores),
                                    np.concatenate(targets))
        report["loss"] = loss_sum / max(report["num_examples"], 1)
        out = {}
        for k, v in report.items():
            if isinstance(v, int):
                out[k] = v
            elif np.isscalar(v):
                out[k] = round(float(v), 6)
            else:
                arr = np.round(np.asarray(v, np.float64), 6)
                out[k] = [None if np.isnan(x) else x for x in arr.tolist()]
        print(json.dumps(out))
        return 0

    eval_step = make_eval_step(cfg)

    # --predict and --calibrate share ONE extra jitted logits pass per
    # batch (predict's softmax is a host-side afterthought of the same
    # logits) rather than each compiling and running its own forward
    logits_fn = None
    pred_file = None
    cal_logits, cal_labels = [], []
    if args.predict or args.calibrate or args.tta:
        import jax.numpy as jnp

        from vitx.nn.vit import forward

        if args.tta:
            # average over the horizontal flip (W is axis 2 of (B,H,W,C))
            def _tta_logits(p, x):
                a = forward(p, x, cfg).astype(jnp.float32)
                b = forward(p, x[:, :, ::-1, :], cfg).astype(jnp.float32)
                return 0.5 * (a + b)

            logits_fn = jax.jit(_tta_logits)
        else:
            logits_fn = jax.jit(
                lambda p, x: forward(p, x, cfg).astype(jnp.float32))
    if args.predict:
        pred_file = open(args.predict, "w")
    paths = getattr(eval_ds, "paths", None)

    cm = None
    seen = 0
    top5_hits = top5_n = 0
    for batch in BatchLoader(eval_ds, args.batch_size):
        prepped = {"image": pre(batch["image"], None, train=False),
                   "label": batch["label"], "mask": batch["mask"]}
        if logits_fn is not None:
            lg = np.asarray(logits_fn(params, prepped["image"]))
            keep = np.asarray(batch["mask"]).astype(bool)
            labels_np = np.asarray(batch["label"])
            if args.calibrate:
                cal_logits.append(lg[keep])
                cal_labels.append(labels_np[keep])
            if cfg.num_classes > 5:
                top5 = np.argsort(lg[keep], axis=-1)[:, -5:]
                top5_hits += int((top5 == labels_np[keep, None]).sum())
                top5_n += int(keep.sum())
        if logits_fn is not None:
            # one forward per batch: the confusion matrix comes from the
            # same logits as predict/calibrate/TTA (running eval_step too
            # would recompute the identical forward)
            from vitx.metrics import confusion_matrix as _cmx

            m = np.asarray(batch["mask"]).astype(np.int64)
            cm_b = np.array(_cmx(lg.argmax(-1) * m,
                                 np.asarray(batch["label"]) * m,
                                 cfg.num_classes))
            cm_b[0, 0] -= int((1 - m).sum())
        else:
            cm_b, _ = eval_step(params, prepped)
        cm = cm_b if cm is None else cm + cm_b
        if pred_file is not None:
            e = np.exp(lg - lg.max(axis=-1, keepdims=True))
            probs = e / e.sum(axis=-1, keepdims=True)
            mask = np.asarray(batch["mask"])
            for j in range(probs.shape[0]):
                if not mask[j]:
                    continue
                pred = int(np.argmax(probs[j]))
                row = {"id": (str(paths[seen]) if paths is not None
                              else seen),
                       "label": (classes[int(batch['label'][j])]
                                 if classes else int(batch["label"][j])),
                       "pred": classes[pred] if classes else pred,
                       "prob": round(float(probs[j, pred]), 6)}
                pred_file.write(json.dumps(row) + "\n")
                seen += 1
    if pred_file is not None:
        pred_file.close()

    metrics = jax.device_get(confusion_to_metrics(cm))
    out = {
        "epoch": meta.get("epoch", -1),
        "accuracy": float(metrics["accuracy"]),
        "precision_weighted": float(metrics["precision_weighted"]),
        "recall_weighted": float(metrics["recall_weighted"]),
        "f1_macro": float(metrics["f1_macro"]),
        "per_class_accuracy": {
            (classes[i] if classes else str(i)): round(float(v), 4)
            for i, v in enumerate(np.asarray(metrics["per_class_accuracy"]))},
        "per_class_f1": {
            (classes[i] if classes else str(i)): round(float(v), 4)
            for i, v in enumerate(np.asarray(metrics["per_class_f1"]))},
        "num_examples": int(np.asarray(cm).sum()),
    }
    if cfg.num_classes <= 10:
        # small label spaces (the brain-tumor regime): ship the full matrix
        # (rows = true class, reference train.py's sklearn order)
        out["confusion_matrix"] = np.asarray(cm).astype(int).tolist()
    if top5_n:
        # reported whenever a logits pass ran (--predict/--calibrate/--tta)
        # and the label space makes top-5 meaningful
        out["top5_accuracy"] = round(top5_hits / top5_n, 6)
    if args.calibrate:
        from vitx.metrics.calibration import calibration_report

        out["calibration"] = calibration_report(
            np.concatenate(cal_logits), np.concatenate(cal_labels))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
