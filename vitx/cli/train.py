"""Training CLI: ``python -m vitx.cli.train --preset tiny --data synthetic``.

Fulfils the reference's own acknowledged TODO (``src/train.py:124-125``
"converting these fields into command line arguments ... or json format") —
the reference hard-codes every hyperparameter under ``__main__``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from vitx.core.config import PRESETS, ViTConfig, get_config
from vitx.data import BatchLoader, CIFAR10, FolderDataset, SyntheticDataset
from vitx.data.pipeline import make_preprocess
from vitx.train.loop import Trainer, TrainerConfig


def build_argparser():
    p = argparse.ArgumentParser(
        prog="vitx.train", description="Train a ViT classifier on TPU")
    p.add_argument("--preset", default="tiny", choices=sorted(PRESETS),
                   help="model preset (see vitx.core.config.PRESETS)")
    p.add_argument("--config-json", default=None,
                   help="path to a ViTConfig JSON (overrides --preset)")
    p.add_argument("--class-weights", default=None,
                   help="per-class loss weights for imbalanced data: "
                        "'balanced' (n/(C*count_c) from the train split, "
                        "sklearn semantics) or C comma-separated floats")
    p.add_argument("--image-size", type=int, default=None,
                   help="override the config's input resolution (must be a "
                        "multiple of the patch size) — with --init-from the "
                        "positional grid is bilinearly resized, the "
                        "standard higher-resolution fine-tune")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic', 'cifar10:<dir>', 'folder:<dir>', "
                        "'shards:<dir>' (tar shards, vitx/data/shards.py) "
                        "or 'procedural[:<ntrain>,<nval>]' (hard 10-class "
                        "shape-counting task, vitx/data/procedural.py — "
                        "default 12800,2560)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--loss", default="ce", choices=["ce", "bce"],
                   help="'ce' = single-label softmax cross-entropy (the "
                        "reference task); 'bce' = MULTI-LABEL sigmoid BCE "
                        "over (B, C) multi-hot labels — eval reports "
                        "micro/macro F1 + mAP (try --data synthetic-ml)")
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "sgd", "lion", "adafactor"],
                   help="adamw = reference semantics; sgd = momentum 0.9 + "
                        "decoupled wd; lion (Chen 2023) wants ~10x lower lr "
                        "and 3-10x higher wd than adamw; adafactor (Shazeer "
                        "2018) = factored second moments, sublinear "
                        "optimizer memory")
    p.add_argument("--mu-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="storage dtype for the adamw FIRST moment: "
                        "bfloat16 halves that buffer (25%% of adamw "
                        "optimizer memory) with negligible drift")
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--wd-exclude", action="store_true",
                   help="apply weight decay to matrix weights only (the "
                        "timm/DeiT no-decay rule: biases, LayerNorm "
                        "scales/biases, LayerScale gains and token/"
                        "positional embeddings are exempt); default decays "
                        "everything like the reference")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--keep-checkpoints", type=int, default=None, metavar="N",
                   help="prune to the N newest {epoch}.ckpt after each save "
                        "(the best-val epoch is always protected); default "
                        "keeps every epoch — a 150-epoch ViT-S run at fp32 "
                        "is ~50 GB of optimizer state without this")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--async-checkpoint", action="store_true",
                   help="serialize epoch checkpoints on a background "
                        "thread (one in flight, drained before exit) — "
                        "overlaps disk time with the next epoch")
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device-cache", action="store_true",
                   help="cache BOTH whole splits in device HBM and gather "
                        "batches on device (vitx/data/device_cache.py): "
                        "steady-state training moves zero image bytes over "
                        "the host link — for datasets that fit accelerator "
                        "memory (e.g. CIFAR-10 = 0.18 GB). Batch order is "
                        "bit-identical to the host loader's")
    p.add_argument("--cache-decoded", action="store_true",
                   help="keep decoded uint8 examples in host RAM after "
                        "their first read: epoch >= 1 runs with zero disk "
                        "IO / decode (for datasets that fit RAM — e.g. "
                        "50k CIFAR images at 224^2 = 7.5 GB)")
    p.add_argument("--no-augment", action="store_true",
                   help="disable normalization + flips (reference parity)")
    p.add_argument("--random-crop", action="store_true",
                   help="per-sample random-resized crop (device-resident)")
    p.add_argument("--color-jitter", type=float, default=None,
                   help="brightness/contrast/saturation jitter strength")
    p.add_argument("--randaug", type=float, default=None, metavar="M",
                   help="RandAugment magnitude (timm rand-mM-n2), "
                        "device-resident")
    p.add_argument("--randaug-layers", type=int, default=2,
                   help="RandAugment ops per sample (with --randaug)")
    p.add_argument("--random-erase", type=float, default=None, metavar="P",
                   help="random-erasing probability (timm pixel mode)")
    p.add_argument("--init-from", default=None,
                   help="initialize params from an artifact for TRANSFER "
                        "fine-tuning: a pretrain --export-vit npz, a "
                        "checkpoint dir/{epoch}.ckpt, a .quant.npz, or a "
                        "reference .pt — mismatched leaves (new class "
                        "head) stay fresh, a changed resolution resizes "
                        "pos_embed (combine with --image-size)")
    p.add_argument("--lora-rank", type=int, default=0, metavar="R",
                   help="LoRA fine-tuning (Hu 2021): rank-R adapters on the "
                        "block weights train while the backbone stays "
                        "frozen (pair with --init-from); fold for "
                        "deployment with vitx.nn.lora.merge_lora_params")
    p.add_argument("--lora-alpha", type=float, default=0.0,
                   help="LoRA scale numerator (delta = alpha/rank * A@B); "
                        "0 = rank (scale 1)")
    p.add_argument("--lora-targets", default="attn",
                   choices=["attn", "all"],
                   help="adapt wqkv+wo only, or also the MLP w1/w2")
    p.add_argument("--freeze-backbone", action="store_true",
                   help="train ONLY the classifier head(s) — linear-probe-"
                        "style fine-tuning with no optimizer moments or "
                        "weight-grad matmuls for the frozen encoder")
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"])
    # DeiT-style recipe knobs
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--mixup-alpha", type=float, default=None)
    p.add_argument("--cutmix-alpha", type=float, default=None,
                   help="CutMix Beta(a,a) patch mixing; with --mixup-alpha "
                        "the two alternate 50/50 per batch (DeiT recipe)")
    p.add_argument("--drop-path", type=float, default=0.0,
                   help="max stochastic-depth rate (linear over depth)")
    p.add_argument("--patch-drop", type=float, default=0.0,
                   help="fraction of patch tokens randomly dropped per "
                        "sample during training (FLIP/PatchDropout; cuts "
                        "encoder FLOPs, inference unaffected)")
    from vitx.nn.tome import parse_tome_r

    p.add_argument("--tome-r", type=parse_tome_r, default=0,
                   help="ToMe token merging during TRAINING (requires "
                        "--tome-train): constant r, per-block schedule "
                        "'23,23,22', or 'toN' (resolved via "
                        "aligned_schedule). The checkpoint itself stays "
                        "full-token-servable; eval-time merging is the "
                        "eval CLI's --tome-r.")
    p.add_argument("--tome-train", action="store_true",
                   help="run the ToMe merging encoder in the train step "
                        "(Bolya 2023 §4) — cuts train FLOPs like "
                        "--patch-drop but with the deterministic merge "
                        "semantics the eval-time ToMe path uses")
    p.add_argument("--layerscale", type=float, default=0.0, metavar="INIT",
                   help="LayerScale (CaiT): init value for the learned "
                        "per-channel residual-branch gains (1e-1 for depth "
                        "<= 18, 1e-5/1e-6 for 24/36). 0 = off")
    p.add_argument("--mlp-act", default=None,
                   choices=["gelu", "gelu_tanh", "relu", "swiglu"],
                   help="block MLP form: GELU (exact erf), tanh-approx "
                        "GELU (the perf presets' default), ReLU (reference "
                        "parity), or SwiGLU (gated FFN, Shazeer 2020 / "
                        "EVA-02 — adds a w3 gate projection per block)")
    p.add_argument("--pos-embed", default=None,
                   choices=["learned", "sincos2d", "rope"],
                   help="positional information: learned table (default), "
                        "fixed 2D sin-cos (MAE-style; no parameter), or 2D "
                        "axial rotary embeddings in every attention layer "
                        "(EVA-02-style)")
    p.add_argument("--qk-norm", action="store_true",
                   help="per-head LayerNorm on queries/keys before the "
                        "logits (ViT-22B): bounds attention logits, "
                        "stabilizes large-model training")
    p.add_argument("--head-type", default=None,
                   choices=["reference", "standard", "map"],
                   help="classifier head: the reference's Linear-GELU-LN-"
                        "Linear, the vanilla LN-Linear, or MAP attention "
                        "pooling (Zhai 2022)")
    p.add_argument("--global-pool", default=None, choices=["cls", "gap"],
                   help="head input: the CLS token (reference semantics) "
                        "or the patch-token mean (MAE fine-tune pooling)")
    p.add_argument("--sam-rho", type=float, default=None,
                   help="sharpness-aware minimization radius (Foret 2021; "
                        "~0.05): update with the gradient at params + "
                        "rho*g/||g||, one extra fwd+bwd per step")
    # knowledge distillation (vitx/train/distill.py)
    p.add_argument("--distill-from", default=None, metavar="CKPT",
                   help="teacher checkpoint (vitx {epoch}.ckpt dir or file; "
                        "must be self-describing) — enables DeiT "
                        "distillation against its frozen predictions")
    p.add_argument("--distill-alpha", type=float, default=0.5,
                   help="weight of the teacher term (1-alpha on CE)")
    p.add_argument("--distill-tau", type=float, default=1.0,
                   help="soft-distillation temperature")
    p.add_argument("--distill-hard", action="store_true",
                   help="hard distillation: CE against teacher argmax")
    p.add_argument("--distill-token", action="store_true",
                   help="DeiT distillation token: a second learned token "
                        "with its own head (CE on CLS, teacher term on the "
                        "token head; eval averages both)")
    p.add_argument("--grad-clip", type=float, default=None)
    p.add_argument("--accum-steps", type=int, default=1,
                   help="average grads over k micro-batches per optimizer "
                        "update (effective batch = k * batch-size)")
    p.add_argument("--schedule", default="const", choices=["const", "cosine"],
                   help="lr schedule: constant (reference semantics) or "
                        "linear-warmup + cosine decay over the full run")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear-warmup length in (micro-)steps; with "
                        "--accum-steps k the schedule ticks once per k")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="EMA of params (shadow in opt_state); eval uses it")
    p.add_argument("--num-registers", type=int, default=0, metavar="R",
                   help="register tokens (Darcet et al. 2023): R learned "
                        "tokens attended to but never classified; cleans "
                        "attention/rollout maps. Typical: 4")
    p.add_argument("--llrd", type=float, default=None, metavar="DECAY",
                   help="layer-wise lr decay for fine-tuning (BEiT recipe): "
                        "block l at lr*DECAY^(depth-l), embeddings lowest, "
                        "heads at lr; typical 0.65-0.75")
    p.add_argument("--early-stop", type=int, default=None,
                   metavar="PATIENCE",
                   help="stop after this many consecutive evals without a "
                        "val-accuracy improvement (> --early-stop-delta)")
    p.add_argument("--early-stop-delta", type=float, default=0.0)
    p.add_argument("--progress", action="store_true",
                   help="per-flush in-epoch progress line")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="fold k train steps into one device dispatch "
                        "(amortizes host/tunnel overhead for small models; "
                        "single-device only)")
    # scale-out: shard over all visible devices
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel size (default: single device)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--zero", type=int, default=0, choices=[0, 1, 2, 3],
                   help="ZeRO stage: 1 = moments, 2 = moments + "
                        "reduce-scattered grads, 3 = params+moments (FSDP)")
    p.add_argument("--moe-experts", type=int, default=0, metavar="N",
                   help="Soft-MoE (Puigcerver 2023): replace the dense MLP "
                        "of the trailing blocks with N soft-routed expert "
                        "MLPs (static shapes, no token dropping)")
    p.add_argument("--moe-blocks", type=int, default=0,
                   help="how many FINAL blocks are MoE blocks "
                        "(0 = depth // 2)")
    p.add_argument("--moe-slots", type=int, default=0,
                   help="slots per expert (0 = seq_len // experts)")
    p.add_argument("--ep", type=int, default=1,
                   help="expert-parallel mesh axis size: MoE expert "
                        "weights/slots shard over it (requires "
                        "--moe-experts divisible by it)")
    p.add_argument("--sp", action="store_true",
                   help="sequence parallelism (Megatron SP): residual "
                        "stream token-sharded over the model axis between "
                        "blocks; requires --tp > 1")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (encoder blocks split "
                        "across devices, microbatch pipelining; composes "
                        "with --dp, --tp (Megatron stage blocks over a "
                        "(data, stage, model) mesh) and --zero 1)")
    p.add_argument("--pp-microbatches", type=int, default=4,
                   help="microbatches per data shard for --pp (per-shard "
                        "batch must be divisible by this)")
    p.add_argument("--pp-schedule", default="gpipe",
                   choices=("gpipe", "1f1b"),
                   help="pipeline schedule: gpipe (activation memory grows "
                        "with microbatches) or 1f1b (O(stages) activation "
                        "memory via per-stage recompute — lets "
                        "--pp-microbatches grow to shrink the bubble)")
    return p


def make_datasets(spec: str, cfg: ViTConfig, seed: int):
    if spec == "synthetic":
        common = dict(image_size=cfg.image_size, num_classes=cfg.num_classes,
                      num_channels=cfg.num_channels)
        return (SyntheticDataset(num_examples=2048, seed=seed, **common),
                SyntheticDataset(num_examples=512, seed=seed + 1, **common))
    if spec == "synthetic-ml":
        from vitx.data.synthetic import SyntheticMultiLabelDataset

        common = dict(image_size=cfg.image_size, num_classes=cfg.num_classes,
                      num_channels=cfg.num_channels)
        return (SyntheticMultiLabelDataset(num_examples=2048, seed=seed,
                                           **common),
                SyntheticMultiLabelDataset(num_examples=512, seed=seed + 1,
                                           **common))
    kind, _, path = spec.partition(":")
    if kind == "procedural":
        from vitx.data.procedural import ProceduralShapes

        n_train, n_val = 12800, 2560
        if path:
            parts = [int(x) for x in path.split(",")]
            n_train = parts[0]
            n_val = parts[1] if len(parts) > 1 else max(parts[0] // 5, 1)
        cache = os.environ.get("VITX_PROC_CACHE", ".procdata")
        return (ProceduralShapes(num_examples=n_train, seed=seed,
                                 image_size=cfg.image_size, cache_dir=cache),
                ProceduralShapes(num_examples=n_val, seed=seed + 1,
                                 image_size=cfg.image_size, cache_dir=cache))
    if kind == "cifar10":
        return CIFAR10(path, train=True), CIFAR10(path, train=False)
    if kind == "folder":
        import pathlib

        root = pathlib.Path(path)
        # predefined split directories (the Kaggle brain-tumor layout ships
        # Training/ + Testing/) beat the internal stratified split
        for tr_name, te_name in (("train", "val"), ("train", "test"),
                                 ("Training", "Testing")):
            tr, te = root / tr_name, root / te_name
            if tr.is_dir() and te.is_dir():
                train_ds = FolderDataset(tr, test_size=None,
                                         image_size=cfg.image_size)
                eval_ds = FolderDataset(te, test_size=None,
                                        image_size=cfg.image_size)
                if train_ds.classes != eval_ds.classes:
                    raise ValueError(
                        f"{tr} and {te} disagree on class subfolders: "
                        f"{train_ds.classes} vs {eval_ds.classes}")
                return train_ds, eval_ds
        return (FolderDataset(path, train=True, image_size=cfg.image_size),
                FolderDataset(path, train=False, image_size=cfg.image_size))
    if kind == "shards":
        import pathlib

        from vitx.data.shards import ShardDataset

        root = pathlib.Path(path)
        # predefined split shard directories beat the internal split
        for tr_name, te_name in (("train", "val"), ("train", "test")):
            tr, te = root / tr_name, root / te_name
            if tr.is_dir() and te.is_dir():
                train_ds = ShardDataset(tr, test_size=None,
                                        image_size=cfg.image_size)
                eval_ds = ShardDataset(te, test_size=None,
                                       image_size=cfg.image_size)
                if train_ds.classes != eval_ds.classes:
                    raise ValueError(
                        f"{tr} and {te} disagree on classes: "
                        f"{train_ds.classes} vs {eval_ds.classes}")
                return train_ds, eval_ds
        return (ShardDataset(path, train=True, image_size=cfg.image_size),
                ShardDataset(path, train=False, image_size=cfg.image_size))
    raise ValueError(f"unknown --data spec {spec!r}")


def main(argv=None):
    from vitx.core.cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_argparser().parse_args(argv)
    if args.config_json:
        cfg = ViTConfig.from_json(open(args.config_json).read())
    else:
        cfg = get_config(args.preset)
    if args.compute_dtype:
        cfg = cfg.replace(compute_dtype=args.compute_dtype)
    if args.image_size:
        # ViTConfig validates patch divisibility; --init-from resizes the
        # positional grid to this resolution (load_vit_init)
        cfg = cfg.replace(image_size=args.image_size)

    train_ds, eval_ds = make_datasets(args.data, cfg, args.seed)
    n_classes = getattr(train_ds, "num_classes", len(train_ds.classes))
    if n_classes != cfg.num_classes:
        cfg = cfg.replace(num_classes=n_classes)

    # mixup/cutmix permute rows WITHIN a batch; a zero-padded ragged final
    # batch would blend real images toward black and train them on label 0
    # (step.py loss_fn docstring: "pair with drop_last loaders") — drop the
    # remainder batch when mixing is on
    mixing = bool(args.mixup_alpha or args.cutmix_alpha)
    if args.device_cache:
        from vitx.data.device_cache import DeviceBatchLoader

        train_loader = DeviceBatchLoader(train_ds, args.batch_size,
                                         shuffle=True, seed=args.seed,
                                         drop_last=mixing)
        eval_loader = DeviceBatchLoader(eval_ds, args.batch_size)
        print(f"device-cache: {train_loader.nbytes / 1e9:.2f} GB train + "
              f"{eval_loader.nbytes / 1e9:.2f} GB val resident in HBM")
    else:
        train_loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                                   seed=args.seed, drop_last=mixing,
                                   cache_decoded=args.cache_decoded)
        eval_loader = BatchLoader(eval_ds, args.batch_size,
                                  cache_decoded=args.cache_decoded)
    pre = make_preprocess(
        out_size=cfg.image_size,
        mean=None if args.no_augment else (0.5, 0.5, 0.5),
        std=None if args.no_augment else (0.5, 0.5, 0.5),
        random_flip=not args.no_augment,
        random_crop=args.random_crop and not args.no_augment,
        color_jitter=None if args.no_augment else args.color_jitter,
        randaug_layers=(args.randaug_layers
                        if args.randaug is not None
                        and not args.no_augment else 0),
        randaug_magnitude=args.randaug if args.randaug is not None else 9.0,
        random_erase=None if args.no_augment else args.random_erase)

    if args.drop_path:
        cfg = cfg.replace(drop_path=args.drop_path)
    if args.patch_drop:
        cfg = cfg.replace(patch_drop=args.patch_drop)
    if args.tome_train or args.tome_r:
        if not (args.tome_train and args.tome_r):
            raise SystemExit("--tome-r and --tome-train go together for "
                             "training-time token merging (eval-time "
                             "merging is the eval CLI's --tome-r)")
    if args.layerscale:
        cfg = cfg.replace(layerscale_init=args.layerscale)
    if args.mlp_act:
        cfg = cfg.replace(mlp_act=args.mlp_act)
    if args.pos_embed:
        cfg = cfg.replace(pos_embed=args.pos_embed)
    if args.qk_norm:
        cfg = cfg.replace(qk_norm=True)
    if args.head_type:
        cfg = cfg.replace(head_type=args.head_type)
    if args.global_pool:
        cfg = cfg.replace(global_pool=args.global_pool)
    if args.distill_token:
        cfg = cfg.replace(distill_token=True)
    if args.num_registers:
        cfg = cfg.replace(num_registers=args.num_registers)
    if args.moe_experts:
        cfg = cfg.replace(moe_experts=args.moe_experts,
                          moe_blocks=args.moe_blocks,
                          moe_slots=args.moe_slots)
    if args.lora_rank:
        cfg = cfg.replace(lora_rank=args.lora_rank,
                          lora_alpha=args.lora_alpha,
                          lora_targets=args.lora_targets)
    if args.tome_train and args.tome_r:
        # resolved HERE, after every geometry knob (--num-registers,
        # --image-size, ...) has landed in cfg: a "toN" aligned schedule
        # depends on the final seq_len — resolving earlier would silently
        # miss the lane-exact target on models with registers
        tr = args.tome_r
        if isinstance(tr, str):          # "toN"
            from vitx.nn.tome import aligned_schedule

            tr = aligned_schedule(cfg, int(tr[2:]))
        cfg = cfg.replace(tome_r=tr, tome_train=True)
    if args.freeze_backbone and args.lora_rank:
        print("error: --freeze-backbone conflicts with --lora-rank "
              "(LoRA already freezes the backbone and trains the "
              "adapters + head)", file=sys.stderr)
        return 1
    # freeze policy: LoRA implies frozen backbone (Trainer also defaults
    # this, but the CLI's own make_optimizer calls must mask identically)
    train_filter = ("head" if args.freeze_backbone
                    else "lora" if args.lora_rank else None)

    optimizer = None
    lr_schedule = None
    if args.schedule == "cosine":
        from vitx.train.step import make_optimizer, warmup_cosine

        # optax.MultiSteps advances the inner schedule count once per
        # accum_steps micro-batches, so the schedule's horizon must be in
        # OPTIMIZER UPDATES — otherwise warmup stretches by k and the decay
        # is cut off at the 1/k point
        total_updates = max(
            1, args.epochs * len(train_loader) // args.accum_steps)
        lr_schedule = warmup_cosine(args.lr, total_updates,
                                    args.warmup_steps // args.accum_steps)
        optimizer = make_optimizer(
            schedule=lr_schedule,
            weight_decay=args.weight_decay, grad_clip=args.grad_clip,
            ema_decay=args.ema_decay, accum_steps=args.accum_steps,
            llrd=args.llrd, llrd_depth=cfg.depth,
            optimizer=args.optimizer, trainable=train_filter,
            mu_dtype=args.mu_dtype, wd_exclude=args.wd_exclude)

    init_state = None
    if args.init_from:
        import pathlib

        import jax
        import jax.numpy as jnp

        from vitx.train.checkpoint import transfer_params
        from vitx.train.step import TrainState, make_optimizer

        src = pathlib.Path(args.init_from)
        if src.suffix == ".npz" and not src.name.endswith(".quant.npz"):
            # bare --export-vit npz: MAE encoders always normalize their
            # output (vitx/nn/mae.py). Checkpoint/artifact sources keep
            # the user's cfg — transfer grafts whatever matches.
            cfg = cfg.replace(final_norm=True)
        params = transfer_params(args.init_from, cfg,
                                 jax.random.PRNGKey(args.seed))
        # build the optimizer ONCE and hand the same instance to Trainer:
        # opt_state's chain structure must match the update chain exactly
        # (a const-schedule run with --ema-decay used to init without the
        # EMA link and crash on the first step)
        if optimizer is None:
            optimizer = make_optimizer(
                lr=args.lr, weight_decay=args.weight_decay,
                grad_clip=args.grad_clip, ema_decay=args.ema_decay,
                accum_steps=args.accum_steps,
                llrd=args.llrd, llrd_depth=cfg.depth,
                optimizer=args.optimizer, trainable=train_filter,
                mu_dtype=args.mu_dtype, wd_exclude=args.wd_exclude)
        init_state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=optimizer.init(params))

    train_step = None
    if args.distill_from:
        import jax
        import jax.numpy as jnp

        from vitx.train.checkpoint import restore_eval_params
        from vitx.train.distill import make_distill_train_step
        from vitx.train.step import make_optimizer

        if args.steps_per_dispatch > 1 or args.dp is not None:
            print("error: --distill-from is a single-device single-step "
                  "path (use the library step for mesh runs)",
                  file=sys.stderr)
            return 1
        if args.mixup_alpha or args.cutmix_alpha or args.sam_rho:
            # the injected distill step replaces the Trainer-built step
            # that implements these — refuse rather than silently drop
            print("error: --distill-from builds its own train step; "
                  "--mixup-alpha/--cutmix-alpha/--sam-rho are not applied "
                  "there (combine via the library API instead)",
                  file=sys.stderr)
            return 1
        if train_filter is not None:
            print("error: --distill-from builds its own train step, which "
                  "has no freeze policy — --lora-rank/--freeze-backbone "
                  "are not applied there", file=sys.stderr)
            return 1
        # the teacher's exact geometry comes from its self-describing
        # checkpoint meta (Trainer records the model config) — read it
        # BEFORE restoring so the template matches
        from vitx.train.checkpoint import peek_meta

        tmeta = peek_meta(args.distill_from)
        if tmeta is None:
            print(f"error: no checkpoint under {args.distill_from}",
                  file=sys.stderr)
            return 1
        teacher_cfg = (ViTConfig.from_json(json.dumps(tmeta["config"]))
                       if "config" in tmeta else cfg)
        teacher_params, _ = restore_eval_params(args.distill_from,
                                                teacher_cfg)
        if teacher_cfg.num_classes != cfg.num_classes:
            print(f"error: teacher has {teacher_cfg.num_classes} classes, "
                  f"student {cfg.num_classes}", file=sys.stderr)
            return 1
        teacher_params = jax.tree.map(jnp.asarray, teacher_params)
        if optimizer is None:
            optimizer = make_optimizer(
                lr=args.lr, weight_decay=args.weight_decay,
                grad_clip=args.grad_clip, ema_decay=args.ema_decay,
                accum_steps=args.accum_steps,
                llrd=args.llrd, llrd_depth=cfg.depth,
                optimizer=args.optimizer, trainable=train_filter,
                mu_dtype=args.mu_dtype, wd_exclude=args.wd_exclude)
        dstep = make_distill_train_step(
            cfg, teacher_cfg, optimizer, alpha=args.distill_alpha,
            tau=args.distill_tau, hard=args.distill_hard,
            label_smoothing=args.label_smoothing)
        train_step = lambda s, b, r: dstep(s, b, teacher_params, r)

    if args.loss == "bce":
        if args.label_smoothing or args.class_weights:
            raise SystemExit("--loss bce does not compose with "
                             "--label-smoothing / --class-weights "
                             "(single-label softmax knobs)")
        if args.distill_from or args.distill_token:
            raise SystemExit("--loss bce does not compose with "
                             "distillation (the distill step computes "
                             "single-label CE on the class head)")
    class_weights = None
    if args.class_weights:
        import numpy as np

        if args.class_weights == "balanced":
            labels = getattr(train_ds, "labels", None)
            if labels is None:
                print("error: --class-weights balanced needs a dataset "
                      "exposing .labels", file=sys.stderr)
                return 1
            counts = np.bincount(np.asarray(labels),
                                 minlength=cfg.num_classes)
            w = len(labels) / (cfg.num_classes
                               * np.maximum(counts, 1)).astype(np.float64)
        else:
            w = np.array([float(x) for x in args.class_weights.split(",")])
            if len(w) != cfg.num_classes:
                print(f"error: --class-weights needs {cfg.num_classes} "
                      f"comma-separated values, got {len(w)}",
                      file=sys.stderr)
                return 1
        class_weights = tuple(float(x) for x in w)

    tcfg = TrainerConfig(
        loss=args.loss,
        epochs=args.epochs, lr=args.lr, weight_decay=args.weight_decay,
        class_weights=class_weights,
        grad_clip=args.grad_clip, label_smoothing=args.label_smoothing,
        mixup_alpha=args.mixup_alpha, cutmix_alpha=args.cutmix_alpha,
        sam_rho=args.sam_rho, progress=args.progress,
        checkpoint_dir=args.checkpoint_dir, log_dir=args.log_dir,
        keep_checkpoints=args.keep_checkpoints,
        eval_every=args.eval_every, log_every=args.log_every,
        ema_decay=args.ema_decay, llrd=args.llrd, seed=args.seed,
        optimizer=args.optimizer, mu_dtype=args.mu_dtype,
        wd_exclude=args.wd_exclude,
        train_filter=train_filter,
        early_stop_patience=args.early_stop,
        early_stop_min_delta=args.early_stop_delta,
        steps_per_dispatch=args.steps_per_dispatch,
        accum_steps=args.accum_steps,
        async_checkpoint=args.async_checkpoint,
        pp_microbatches=args.pp_microbatches,
        pp_schedule=args.pp_schedule)
    mesh = None
    if args.sp and args.tp <= 1:
        raise SystemExit("--sp requires --tp > 1 (sequence parallelism "
                         "shards the residual stream over the model axis)")
    if args.ep > 1 and not args.moe_experts:
        raise SystemExit("--ep > 1 requires --moe-experts (expert "
                         "parallelism shards MoE expert weights)")
    if args.ep > 1 and args.pp > 1:
        raise SystemExit("--ep does not compose with --pp (MoE models use "
                         "dp/tp/ep meshes)")
    if args.sp and args.pp > 1:
        raise SystemExit("--sp does not compose with --pp (sequence "
                         "parallelism lives in the pjit tp path; pp x tp "
                         "uses the manual Megatron stage block)")
    if args.pp > 1:
        from vitx.parallel import make_pp_mesh

        dp = args.dp if args.dp is not None else 1
        per_shard = args.batch_size // dp
        if args.batch_size % dp or per_shard % args.pp_microbatches:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by "
                f"--dp {dp} x --pp-microbatches {args.pp_microbatches}")
        mesh = make_pp_mesh(dp=dp, pp=args.pp, tp=args.tp)
    elif args.dp is not None or args.tp > 1 or args.ep > 1:
        from vitx.parallel import make_mesh

        mesh = make_mesh(dp=args.dp, tp=args.tp, ep=args.ep)
    trainer = Trainer(cfg, tcfg, preprocess=pre, mesh=mesh,
                      tp=args.tp > 1, zero1=args.zero == 1,
                      zero2=args.zero == 2, sp=args.sp, ep=args.ep > 1,
                      zero3=args.zero == 3, init_state=init_state,
                      optimizer=optimizer, train_step=train_step,
                      lr_schedule=lr_schedule)
    from vitx.train.loop import NonFiniteLossError

    try:
        history = trainer.fit(train_loader, eval_loader)
    except NonFiniteLossError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if history:
        final = history[-1]
        print(json.dumps({k: v for k, v in final.items()
                          if isinstance(v, (int, float, str))}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
