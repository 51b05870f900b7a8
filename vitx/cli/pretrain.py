"""Self-supervised pretraining CLI: ``python -m vitx.cli.pretrain ...``.

Three pretraining families, all beyond-reference (the reference's
``src/train.py`` is supervised only):

- ``--method mae`` (default): masked-autoencoder pretraining (He et al.
  2022) — mask a large fraction of patches, reconstruct their pixels.
- ``--method dino``: self-distillation (Caron et al. 2021) — a student
  matches the centered/sharpened targets of an EMA teacher across 2 global
  + N local crops. See ``vitx/nn/dino.py``.
- ``--method simclr``: contrastive learning (Chen et al. 2020) — two views
  per image, NT-Xent over in-batch negatives; under ``--dp`` the negatives
  span the GLOBAL batch (XLA gathers at the similarity matmul — no
  hand-rolled all_gather). See ``vitx/nn/simclr.py``.

Either way: checkpoint the run, and optionally export a fine-tune-ready
classifier pytree for ``vitx.cli.train``:

    python -m vitx.cli.pretrain --preset tiny --data synthetic \
        --epochs 20 --checkpoint-dir ckpt/mae --export-vit ckpt/vit_init.npz
    python -m vitx.cli.train --preset tiny --init-from ckpt/vit_init.npz

Labels are ignored; any ``--data`` spec the train CLI accepts works here.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

from vitx.core.config import PRESETS, ViTConfig, get_config
from vitx.data import BatchLoader
from vitx.data.pipeline import device_prefetch, make_preprocess
from vitx.nn.mae import (MAEConfig, create_mae_train_state,
                         make_mae_train_step, mae_to_vit_params)
from vitx.train.checkpoint import (find_latest, restore_latest,
                                   save_checkpoint)
from vitx.train.logging import ScalarWriter
from vitx.train.step import make_optimizer


def build_argparser():
    p = argparse.ArgumentParser(
        prog="vitx.pretrain", description="MAE-pretrain a ViT encoder on TPU")
    p.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    p.add_argument("--config-json", default=None,
                   help="path to a ViTConfig JSON (overrides --preset)")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic', 'cifar10:<dir>' or 'folder:<dir>' "
                        "(labels are ignored)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1.5e-4)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--grad-clip", type=float, default=None,
                   help="global-norm gradient clip (default: none for MAE, "
                        "3.0 for DINO — Caron 2021 §4)")
    p.add_argument("--method", default="mae",
                   choices=["mae", "dino", "simclr"],
                   help="pretraining family: masked autoencoding (He 2022), "
                        "DINO self-distillation (Caron 2021), or SimCLR "
                        "contrastive learning (Chen 2020)")
    p.add_argument("--mask-ratio", type=float, default=0.75)
    p.add_argument("--decoder-dim", type=int, default=512)
    p.add_argument("--decoder-depth", type=int, default=8)
    p.add_argument("--decoder-heads", type=int, default=16)
    p.add_argument("--no-norm-pix", action="store_true",
                   help="raw-pixel targets instead of per-patch normalized")
    d = p.add_argument_group("dino (--method dino)")
    d.add_argument("--local-size", type=int, default=None,
                   help="local-crop resolution (default: image_size // 2, "
                        "rounded down to a patch multiple)")
    d.add_argument("--n-local", type=int, default=6,
                   help="local crops per image (2 global crops are fixed)")
    d.add_argument("--dino-dim", type=int, default=4096,
                   help="prototype count K (paper: 65536 at ImageNet scale)")
    d.add_argument("--dino-hidden", type=int, default=2048)
    d.add_argument("--dino-bottleneck", type=int, default=256)
    d.add_argument("--teacher-temp", type=float, default=0.04)
    d.add_argument("--student-temp", type=float, default=0.1)
    d.add_argument("--teacher-momentum", type=float, default=0.996,
                   help="EMA base; follows a cosine to 1.0 over the run")
    d.add_argument("--center-momentum", type=float, default=0.9)
    d.add_argument("--freeze-last-epochs", type=int, default=1,
                   help="freeze the prototype layer for the first N epochs")
    d.add_argument("--no-norm-last", action="store_true",
                   help="disable weight-norm on the prototype layer")
    s = p.add_argument_group("simclr (--method simclr)")
    s.add_argument("--simclr-dim", type=int, default=128,
                   help="projection output dimension (Chen 2020: 128)")
    s.add_argument("--simclr-hidden", type=int, default=2048)
    s.add_argument("--simclr-temp", type=float, default=0.1,
                   help="NT-Xent temperature")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--export-vit", default=None,
                   help="after training, write a fine-tune-ready classifier "
                        "pytree (npz) with the pretrained encoder weights")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel size: shard pretraining batches "
                        "over a mesh (params/moments replicated)")
    return p


def main(argv=None):
    from vitx.cli.train import make_datasets
    from vitx.core.cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_argparser().parse_args(argv)
    if args.config_json:
        cfg = ViTConfig.from_json(open(args.config_json).read())
    else:
        cfg = get_config(args.preset)
    if args.compute_dtype:
        cfg = cfg.replace(compute_dtype=args.compute_dtype)

    train_ds, _ = make_datasets(args.data, cfg, args.seed)
    # drop_last: neither family has a per-sample valid mask, so a
    # zero-padded final batch would pollute the loss.
    loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                         seed=args.seed, drop_last=True)
    steps_per_epoch = len(loader)

    grad_clip = args.grad_clip
    if grad_clip is None and args.method == "dino":
        grad_clip = 3.0
    opt = make_optimizer(lr=args.lr, weight_decay=args.weight_decay,
                         grad_clip=grad_clip)
    if args.method == "dino":
        from vitx.nn.dino import (DINOConfig, create_dino_train_state,
                                  make_dino_train_step)

        local = args.local_size
        if local is None:
            local = max(cfg.image_size // 2 // cfg.patch_size, 1) \
                * cfg.patch_size
        dcfg = DINOConfig(
            encoder=cfg, local_size=local, n_local=args.n_local,
            out_dim=args.dino_dim, head_hidden=args.dino_hidden,
            head_bottleneck=args.dino_bottleneck,
            student_temp=args.student_temp, teacher_temp=args.teacher_temp,
            center_momentum=args.center_momentum,
            momentum=args.teacher_momentum,
            norm_last_layer=not args.no_norm_last)
        # DINO does its own crops/jitter/blur on device; the host pipeline
        # only scales to [0,1] (mean=None keeps raw intensities — the view
        # builder normalizes AFTER solarize, which needs [0,1]).
        pre = make_preprocess(out_size=None, mean=None, random_flip=False)
        state = create_dino_train_state(jax.random.PRNGKey(args.seed),
                                        dcfg, opt)
        step_fn = make_dino_train_step(
            dcfg, opt, total_steps=args.epochs * steps_per_epoch,
            freeze_last_steps=args.freeze_last_epochs * steps_per_epoch)
        pre_train_flag = False
    elif args.method == "simclr":
        from vitx.nn.simclr import (SimCLRConfig, create_simclr_train_state,
                                    make_simclr_train_step)

        scfg = SimCLRConfig(encoder=cfg, proj_hidden=args.simclr_hidden,
                            proj_dim=args.simclr_dim,
                            temperature=args.simclr_temp)
        # SimCLR builds its views (RRC/jitter/blur) on device from raw
        # [0,1] intensities — same host contract as DINO.
        pre = make_preprocess(out_size=None, mean=None, random_flip=False)
        state = create_simclr_train_state(jax.random.PRNGKey(args.seed),
                                          scfg, opt)
        step_fn = make_simclr_train_step(scfg, opt)
        pre_train_flag = False
    else:
        mcfg = MAEConfig(encoder=cfg, decoder_dim=args.decoder_dim,
                         decoder_depth=args.decoder_depth,
                         decoder_heads=args.decoder_heads,
                         mask_ratio=args.mask_ratio,
                         norm_pix_loss=not args.no_norm_pix)
        pre = make_preprocess(out_size=cfg.image_size)
        state = create_mae_train_state(jax.random.PRNGKey(args.seed),
                                       mcfg, opt)
        step_fn = make_mae_train_step(mcfg, opt)
        pre_train_flag = True

    start_epoch = 0
    if args.checkpoint_dir and find_latest(args.checkpoint_dir) is not None:
        state, meta = restore_latest(args.checkpoint_dir, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"resumed {args.method.upper()} pretraining at "
              f"epoch {start_epoch}")

    mesh = None
    if args.dp is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vitx.parallel import make_mesh

        mesh = make_mesh(dp=args.dp, tp=1)
        # dp-only SPMD: params/moments replicated, batches sharded over
        # ``data`` — the jitted step's shardings follow the committed inputs
        state = jax.device_put(state, NamedSharding(mesh, P()))
        if args.batch_size % args.dp:
            raise SystemExit(f"--batch-size {args.batch_size} must be "
                             f"divisible by --dp {args.dp}")

    rng = jax.random.PRNGKey(args.seed + 1)
    writer = ScalarWriter(args.log_dir) if args.log_dir else None
    last = {}

    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        losses, pending, ents, accs = [], [], [], []
        n_steps = 0
        for batch in device_prefetch(iter(loader)):
            images = pre(batch["image"], jax.random.fold_in(rng, n_steps),
                         train=pre_train_flag)
            if mesh is not None:
                from vitx.parallel import shard_batch

                images = shard_batch({"image": images}, mesh)["image"]
            state, metrics = step_fn(state, {"image": images}, rng)
            pending.append(metrics["loss"])
            if "teacher_entropy" in metrics:
                ents.append(metrics["teacher_entropy"])
            if "contrast_acc" in metrics:
                accs.append(metrics["contrast_acc"])
            n_steps += 1
            if len(pending) >= args.log_every:
                losses.extend(float(x) for x in jax.device_get(pending))
                pending = []
                if writer:
                    writer.add_scalar("Loss/pretrain_batch", losses[-1],
                                      int(state.step))
        losses.extend(float(x) for x in jax.device_get(pending))
        dt = time.time() - t0
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        imgs_per_sec = n_steps * args.batch_size / dt if dt else 0.0
        last = {"epoch": epoch, "loss": mean_loss,
                "images_per_sec": round(imgs_per_sec, 1)}
        extra = ""
        if ents:
            ent = float(jax.device_get(ents[-1]))
            last["teacher_entropy"] = round(ent, 4)
            extra = f" teacher_H {ent:.3f}"
            if writer:
                writer.add_scalar("DINO/teacher_entropy", ent, epoch)
        if accs:
            acc = float(jax.device_get(accs[-1]))
            last["contrast_acc"] = round(acc, 4)
            extra = f" contrast_acc {acc:.3f}"
            if writer:
                writer.add_scalar("SimCLR/contrast_acc", acc, epoch)
        print(f"epoch {epoch}: {args.method}_loss {mean_loss:.4f}{extra} "
              f"({imgs_per_sec:.0f} img/s)")
        if writer:
            writer.add_scalar("Loss/pretrain_epoch", mean_loss, epoch)
        if args.checkpoint_dir:
            save_checkpoint(args.checkpoint_dir, state, epoch,
                            meta={"epoch": epoch, "loss": mean_loss,
                                  "kind": args.method})

    if args.export_vit:
        ft_cfg = cfg.replace(final_norm=True)
        if args.method == "dino":
            from vitx.nn.dino import dino_to_vit_params

            # export the TEACHER — the convention (Caron 2021 §4: the EMA
            # teacher outperforms the student)
            vit_params = dino_to_vit_params(state.teacher, ft_cfg,
                                            jax.random.PRNGKey(args.seed + 2))
        elif args.method == "simclr":
            from vitx.nn.simclr import simclr_to_vit_params

            vit_params = simclr_to_vit_params(
                state.params, ft_cfg, jax.random.PRNGKey(args.seed + 2))
        else:
            vit_params = mae_to_vit_params(state.params, ft_cfg,
                                           jax.random.PRNGKey(args.seed + 2))
        flat = {"/".join(path): np.asarray(leaf) for path, leaf in
                _flatten_strs(vit_params)}
        np.savez(args.export_vit, **flat)
        print(f"exported fine-tune-ready encoder to {args.export_vit} "
              f"(load with vitx.cli.train --init-from)")

    if writer:
        writer.close()
    print(json.dumps(last))
    return 0


def _flatten_strs(tree, prefix=()):
    if isinstance(tree, dict):
        for key in sorted(tree):
            yield from _flatten_strs(tree[key], prefix + (str(key),))
    else:
        yield prefix, tree


def _resize_saved_pos_embed(saved, cfg: ViTConfig):
    """Bilinear-resize a saved (1, prefix+P_from, E) pos_embed to this
    config's grid — the standard higher-resolution fine-tune trick — or
    return None when the mismatch is not a pure grid-size change."""
    import math

    if cfg.parity == "bug_exact":
        # bug_exact stores [patches..., CLS] (reference vit.py:41);
        # resize_pos_embed assumes the corrected prefix-first layout —
        # resizing would blend the CLS row into the grid. Fresh init
        # (with its warning) is the safe answer for that exotic combo.
        return None
    if (saved.ndim != 3 or saved.shape[0] != 1
            or saved.shape[2] != cfg.embed_dim):
        return None
    n_patches = saved.shape[1] - cfg.num_prefix_tokens
    g = math.isqrt(max(n_patches, 0))
    if g <= 0 or g * g != n_patches or g == cfg.grid_size:
        return None
    from vitx.interop.pretrained import resize_pos_embed

    cfg_from = cfg.replace(image_size=g * cfg.patch_size)
    return resize_pos_embed({"pos_embed": saved}, cfg_from, cfg)["pos_embed"]


def load_vit_init(path, cfg: ViTConfig, rng):
    """Load an ``--export-vit`` npz back into a classifier pytree.

    Leaves missing from the file or with mismatched shapes (e.g. the head
    when fine-tuning on a different class count) keep their fresh init —
    EXCEPT pos_embed, whose grid is bilinearly resized when the source was
    trained at a different image size (fine-tune-at-384 from a 224 export
    keeps its positional information; timm/HF imports do the same in
    vitx/interop/pretrained.py:205).
    """
    import warnings

    from vitx.nn.vit import init_params

    template = init_params(rng, cfg)
    data = np.load(path)
    fresh = []

    def pick(kp, leaf):
        key = "/".join(str(k.key) for k in kp)
        if key in data.files and data[key].shape == leaf.shape:
            return jax.numpy.asarray(data[key], leaf.dtype)
        if key == "pos_embed" and key in data.files:
            resized = _resize_saved_pos_embed(data[key], cfg)
            if resized is not None:
                warnings.warn(
                    f"init-from {path}: pos_embed resized from "
                    f"{data[key].shape[1]} to {cfg.pos_len} positions "
                    f"(grid {cfg.grid_size}x{cfg.grid_size})")
                return jax.numpy.asarray(resized, leaf.dtype)
        fresh.append(key)
        return leaf

    out = jax.tree_util.tree_map_with_path(pick, template)
    if fresh:
        warnings.warn(f"init-from {path}: fresh init kept for {fresh} "
                      "(missing or shape-mismatched in the export)")
    return out


if __name__ == "__main__":
    sys.exit(main())
