"""Attention-map extraction and rollout — the vit.ipynb analysis surface.

The reference notebook visualizes per-head attention weights stashed on each
MultiHeadAttention module (``src/vit.ipynb``; transformer.py:39,48). Here the
same capability is a first-class API: ``forward_with_attn`` returns per-layer,
per-head probabilities and ``attention_rollout`` chains them into an
input-attribution heatmap. Saves a PNG grid (input | rollout overlay).

``--method gradcam`` swaps in the class-specific Grad-CAM heatmap
(vitx/nn/saliency.py; ``--target-class`` overrides the predicted class).

Usage:
  python examples/attention_rollout.py [--preset tiny] [--out rollout.png]
  python examples/attention_rollout.py --checkpoint ckpt_dir  # trained model
  python examples/attention_rollout.py --method gradcam --target-class 2
"""

import argparse

import jax
import numpy as np

from vitx import attention_rollout, forward_with_attn, get_config, init_params
from vitx.data import SyntheticDataset
from vitx.nn.rollout import rollout_heatmap


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="tiny")
    p.add_argument("--out", default="rollout.png")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir to restore params from")
    p.add_argument("--method", default="rollout",
                   choices=["rollout", "gradcam"],
                   help="rollout: class-agnostic attention rollout; "
                        "gradcam: class-specific saliency")
    p.add_argument("--target-class", type=int, default=None,
                   help="gradcam target class (default: predicted class)")
    args = p.parse_args()

    cfg = get_config(args.preset, compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        from vitx.train.checkpoint import restore_latest
        from vitx.train.step import make_optimizer
        from vitx.train import create_train_state

        tmpl = create_train_state(jax.random.PRNGKey(0), cfg,
                                  make_optimizer())
        state, meta = restore_latest(args.checkpoint, tmpl)
        if meta is None:
            raise SystemExit(f"no checkpoint under {args.checkpoint}")
        params = state.params
        print(f"restored epoch {meta['epoch']}")

    ds = SyntheticDataset(num_examples=4, image_size=cfg.image_size,
                          num_classes=cfg.num_classes,
                          num_channels=cfg.num_channels)
    images = np.stack([ds.get_example(i)[0] for i in range(4)])
    x = images.astype(np.float32) / 255.0

    if args.method == "gradcam":
        from vitx import grad_cam

        cam, logits = jax.jit(
            lambda p, x: grad_cam(p, x, cfg, class_idx=args.target_class)
        )(params, x)
        heat = np.asarray(cam).reshape(-1, cfg.grid_size, cfg.grid_size)
        preds = np.asarray(logits).argmax(-1)
        print("predictions:", preds.tolist())
        print("grad-cam target:",
              args.target_class if args.target_class is not None
              else "predicted class")
    else:
        logits, probs = jax.jit(
            lambda p, x: forward_with_attn(p, x, cfg))(params, x)
        roll = attention_rollout(probs)
        heat = np.asarray(rollout_heatmap(roll, cfg.grid_size))
        preds = np.asarray(logits).argmax(-1)
        print("predictions:", preds.tolist())
        print("rollout heatmap shape:", heat.shape,
              "row sums:", np.asarray(roll).sum(-1).round(4).tolist())

    try:
        from PIL import Image

        tiles = []
        for i in range(4):
            h = heat[i] / max(float(heat[i].max()), 1e-8)
            h_img = np.asarray(
                Image.fromarray((h * 255).astype(np.uint8)).resize(
                    (cfg.image_size, cfg.image_size), Image.BILINEAR))
            overlay = images[i].astype(np.float32)
            overlay[..., 0] = np.clip(
                overlay[..., 0] * 0.4 + h_img * 0.6, 0, 255)
            tiles.append(np.concatenate(
                [images[i], overlay.astype(np.uint8)], axis=1))
        grid = np.concatenate(tiles, axis=0)
        Image.fromarray(grid).save(args.out)
        print(f"saved {args.out}")
    except Exception as e:  # PIL optional for the demo
        print(f"(skipping PNG: {e})")


if __name__ == "__main__":
    main()
