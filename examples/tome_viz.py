"""ToMe token-merging visualization — which patches merged into which token.

Extends the reference notebook's attention-visualization surface
(``src/vit.ipynb``) to the ToMe encoder: ``encode_tome(...,
return_sources=True)`` tracks, per final merged token, the set of original
patches it absorbed, and ``tome_patch_assignment`` collapses that to a
(grid, grid) integer ownership map. Saves a PNG grid (input | merged-region
map rendered as per-region mean color, the paper's Fig. 5 style).

Usage:
  python examples/tome_viz.py [--preset tiny] [--r 4] [--out tome.png]
  python examples/tome_viz.py --checkpoint ckpt_dir   # trained model
"""

import argparse

import jax
import numpy as np

from vitx import get_config, init_params
from vitx.data import SyntheticDataset
from vitx.nn.tome import encode_tome, tome_patch_assignment


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="tiny")
    p.add_argument("--r", type=int, default=4, help="tokens merged per block")
    p.add_argument("--out", default="tome.png")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir to restore params from")
    args = p.parse_args()

    cfg = get_config(args.preset, compute_dtype="float32", tome_r=args.r)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        from vitx.train import create_train_state
        from vitx.train.checkpoint import restore_latest
        from vitx.train.step import make_optimizer

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

    _, src = jax.jit(
        lambda p, x: encode_tome(p, x, cfg, return_sources=True))(params, x)
    owners = np.asarray(tome_patch_assignment(src, cfg))   # (B, g, g)
    n_final = cfg.num_patches - sum(cfg.tome_schedule)
    print(f"{cfg.num_patches} patches -> {n_final} merged tokens "
          f"(schedule {cfg.tome_schedule})")
    print("distinct regions per image:",
          [len(np.unique(owners[i])) for i in range(4)])

    try:
        from PIL import Image

        ps = cfg.patch_size
        tiles = []
        for i in range(4):
            # paint every merged region with its mean color (paper Fig. 5)
            region = images[i].astype(np.float32).copy()
            for tok in np.unique(owners[i]):
                ys, xs = np.nonzero(owners[i] == tok)
                sel = np.zeros(images[i].shape[:2], bool)
                for y, xx in zip(ys, xs):
                    sel[y * ps:(y + 1) * ps, xx * ps:(xx + 1) * ps] = True
                region[sel] = region[sel].mean(axis=0)
            tiles.append(np.concatenate(
                [images[i], region.astype(np.uint8)], axis=1))
        grid = np.concatenate(tiles, axis=0)
        Image.fromarray(grid).save(args.out)
        print(f"saved {args.out}")
    except Exception as e:  # PIL optional for the demo
        print(f"(skipping PNG: {e})")


if __name__ == "__main__":
    main()
