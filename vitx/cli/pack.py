"""Pack a dataset into tar shards: ``python -m vitx.cli.pack``.

Converts any ``--data`` source the train CLI accepts (``folder:DIR``,
``cifar10:DIR``, ``synthetic``) into WebDataset-convention tar shards
(vitx/data/shards.py) under ``--out/train`` + ``--out/val``, ready for
``train --data shards:OUT``.

``--format raw`` stores pre-decoded uint8 ``.npy`` members at
``--image-size`` resolution — the production input-pipeline form: serving a
raw member is one seek+read+frombuffer (~15k img/s/core measured) where
JPEG decode+resize is ~0.5-1k img/s/core, so on few-core hosts raw shards
are what keep the host pipeline ahead of the device (see bench_11 and
docs/data.md). The trade is size: ~3.3x a quality-90 JPEG at 224x224.

The reference has no packing tool (its DataLoader re-decodes every epoch,
src/train.py:161-162); this fulfils the same role as WebDataset/tfrecord
preparation scripts in production pipelines.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="vitx.pack", description=__doc__)
    p.add_argument("--data", required=True,
                   help="source dataset: folder:DIR | cifar10:DIR | "
                        "synthetic (same specs as the train CLI)")
    p.add_argument("--out", required=True,
                   help="output directory (train/ + val/ created inside)")
    p.add_argument("--format", default="raw",
                   choices=("raw", "png", "jpeg"),
                   help="member encoding: raw = pre-decoded uint8 .npy "
                        "(fastest to load), png lossless, jpeg small")
    p.add_argument("--image-size", type=int, default=224,
                   help="resolution packed members are resized to (raw "
                        "members especially should match the train size)")
    p.add_argument("--shard-size", type=int, default=1000,
                   help="images per .tar shard")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from vitx import get_config
    from vitx.cli.train import make_datasets
    from vitx.data.shards import write_shards

    # make_datasets needs a config only for image_size/num_classes defaults
    # patch_size=1 always divides: no model is built here, the config only
    # carries image_size/num_classes into make_datasets
    cfg = get_config("tiny").replace(image_size=args.image_size,
                                     patch_size=1)
    train_ds, eval_ds = make_datasets(args.data, cfg, args.seed)

    import pathlib

    out = pathlib.Path(args.out)
    for split, ds in (("train", train_ds), ("val", eval_ds)):
        t0 = time.perf_counter()
        paths = write_shards(ds, out / split, shard_size=args.shard_size,
                             image_format=args.format)
        dt = time.perf_counter() - t0
        total = sum(p.stat().st_size for p in paths)
        print(json.dumps({
            "split": split, "images": len(ds), "shards": len(paths),
            "bytes": total, "format": args.format,
            "bytes_per_image": round(total / max(len(ds), 1)),
            "pack_secs": round(dt, 1),
        }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
