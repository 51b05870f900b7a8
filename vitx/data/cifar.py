"""CIFAR-10 from a local copy of the standard python-pickle batches.

The reference trains on torchvision's CIFAR10 with ``download=True``
(``src/train.py:157-159``). TPU pods run with no egress, so this loader reads
an already-present ``cifar-10-batches-py/`` directory (the exact files the
torchvision download produces) and never touches the network. Use
``SyntheticDataset`` when no local copy exists.
"""

from __future__ import annotations

import pathlib
import pickle

import numpy as np

CLASSES = ["airplane", "automobile", "bird", "cat", "deer",
           "dog", "frog", "horse", "ship", "truck"]


class CIFAR10:
    def __init__(self, data_dir, *, train: bool = True):
        root = pathlib.Path(data_dir)
        if (root / "cifar-10-batches-py").is_dir():
            root = root / "cifar-10-batches-py"
        files = ([f"data_batch_{i}" for i in range(1, 6)] if train
                 else ["test_batch"])
        images, labels = [], []
        for name in files:
            path = root / name
            if not path.exists():
                raise FileNotFoundError(
                    f"{path} not found — CIFAR-10 must already be on disk "
                    "(no-egress environment); use SyntheticDataset otherwise")
            with open(path, "rb") as f:
                batch = pickle.load(f, encoding="bytes")
            images.append(batch[b"data"])
            labels.extend(batch[b"labels"])
        data = np.concatenate(images).reshape(-1, 3, 32, 32)
        self.images = np.ascontiguousarray(
            data.transpose(0, 2, 3, 1))           # NHWC uint8
        self.labels = np.array(labels, np.int32)
        self.classes = list(CLASSES)
        self.class_encoding = dict(enumerate(self.classes))

    def __len__(self):
        return len(self.labels)

    def get_example(self, i: int):
        return self.images[i], int(self.labels[i])
