"""Folder-structured dataset (brain-tumor style): one subfolder per class.

Capability equivalent of the reference's ``BrainTumorDataset``
(``src/BrainTumorDataset.py:10-39``): class list from the directory listing,
eager stratified train/test split at construction with
``sklearn.train_test_split(test_size=0.2, stratify=labels, random_state=42)``
(BrainTumorDataset.py:24-28) so splits are bit-identical to the reference's.
Differences by design: class order is sorted (the reference used raw
``os.listdir`` order, which is filesystem-dependent), and decoding returns
numpy uint8 HWC for the device-side preprocessing stage (vitx.data.pipeline)
instead of applying torchvision transforms on the host.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".gif",
             ".webp"}


def split_indices(labels, *, train: bool, test_size: float | None,
                  random_state: int) -> np.ndarray:
    """The reference's eager stratified split (BrainTumorDataset.py:24-28),
    shared by every random-access dataset (folder, shards): sorted selection
    indices for the requested side, or everything when ``test_size`` is
    None. ONE implementation so the reference-parity semantics
    (test_size=0.2, random_state=42) cannot drift between datasets."""
    idx_all = np.arange(len(labels))
    if test_size is None:
        return idx_all
    from sklearn.model_selection import train_test_split

    idx_tr, idx_te = train_test_split(
        idx_all, test_size=test_size, stratify=labels,
        random_state=random_state)
    return np.sort(idx_tr if train else idx_te)


class FolderDataset:
    """data_dir/<class_name>/*.img ; train/test selected at construction.

    ``test_size=None`` disables the internal stratified split and uses every
    image — for datasets that ship PREDEFINED split directories (the Kaggle
    brain-tumor layout: ``Training/``/``Testing/``); ``make_datasets``
    (vitx/cli/train.py) auto-detects those and builds one full FolderDataset
    per split directory."""

    def __init__(self, data_dir, *, train: bool = True,
                 test_size: float | None = 0.2,
                 random_state: int = 42, image_size: int | None = None):
        self.data_dir = pathlib.Path(data_dir)
        self.image_size = image_size
        self.classes = sorted(
            d for d in os.listdir(self.data_dir)
            if (self.data_dir / d).is_dir())
        if not self.classes:
            raise ValueError(f"no class subfolders under {data_dir}")
        # {index: name}, the reference's class_encoding (BrainTumorDataset.py:15)
        self.class_encoding = dict(enumerate(self.classes))

        paths, labels = [], []
        for idx, name in enumerate(self.classes):
            for p in sorted((self.data_dir / name).iterdir()):
                if p.suffix.lower() in _IMG_EXTS:
                    paths.append(p)
                    labels.append(idx)
        if not paths:
            raise ValueError(f"no images under {data_dir}")
        labels = np.array(labels, np.int32)

        sel = split_indices(labels, train=train, test_size=test_size,
                            random_state=random_state)
        self.paths = [paths[i] for i in sel]
        self.labels = labels[sel]

    def __len__(self):
        return len(self.paths)

    def get_example(self, i: int):
        """-> (uint8 HWC RGB image, int label). Decode + RGB-convert + resize
        on host (the device pipeline handles normalize/augment)."""
        from PIL import Image

        img = Image.open(self.paths[i])
        if img.mode != "RGB":       # reference's Lambda RGB guard (train.py:152)
            img = img.convert("RGB")
        if self.image_size is not None:
            img = img.resize((self.image_size, self.image_size),
                             Image.BILINEAR)
        return np.asarray(img, np.uint8), int(self.labels[i])
