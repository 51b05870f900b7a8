"""Deterministic synthetic classification dataset.

A learnable, reproducible stand-in for the brain-tumor / CIFAR sets in the
no-egress environment: each class is an oriented sinusoidal grating with a
class-dependent frequency plus seeded noise, so models genuinely have to (and
can) learn the decision boundary. Used by tests, examples, and bench warmup.
"""

from __future__ import annotations

import numpy as np


class SyntheticDataset:
    def __init__(self, *, num_examples: int = 512, image_size: int = 64,
                 num_classes: int = 4, num_channels: int = 3, seed: int = 0,
                 noise: float = 0.3, cache: bool = False):
        """``cache=True`` materializes every example up front (u8 in RAM) so
        iteration costs an index, like a decoded-image cache — use for
        throughput benchmarks where the grating synthesis (~ms/example)
        would otherwise dominate."""
        self.image_size = image_size
        self.num_classes = num_classes
        self.num_channels = num_channels
        self.noise = noise
        self._seed = seed
        rng = np.random.default_rng(seed)
        self.labels = rng.integers(0, num_classes,
                                   size=num_examples).astype(np.int32)
        self.classes = [f"class_{i}" for i in range(num_classes)]
        self.class_encoding = dict(enumerate(self.classes))
        self._cache = None
        if cache:
            self._cache = [self._generate(i) for i in range(num_examples)]

    def __len__(self):
        return len(self.labels)

    def get_example(self, i: int):
        if self._cache is not None:
            return self._cache[i]
        return self._generate(i)

    def _wave(self, label: int):
        S = self.image_size
        yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
        angle = np.pi * label / self.num_classes
        freq = 3.0 + 2.0 * label
        return np.sin(2 * np.pi * freq *
                      (np.cos(angle) * xx + np.sin(angle) * yy))

    def _generate(self, i: int):
        label = int(self.labels[i])
        rng = np.random.default_rng((self._seed, i))
        S = self.image_size
        wave = self._wave(label)
        img = 0.5 + 0.35 * wave[..., None] + \
            self.noise * rng.standard_normal((S, S, self.num_channels))
        img = np.clip(img, 0.0, 1.0)
        return (img * 255).astype(np.uint8), label


class SyntheticMultiLabelDataset(SyntheticDataset):
    """Multi-label variant: each image SUPERIMPOSES the gratings of a random
    1..max_active subset of classes; the label is the (C,) multi-hot set.
    The task is genuinely multi-label — gratings are (near-)orthogonal
    spatial frequencies, so each class's presence is independently
    detectable. Drives ``--loss bce`` (sigmoid BCE + micro/macro F1 + mAP).
    """

    def __init__(self, *, max_active: int = 3, **kw):
        if kw.get("cache"):
            raise ValueError("cache=True is not supported for the "
                             "multi-label variant")
        super().__init__(**kw)
        n = len(self.labels)
        rng = np.random.default_rng(self._seed + 0x31)
        hot = np.zeros((n, self.num_classes), np.int32)
        for i in range(n):
            k = int(rng.integers(1, min(max_active, self.num_classes) + 1))
            hot[i, rng.choice(self.num_classes, size=k, replace=False)] = 1
        self.labels = hot                                  # (N, C) multi-hot

    def _generate(self, i: int):
        hot = self.labels[i]
        rng = np.random.default_rng((self._seed, i, 0x31))
        S = self.image_size
        active = np.flatnonzero(hot)
        # 1/sqrt(k) superposition: per-class amplitude shrinks slower than
        # the mean's 1/k while the total stays in the clip range — keeps
        # every active grating individually detectable
        wave = np.sum([self._wave(int(c)) for c in active],
                      axis=0) / np.sqrt(len(active))
        img = 0.5 + 0.35 * wave[..., None] + \
            self.noise * rng.standard_normal((S, S, self.num_channels))
        img = np.clip(img, 0.0, 1.0)
        return (img * 255).astype(np.uint8), hot
