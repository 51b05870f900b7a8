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

    def _generate(self, i: int):
        label = int(self.labels[i])
        rng = np.random.default_rng((self._seed, i))
        S = self.image_size
        yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
        angle = np.pi * label / self.num_classes
        freq = 3.0 + 2.0 * label
        wave = np.sin(2 * np.pi * freq *
                      (np.cos(angle) * xx + np.sin(angle) * yy))
        img = 0.5 + 0.35 * wave[..., None] + \
            self.noise * rng.standard_normal((S, S, self.num_channels))
        img = np.clip(img, 0.0, 1.0)
        return (img * 255).astype(np.uint8), label
