"""Device-resident dataset: the whole split lives in HBM, batches are
device-side gathers.

The TPU-native answer to the reference's host-side
``DataLoader(num_workers=4)`` (``src/train.py:161-162``) for datasets that
fit accelerator memory (CIFAR-10 decoded = 0.18 GB; 12.8k 224x224
procedural images = 1.9 GB — both trivially fit a 16 GB chip): upload the
uint8 arrays ONCE, then every training batch is a ``jnp.take`` executed on
device, so steady-state training moves ZERO image bytes over the host link.
Decode rate and host->device bandwidth — the two measured ceilings of the
host pipeline (docs/data.md, bench_11) — drop out of the loop entirely;
augmentation already runs on device (vitx/data/pipeline.py), so the host's
per-step work is dispatch only.

Batch ORDER is bit-identical to ``BatchLoader``'s (same
``default_rng((seed, epoch)).shuffle`` rule, same ragged-final-batch
padding+mask), so a device-cached run follows the exact trajectory of a
host-loaded run — pinned by ``tests/test_device_cache.py``.

The upload is chunked: the axon tunnel moves 16-40 MB/s and a single
multi-GB transfer both stalls and (on some hosts) buffers the whole payload;
64 MB slices bound host memory and give transfer progress. On a real TPU
host (PCIe, >10 GB/s) the chunking is just harmless.

Mesh runs: the cache lives on the default device and the Trainer re-places
each gathered batch onto the mesh (a device-to-device copy over ICI — no
host bytes). Sharding the cached ARRAY itself over the data axis (each
rank holding 1/dp of the split, gathers local) is the multi-host follow-on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _chunked_device_put(arr: np.ndarray, device=None,
                        chunk_bytes: int = 64 << 20):
    rows = max(1, int(chunk_bytes // max(arr[:1].nbytes, 1)))
    parts = [jax.device_put(arr[i:i + rows], device)
             for i in range(0, len(arr), rows)]
    if len(parts) == 1:
        return parts[0]
    out = jnp.concatenate(parts)
    out.block_until_ready()
    return out


@jax.jit
def _gather(images, labels, idx, mask):
    # mask zeroes the padded rows of a ragged final batch, matching
    # BatchLoader's zero padding bit-exactly (full batches: mask is ones)
    img = jnp.take(images, idx, axis=0)
    img = img * mask[:, None, None, None].astype(img.dtype)
    lab = jnp.take(labels, idx, axis=0)
    # labels may be (B,) ints or (B, C) multi-hot — broadcast per row
    lab = lab * mask.reshape((-1,) + (1,) * (lab.ndim - 1)).astype(lab.dtype)
    return {"image": img, "label": lab}


class DeviceBatchLoader:
    """BatchLoader-compatible iterable whose batches are device-resident
    gathers from an HBM-cached split (see module docstring).

    ``dataset``: anything with ``materialize() -> (images u8, labels)``
    (ProceduralShapes), or ``get_example``/``__len__`` (SyntheticDataset,
    FolderDataset, ...) — examples are stacked host-side once, then
    uploaded. Yields ``{"image", "label", "mask"}`` with static shapes.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, device=None):
        if hasattr(dataset, "materialize"):
            images, labels = dataset.materialize()
        else:
            ex = [dataset.get_example(i) for i in range(len(dataset))]
            images = np.stack([e[0] for e in ex])
            labels = np.array([e[1] for e in ex], np.int32)
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._seed = seed
        self._epoch = 0
        self._n = len(labels)
        self._images = _chunked_device_put(np.ascontiguousarray(images),
                                           device)
        self._labels = jax.device_put(np.asarray(labels, np.int32), device)
        self._ones = np.ones(batch_size, np.int32)

    @property
    def nbytes(self) -> int:
        return self._images.nbytes + self._labels.nbytes

    def __len__(self):
        if self.drop_last:
            return self._n // self.batch_size
        return (self._n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch — BatchLoader's (seed, epoch) rule."""
        self._epoch = epoch

    def __iter__(self):
        order = np.arange(self._n)
        if self.shuffle:
            np.random.default_rng((self._seed, self._epoch)).shuffle(order)
        stop = ((self._n // self.batch_size) * self.batch_size
                if self.drop_last else self._n)
        B = self.batch_size
        for start in range(0, stop, B):
            idx = order[start:start + B]
            pad = B - len(idx)
            mask = self._ones
            if pad:
                idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
                mask = np.ones(B, np.int32)
                mask[B - pad:] = 0
            batch = _gather(self._images, self._labels,
                            jnp.asarray(idx, jnp.int32),
                            jnp.asarray(mask))
            batch["mask"] = mask
            yield batch
