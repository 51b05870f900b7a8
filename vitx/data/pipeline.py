"""TPU-resident preprocessing: uint8 batch -> normalized, augmented floats.

The reference preprocesses on the host with torchvision transforms + 4-16
DataLoader worker processes (``src/train.py:151-162``). Here the host only
decodes to uint8; everything else — dtype cast, [0,1] scaling, mean/std
normalization, resize, random horizontal flip — is ONE jitted function that
XLA fuses into the first device computation (the BASELINE.json north star:
"resize, normalize, flips becomes a TPU-resident preprocessing stage").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# ImageNet stats, the conventional default; the reference itself used NO
# normalization (SURVEY §2.6) — pass mean=0, std=1 for parity.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess(images_u8, rng, *, out_size: int | None, mean, std,
               random_flip: bool, train: bool):
    """(B, H, W, C) uint8 -> (B, S, S, C) float32 on device."""
    x = images_u8.astype(jnp.float32) / 255.0
    if out_size is not None and images_u8.shape[1] != out_size:
        B, _, _, C = images_u8.shape
        x = jax.image.resize(x, (B, out_size, out_size, C), method="bilinear")
    if mean is not None:
        x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    if train and random_flip:
        flip = jax.random.bernoulli(rng, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
    return x


def make_preprocess(*, out_size: int | None = None, mean=IMAGENET_MEAN,
                    std=IMAGENET_STD, random_flip: bool = True):
    """Build jitted (images_u8, rng, train) -> float images.

    ``mean=None`` disables normalization (reference parity — the reference
    applies none, SURVEY §2.6 / train.py:151-155).
    """
    fn = partial(preprocess, out_size=out_size, mean=mean,
                 std=None if mean is None else std, random_flip=random_flip)
    return jax.jit(fn, static_argnames=("train",))


def device_prefetch(iterator, *, size: int = 2, sharding=None):
    """Double-buffered host->device transfer.

    Yields batches (dicts of arrays) already resident on device, keeping
    ``size`` transfers in flight: batch N+1's (async) ``device_put`` overlaps
    batch N's compute, instead of a synchronous H2D stall at the start of
    every step. ``sharding``: a Sharding (or dict key->Sharding) to place
    batches onto a mesh (the data-parallel path); None = default device.
    """
    import collections

    def place(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        if isinstance(sharding, dict):
            return {key: jax.device_put(val, sharding.get(key))
                    for key, val in batch.items()}
        return {key: jax.device_put(val, sharding)
                for key, val in batch.items()}

    buf = collections.deque()
    for batch in iterator:
        buf.append(place(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
