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


def _random_resized_crop(x, rng, out_size: int, scale_range, ratio_range):
    """Per-sample random-resized crop with STATIC output shapes.

    Each sample gets its own crop box (area in ``scale_range`` of the image,
    aspect in ``ratio_range``); the crop+resize is one vmapped
    ``jax.image.scale_and_translate`` — per-sample affine resampling with a
    fixed (S, S) output, so the whole batch stays a single static-shape op
    on device (no host-side PIL crops, no dynamic shapes).
    """
    B, H, W, C = x.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = jax.random.uniform(k1, (B,), minval=scale_range[0],
                              maxval=scale_range[1])
    log_r = jax.random.uniform(k2, (B,),
                               minval=jnp.log(ratio_range[0]),
                               maxval=jnp.log(ratio_range[1]))
    ratio = jnp.exp(log_r)
    ch = jnp.clip(jnp.sqrt(area / ratio) * H, 1.0, float(H))
    cw = jnp.clip(jnp.sqrt(area * ratio) * W, 1.0, float(W))
    y0 = jax.random.uniform(k3, (B,)) * (H - ch)
    x0 = jax.random.uniform(k4, (B,)) * (W - cw)
    sy, sx = out_size / ch, out_size / cw

    def one(img, sy, sx, ty, tx):
        return jax.image.scale_and_translate(
            img, (out_size, out_size, C), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([ty, tx]), method="linear")

    return jax.vmap(one)(x, sy, sx, -y0 * sy, -x0 * sx)


def _color_jitter(x, rng, strength: float):
    """Per-sample brightness/contrast/saturation jitter on [0,1] images."""
    B = x.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    lo, hi = 1.0 - strength, 1.0 + strength

    def factors(k):
        return jax.random.uniform(k, (B, 1, 1, 1), minval=lo, maxval=hi)

    x = x * factors(k1)                                   # brightness
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * factors(k2) + mean                   # contrast
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * factors(k3) + gray                   # saturation
    return jnp.clip(x, 0.0, 1.0)


def preprocess(images_u8, rng, *, out_size: int | None, mean, std,
               random_flip: bool, train: bool,
               random_crop: bool = False, crop_scale=(0.6, 1.0),
               crop_ratio=(3 / 4, 4 / 3), color_jitter: float | None = None,
               randaug_layers: int = 0, randaug_magnitude: float = 9.0,
               random_erase: float | None = None):
    """(B, H, W, C) uint8 -> (B, S, S, C) float32 on device."""
    x = images_u8.astype(jnp.float32) / 255.0
    B, _, _, C = images_u8.shape
    size = out_size if out_size is not None else images_u8.shape[1]
    if train and random_crop:
        rng, k = jax.random.split(rng)
        x = _random_resized_crop(x, k, size, crop_scale, crop_ratio)
    elif out_size is not None and images_u8.shape[1] != out_size:
        x = jax.image.resize(x, (B, out_size, out_size, C), method="bilinear")
    if train and color_jitter:
        rng, k = jax.random.split(rng)
        x = _color_jitter(x, k, color_jitter)
    if train and randaug_layers:
        from vitx.data.randaugment import rand_augment
        rng, k = jax.random.split(rng)
        x = rand_augment(x, k, num_layers=randaug_layers,
                         magnitude=randaug_magnitude)
    if mean is not None:
        x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    if train and random_flip:
        rng, k = jax.random.split(rng)
        flip = jax.random.bernoulli(k, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
    if train and random_erase:
        from vitx.data.randaugment import random_erasing
        rng, k = jax.random.split(rng)
        x = random_erasing(x, k, prob=random_erase)
    return x


def make_preprocess(*, out_size: int | None = None, mean=IMAGENET_MEAN,
                    std=IMAGENET_STD, random_flip: bool = True,
                    random_crop: bool = False, crop_scale=(0.6, 1.0),
                    color_jitter: float | None = None,
                    randaug_layers: int = 0, randaug_magnitude: float = 9.0,
                    random_erase: float | None = None):
    """Build jitted (images_u8, rng, train) -> float images.

    ``mean=None`` disables normalization (reference parity — the reference
    applies none, SURVEY §2.6 / train.py:151-155). ``random_crop`` /
    ``color_jitter`` / ``randaug_layers`` (RandAugment, timm ``rand-mM-nN``
    semantics) / ``random_erase`` add the standard ViT train-time
    augmentations, all device-resident (train=True only; eval takes the
    plain resize path).
    """
    fn = partial(preprocess, out_size=out_size, mean=mean,
                 std=None if mean is None else std, random_flip=random_flip,
                 random_crop=random_crop, crop_scale=tuple(crop_scale),
                 color_jitter=color_jitter, randaug_layers=randaug_layers,
                 randaug_magnitude=randaug_magnitude,
                 random_erase=random_erase)
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
