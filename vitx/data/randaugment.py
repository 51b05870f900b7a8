"""Device-resident RandAugment (Cubuk et al. 2020) for TPU input pipelines.

The reference preprocesses on the host with torchvision transforms
(``src/train.py:151-162``); timm-style ViT recipes add RandAugment there as
PIL ops on the CPU workers. On TPU the same policy is expressed as pure XLA
ops on the whole uint8->float batch so it fuses into the first device
computation and never touches the host:

- every GEOMETRIC op (rotate, shear-x/y, translate-x/y) is a 2x3 affine;
  per sample we build the matrix for the chosen op (identity when a color op
  was drawn) and run ONE bilinear warp per round. The warp itself is
  GATHER-FREE: a TPU gather retires ~1 element/cycle (the map_coordinates
  form measured 251 ms/pass at b128x224^2), so the warp runs as the
  Catmull-Smith two-pass decomposition with tent-weight MATMULS on the MXU
  (``_warp_mxu``/``_line_resample``, ~4 ms/pass — 60x);
- every COLOR op (brightness, saturation, contrast, sharpness, posterize,
  solarize, autocontrast, invert) is a cheap elementwise/reduce pass applied
  through a per-sample select mask, so the batch stays a single static-shape
  program with no data-dependent control flow.

Magnitude semantics follow timm's ``rand-m{M}-n{N}`` scale (M in [0, 10],
signed ops flip direction with probability 1/2). Inputs and outputs are
float images in [0, 1]; geometric fill value is mid-gray (0.5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# op indices: 0..5 geometric, 6..13 color
_OPS = ("identity", "rotate", "shear_x", "shear_y", "translate_x",
        "translate_y", "brightness", "saturation", "contrast", "sharpness",
        "posterize", "solarize", "autocontrast", "invert")
_N_OPS = len(_OPS)
_FILL = 0.5


def _affine_params(op, mag_signed, height, width):
    """Per-sample 2x3 output->input affine for the geometric ops.

    ``op``: scalar int index; ``mag_signed``: scalar in [-1, 1] (m/10 with a
    random sign). Rotation ±30 deg, shear ±0.3, translation ±0.45 * size at
    full magnitude (timm's increasing-with-M ranges).
    """
    theta = mag_signed * (30.0 * jnp.pi / 180.0)
    shear = mag_signed * 0.3
    tx = mag_signed * 0.45 * width
    ty = mag_signed * 0.45 * height
    c, s = jnp.cos(theta), jnp.sin(theta)
    one, zero = jnp.ones_like(theta), jnp.zeros_like(theta)

    def mat(row_x, row_y):
        return jnp.stack([jnp.stack(row_x), jnp.stack(row_y)])

    mats = jnp.stack([
        mat([one, zero, zero], [zero, one, zero]),    # identity
        mat([c, -s, zero], [s, c, zero]),             # rotate
        mat([one, shear, zero], [zero, one, zero]),   # shear_x
        mat([one, zero, zero], [shear, one, zero]),   # shear_y
        mat([one, zero, tx], [zero, one, zero]),      # translate_x
        mat([one, zero, zero], [zero, one, ty]),      # translate_y
    ])
    idx = jnp.where(op < 6, op, 0)    # color ops -> identity matrix
    return mats[idx]


def _warp(img, mat):
    """Bilinear warp of one (H, W, C) image by an output->input 2x3 affine
    about the image center; out-of-bounds reads fill with mid-gray."""
    height, width, _ = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    cy, cx = (height - 1) / 2.0, (width - 1) / 2.0
    # map output pixel -> input pixel (inverse warp), centered
    src_y = mat[1, 0] * (xx - cx) + mat[1, 1] * (yy - cy) + mat[1, 2] + cy
    src_x = mat[0, 0] * (xx - cx) + mat[0, 1] * (yy - cy) + mat[0, 2] + cx
    oob = ((src_y < 0) | (src_y > height - 1)
           | (src_x < 0) | (src_x > width - 1))[..., None]
    coords = jnp.stack([src_y, src_x])
    warped = jax.vmap(
        lambda ch: jax.scipy.ndimage.map_coordinates(
            ch, coords, order=1, mode="nearest"),
        in_axes=-1, out_axes=-1)(img)
    return jnp.where(oob, _FILL, warped)


def _line_resample(x, scale, off, fill=_FILL, precision=None):
    """Gather-free 1D linear resample along axis 2 via MXU matmuls.

    ``x``: (B, L, W, C) — L independent lines per sample, each resampled
    along its length-W axis; ``scale``: (B,) per-sample source step;
    ``off``: (B, L) per-line source offset — output element j of line
    (b, l) reads source position ``scale[b] * j + off[b, l]``.

    Why matmuls: a TPU gather retires ~1 element/cycle, so the
    map-coordinates warp measured 251 ms per pass at (128, 224, 224, 3)
    (round-5 devloop). The linear-interp weights form a (W_in, W_out)
    tent matrix with <=2 nonzeros per column; building it densely in row
    blocks and contracting on the MXU measures ~4 ms — 60x faster. Out-of-
    range columns get weight < 1 and are topped up with ``fill`` (the PIL
    fill-color semantics, with a 1-px soft edge instead of a hard cut).
    """
    B, L, W, C = x.shape
    rb = 8
    while L % rb:
        rb -= 1
    cols = jnp.arange(W, dtype=jnp.float32)

    def block(_, inp):
        rows, o = inp                           # (B, rb, W, C), (B, rb)
        pos = scale[:, None, None] * cols[None, None, :] + o[:, :, None]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(
            pos[:, :, None, :] - cols[None, None, :, None]))
        out = jnp.einsum("brvc,brvx->brxc", rows, w, precision=precision)
        wsum = jnp.sum(w, axis=2)               # (B, rb, W_out)
        return None, out + (1.0 - wsum)[..., None] * fill

    xr = jnp.moveaxis(x.reshape(B, L // rb, rb, W, C), 1, 0)
    orr = jnp.moveaxis(off.reshape(B, L // rb, rb), 1, 0)
    _, out = jax.lax.scan(block, None, (xr, orr))
    return jnp.moveaxis(out, 0, 1).reshape(B, L, W, C)


def _warp_mxu(x, mats, fill=_FILL):
    """Batched inverse-affine bilinear warp with NO gathers: the Catmull-
    Smith two-pass decomposition — pass 1 resamples every input ROW along
    x, pass 2 every output COLUMN along y (on the transposed tensor), both
    through ``_line_resample``'s MXU tent-weight matmuls.

    Exact for the separable (two-pass) bilinear model; matches the direct
    2-D gather warp to interpolation-model differences only
    (tests/test_data.py::test_warp_mxu_matches_gather). Valid while
    ``|m11|`` is bounded away from 0 — RandAugment's op set keeps m11 = 1
    (identity/shears/translates) or cos(30°) (rotate), so the decomposition
    never degenerates.

    ``x``: (B, H, W, C); ``mats``: (B, 2, 3) output->input affines about
    the image center (the ``_affine_params`` convention).
    """
    B, H, W, C = x.shape
    a, b_, tx = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    c, d, ty = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    # pass 1, input row v: x_src = alpha*(j - cx) + beta*(v - cy) + gamma + cx
    alpha = (a * d - b_ * c) / d
    beta = b_ / d
    gamma = tx - b_ * ty / d
    v = jnp.arange(H, dtype=jnp.float32)
    off1 = (beta[:, None] * (v[None, :] - cy) + gamma[:, None]
            + cx - alpha[:, None] * cx)
    tmp = _line_resample(x, alpha, off1, fill)
    # pass 2, output column u: y_src = c*(u - cx) + d*(w - cy) + ty + cy
    u = jnp.arange(W, dtype=jnp.float32)
    off2 = (c[:, None] * (u[None, :] - cx) + ty[:, None]
            + cy - d[:, None] * cy)
    out_t = _line_resample(jnp.swapaxes(tmp, 1, 2), d, off2, fill)
    return jnp.swapaxes(out_t, 1, 2)


def _blend(a, b, factor):
    """PIL.ImageEnhance semantics: factor 0 -> a (degenerate), 1 -> b."""
    return a + factor * (b - a)


def _color_ops(x, op, mag_signed):
    """Masked elementwise chain: apply the selected color op per sample.

    ``x``: (B, H, W, C) in [0, 1]; ``op``: (B,) int; ``mag_signed``: (B,)
    in [-1, 1]. Each candidate transform is computed batch-wide (cheap
    elementwise/reduce work) and selected per sample — no dynamic control
    flow, everything fuses.
    """
    bsel = lambda i: (op == i)[:, None, None, None]
    factor = (1.0 + 0.9 * mag_signed)[:, None, None, None]  # enhance ops
    mag = jnp.abs(mag_signed)[:, None, None, None]

    out = x
    # brightness / saturation / contrast / sharpness (ImageEnhance family)
    out = jnp.where(bsel(6), _blend(jnp.zeros_like(x), x, factor), out)
    gray = jnp.mean(x, axis=-1, keepdims=True)
    out = jnp.where(bsel(7), _blend(gray, x, factor), out)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    out = jnp.where(bsel(8), _blend(mean, x, factor), out)
    # sharpness: blend with a 3x3 smoothing (PIL's SMOOTH kernel)
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]])
    kernel = (kernel / 13.0)[:, :, None, None]
    nchw = jnp.moveaxis(x, -1, 1)
    blur = jax.lax.conv_general_dilated(
        nchw.reshape((-1, 1) + nchw.shape[2:]), kernel,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    blur = jnp.moveaxis(blur.reshape(nchw.shape), 1, -1)
    out = jnp.where(bsel(9), _blend(blur, x, factor), out)
    # posterize: keep 8 - round(4 * m) high bits (timm increasing range)
    bits = jnp.round(8.0 - 4.0 * mag)
    levels = jnp.exp2(bits)
    out = jnp.where(bsel(10),
                    jnp.floor(x * (levels - 1.0) + 0.5) / (levels - 1.0),
                    out)
    # solarize: invert pixels above threshold 1 - m
    out = jnp.where(bsel(11), jnp.where(x >= 1.0 - mag, 1.0 - x, x), out)
    # autocontrast: per-image per-channel min/max stretch
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    stretched = (x - lo) / jnp.maximum(hi - lo, 1e-6)
    out = jnp.where(bsel(12), jnp.where(hi > lo, stretched, x), out)
    out = jnp.where(bsel(13), 1.0 - x, out)
    return jnp.clip(out, 0.0, 1.0)


def rand_augment(x, rng, *, num_layers: int = 2, magnitude: float = 9.0,
                 mag_std: float = 0.5):
    """Apply RandAugment to a (B, H, W, C) float [0,1] batch on device.

    Per sample and per layer: draw one of the 14 ops uniformly, a magnitude
    ``~N(magnitude, mag_std)`` clipped to [0, 10] (timm's ``--aa rand-m9``
    noise), and a random sign. Geometric ops become one batched bilinear
    warp; color ops a masked elementwise chain (see module docstring).
    """
    batch, height, width, _ = x.shape
    for _ in range(num_layers):
        rng, k_op, k_mag, k_sign = jax.random.split(rng, 4)
        op = jax.random.randint(k_op, (batch,), 0, _N_OPS)
        mag = jnp.clip(
            magnitude + mag_std * jax.random.normal(k_mag, (batch,)),
            0.0, 10.0) / 10.0
        sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (batch,)),
                         1.0, -1.0)
        mag_signed = mag * sign
        mats = jax.vmap(partial(_affine_params, height=height,
                                width=width))(op, mag_signed)
        x = _warp_mxu(x, mats)
        x = _color_ops(x, op, mag_signed)
    return x


def random_erasing(x, rng, *, prob: float = 0.25, scale=(0.02, 0.33),
                   ratio=(0.3, 3.3)):
    """Per-sample random erasing (Zhong et al. 2020), timm 'pixel' mode:
    with probability ``prob`` replace a random rectangle (area fraction in
    ``scale``, aspect in ``ratio``) with unit-Gaussian noise. Applied AFTER
    normalization (timm convention), so the noise matches feature scale.
    """
    batch, height, width, _ = x.shape
    k_on, k_area, k_ratio, k_y, k_x, k_noise = jax.random.split(rng, 6)
    on = jax.random.bernoulli(k_on, prob, (batch,))
    area = jax.random.uniform(k_area, (batch,), minval=scale[0],
                              maxval=scale[1]) * (height * width)
    log_r = jax.random.uniform(k_ratio, (batch,),
                               minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(area * aspect), 1.0, float(height))
    ew = jnp.clip(jnp.sqrt(area / aspect), 1.0, float(width))
    y0 = jax.random.uniform(k_y, (batch,)) * (height - eh)
    x0 = jax.random.uniform(k_x, (batch,)) * (width - ew)
    rows = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    inside = ((rows >= y0[:, None, None]) & (rows < (y0 + eh)[:, None, None])
              & (cols >= x0[:, None, None]) & (cols < (x0 + ew)[:, None, None]))
    mask = (inside & on[:, None, None])[..., None]
    noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
    return jnp.where(mask, noise, x)
