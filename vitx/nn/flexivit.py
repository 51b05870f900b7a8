"""FlexiViT patch-size resizing (Beyer et al. 2023, "FlexiViT: One Model
for All Patch Sizes").

Pseudo-inverse (PI) resize of the patch-embedding kernel: a model trained
at patch size ``p`` runs at patch size ``p*`` by replacing its patchify
weights ``w`` with ``w* = pinv(Bᵀ) w``, where ``B`` is the linear operator
of bilinear patch resize ``p -> p*``. Then for any patch ``x``,
``w*ᵀ (Bx) = w̃ᵀ x`` with ``w̃ = Bᵀ w* = Bᵀ pinv(Bᵀ) w``: when upsampling
(``p* >= p``) ``Bᵀ`` has full row rank, the system solves exactly and
token values are PRESERVED on correspondingly-resized inputs; when
downsampling it is the least-squares optimum. One checkpoint, many
patch sizes — each a separate static-shape XLA compilation (TPU-native:
no dynamic shapes; the sequence length changes per patch size, so each
operating point is its own jitted program).

Beyond-reference extension (the reference hard-codes one patch size);
capability counterpart of its config knob ``patch_size``
(/root/reference/src/VisionTransformer/config.py:13).
"""

from __future__ import annotations

import numpy as np

from vitx.core.config import ViTConfig

Params = dict


def _resize_operator_t(old_p: int, new_p: int) -> np.ndarray:
    """``Bᵀ`` of the bilinear patch-resize operator, shape (old_p², new_p²):
    row i is the flattened bilinear resize of the i-th one-hot old patch."""
    import jax
    import jax.numpy as jnp

    basis = jnp.eye(old_p * old_p, dtype=jnp.float32)
    basis = basis.reshape(old_p * old_p, old_p, old_p)
    resized = jax.vmap(
        lambda img: jax.image.resize(img, (new_p, new_p), "bilinear"))(basis)
    return np.asarray(resized.reshape(old_p * old_p, new_p * new_p))


def pi_resize_patch_kernel(kernel, old_p: int, new_p: int,
                           channels: int) -> np.ndarray:
    """PI-resize a vitx patchify kernel (old_p·old_p·C, E) -> (new_p·new_p·C, E).

    The vitx space-to-depth layout flattens each patch as (P, P, C)
    row-major (vit.py::patch_embed), so the kernel reshapes to
    (P², C·E) with the spatial index leading; the per-channel resize
    operator applies to every (channel, embed) column at once.
    """
    if old_p == new_p:
        return np.asarray(kernel)
    w = np.asarray(kernel, np.float32)
    E = w.shape[-1]
    if w.shape[0] != old_p * old_p * channels:
        raise ValueError(
            f"kernel rows {w.shape[0]} != old_p²·C = {old_p * old_p * channels}")
    w = w.reshape(old_p * old_p, channels * E)
    bt = _resize_operator_t(old_p, new_p)          # (old_p², new_p²)
    # solve Bᵀ w* = w for w* (exact for new_p >= old_p, least-squares below)
    w_new = np.linalg.pinv(bt) @ w                 # (new_p², C·E)
    return np.ascontiguousarray(
        w_new.reshape(new_p * new_p * channels, E)).astype(
            np.asarray(kernel).dtype)


def resize_patch_embed(params: Params, cfg: ViTConfig, *, patch_size: int,
                       image_size: int | None = None):
    """Re-target a trained model to a new patch size: returns
    ``(new_params, new_cfg)`` with the patchify kernel PI-resized and — if
    the token grid changes — the positional grid bilinearly resized.

    ``image_size=None`` scales the input proportionally (grid constant:
    the FlexiViT protocol — token values are exactly preserved for
    ``patch_size >= cfg.patch_size`` up to the input's own resize).
    Passing an explicit ``image_size`` changes the grid; the pos-embed
    grid is resized to match (the higher-resolution fine-tune trick).
    """
    import jax.numpy as jnp

    if cfg.stem != "patch":
        raise ValueError("resize_patch_embed needs stem='patch' (the conv "
                         "stem has no patchify kernel to PI-resize)")
    old_p = cfg.patch_size
    if image_size is None:
        # always integral: config validation guarantees old_p | image_size
        image_size = cfg.image_size // old_p * patch_size
    new_cfg = cfg.replace(patch_size=patch_size, image_size=image_size)
    if new_cfg.grid_size != cfg.grid_size and cfg.parity == "bug_exact":
        raise ValueError(
            "bug_exact parity stores pos_embed as [patches..., CLS] "
            "(reference vit.py:41); only grid-preserving patch resizes are "
            "supported — pass image_size = old_image_size * new_p / old_p")

    out = dict(params)
    pe = dict(params["patch_embed"])
    pe["kernel"] = jnp.asarray(pi_resize_patch_kernel(
        params["patch_embed"]["kernel"], old_p, patch_size,
        cfg.num_channels))
    out["patch_embed"] = pe

    if new_cfg.grid_size != cfg.grid_size and cfg.pos_embed == "learned":
        # sincos2d/rope carry no table leaf — their positional information
        # regenerates from new_cfg's grid automatically (vit.py)
        from vitx.interop.pretrained import resize_pos_embed

        out = resize_pos_embed(out, cfg, new_cfg)
        out["pos_embed"] = jnp.asarray(out["pos_embed"])
    return out, new_cfg
