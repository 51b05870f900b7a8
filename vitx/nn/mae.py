"""Masked-autoencoder (MAE) pretraining — a second training family on the
same TPU-native encoder machinery.

He et al. 2022 ("Masked Autoencoders Are Scalable Vision Learners"): mask a
large random fraction of patches, run the ViT encoder on the VISIBLE patches
only, then reconstruct pixels of the masked patches with a lightweight
decoder. Beyond-reference capability (the reference trains supervised only,
``src/train.py``); it reuses vitx's encoder blocks (``vitx/nn/vit.py::
run_blocks``) so every kernel/remat/fusion knob applies to pretraining too.

TPU-first design notes:
- The mask count is STATIC (``int(N * mask_ratio)``) — the encoder always
  sees exactly ``N - num_masked + 1`` tokens, so one jit compile covers the
  whole run (no dynamic shapes).
- Masking = one argsort of uniform noise per sample + ``take_along_axis``
  gathers: XLA lowers both onto the chip; no host-side index work.
- The decoder is just a second ``run_blocks`` scan with its own (smaller)
  geometry — same fused kernels, same remat policy.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from vitx.core.config import ViTConfig
from vitx.nn.layers import layer_norm
from vitx.nn.vit import (Params, _trunc_normal, init_blocks, init_params,
                         patch_embed, run_blocks)


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    """MAE pretraining hyperparameters. Hashable; safe as a static jit arg.

    ``encoder`` is a full ViTConfig (its head_type is ignored — MAE has no
    classification head); decoder defaults follow He et al. 2022 (512-dim,
    8 blocks, 16 heads, mask 75%, per-patch-normalized pixel targets).
    """

    encoder: ViTConfig
    decoder_dim: int = 512
    decoder_depth: int = 8
    decoder_heads: int = 16
    mask_ratio: float = 0.75
    norm_pix_loss: bool = True

    def __post_init__(self):
        if not 0.0 < self.mask_ratio < 1.0:
            raise ValueError(f"mask_ratio must be in (0, 1), "
                             f"got {self.mask_ratio}")
        if self.decoder_dim % self.decoder_heads:
            raise ValueError("decoder_dim not divisible by decoder_heads")
        if self.encoder.distill_token:
            raise ValueError("MAE pretraining has no distillation target; "
                             "use distill_token=False for the encoder and "
                             "enable it on the fine-tune config instead")
        if self.encoder.moe_experts:
            raise ValueError("MAE pretraining of Soft-MoE encoders is "
                             "unsupported; pretrain dense and add MoE "
                             "blocks on the fine-tune config")

    @property
    def num_patches(self) -> int:
        return self.encoder.grid_size ** 2

    @property
    def num_masked(self) -> int:
        return int(self.num_patches * self.mask_ratio)

    @property
    def num_visible(self) -> int:
        return self.num_patches - self.num_masked

    @property
    def decoder_cfg(self) -> ViTConfig:
        """The decoder blocks expressed as a ViTConfig (drives run_blocks)."""
        return dataclasses.replace(
            self.encoder, embed_dim=self.decoder_dim,
            depth=self.decoder_depth, num_heads=self.decoder_heads,
            dropout=0.0, drop_path=0.0)

    @property
    def patch_dim(self) -> int:
        e = self.encoder
        return e.patch_size * e.patch_size * e.num_channels


def init_mae_params(rng, mcfg: MAEConfig) -> Params:
    """Encoder (a headless ViT pytree) + decoder parameter pytrees."""
    enc_cfg = mcfg.encoder
    ke, kd = jax.random.split(rng)
    if enc_cfg.pos_embed != "learned":
        raise ValueError("MAE pretraining requires pos_embed='learned'"
                         " (its encoder gathers/resizes the positional table)")
    enc = init_params(ke, enc_cfg)
    enc.pop("head")                      # MAE pretrains without a classifier
    enc.setdefault("final_norm", {       # encoder output is always normalized
        "scale": jnp.ones((enc_cfg.embed_dim,), enc_cfg.pdtype()),
        "bias": jnp.zeros((enc_cfg.embed_dim,), enc_cfg.pdtype()),
    })

    dcfg = mcfg.decoder_cfg
    pdt = enc_cfg.pdtype()
    Ed = mcfg.decoder_dim
    std = enc_cfg.init_std
    ks = jax.random.split(kd, 5)
    dec = {
        "embed": {"kernel": _trunc_normal(ks[0], (enc_cfg.embed_dim, Ed),
                                          std, pdt),
                  "bias": jnp.zeros((Ed,), pdt)},
        "mask_token": _trunc_normal(ks[1], (1, 1, Ed), std, pdt),
        "pos_embed": _trunc_normal(ks[2], (1, mcfg.num_patches + 1, Ed),
                                   std, pdt),
        "blocks": init_blocks(ks[3], dcfg),
        "norm": {"scale": jnp.ones((Ed,), pdt),
                 "bias": jnp.zeros((Ed,), pdt)},
        "pred": {"kernel": _trunc_normal(ks[4], (Ed, mcfg.patch_dim),
                                         std, pdt),
                 "bias": jnp.zeros((mcfg.patch_dim,), pdt)},
    }
    return {"encoder": enc, "decoder": dec}


def random_masking(rng, batch: int, mcfg: MAEConfig):
    """Per-sample random patch masking with a STATIC keep count.

    Returns (ids_keep (B, K), ids_restore (B, N), mask (B, N) — 1 = masked).
    One uniform draw + argsort per sample (He et al. 2022's shuffle trick);
    everything stays on device with static shapes.
    """
    N, K = mcfg.num_patches, mcfg.num_visible
    noise = jax.random.uniform(rng, (batch, N))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :K]
    mask = jnp.ones((batch, N), jnp.float32)
    mask = mask.at[:, :K].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, ids_restore, mask


def patchify_pixels(images, cfg: ViTConfig):
    """(B, H, W, C) -> (B, N, P*P*C) pixel patches, in EXACTLY the layout
    patch_embed flattens (vitx/nn/vit.py::patch_embed) so predictions and
    targets correspond elementwise."""
    B = images.shape[0]
    P, g, C = cfg.patch_size, cfg.grid_size, cfg.num_channels
    x = images.reshape(B, g, P, g, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, g * g, P * P * C)


def unpatchify_pixels(patches, cfg: ViTConfig):
    """Inverse of patchify_pixels: (B, N, P*P*C) -> (B, H, W, C)."""
    B = patches.shape[0]
    P, g, C = cfg.patch_size, cfg.grid_size, cfg.num_channels
    x = patches.reshape(B, g, g, P, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, g * P, g * P, C)


def mae_encode(params: Params, images, mcfg: MAEConfig, *, ids_keep,
               rng=None, deterministic: bool = True):
    """Encoder over VISIBLE patches only: -> (B, K+1, E) tokens (CLS first)."""
    enc_cfg = mcfg.encoder
    cdt = enc_cfg.cdtype()
    enc = params["encoder"]
    B = images.shape[0]

    tokens = patch_embed(enc, images, enc_cfg)           # (B, N, E)
    tokens = tokens + enc["pos_embed"].astype(cdt)[:, 1:, :]
    vis = jnp.take_along_axis(tokens, ids_keep[:, :, None], axis=1)

    cls = (enc["cls_token"].astype(cdt)
           + enc["pos_embed"].astype(cdt)[:, :1, :])
    cls = jnp.broadcast_to(cls, (B, 1, enc_cfg.embed_dim))
    x = jnp.concatenate([cls, vis], axis=1)              # (B, K+1, E)

    x, _ = run_blocks(enc["blocks"], x, enc_cfg, rng=rng,
                      deterministic=deterministic)
    fn = enc["final_norm"]
    return layer_norm(x, fn["scale"], fn["bias"], eps=enc_cfg.layer_norm_eps)


def mae_forward(params: Params, images, mcfg: MAEConfig, rng, *,
                deterministic: bool = False):
    """Full MAE pass: -> (loss, pred (B, N, P*P*C), mask (B, N)).

    Loss = mean squared error on MASKED patches only, against per-patch
    normalized pixels when ``norm_pix_loss`` (He et al. 2022 §A.1).
    """
    enc_cfg = mcfg.encoder
    cdt = enc_cfg.cdtype()
    dec = params["decoder"]
    B = images.shape[0]
    N, K = mcfg.num_patches, mcfg.num_visible

    r_mask, r_enc = jax.random.split(jax.random.fold_in(rng, 0))
    ids_keep, ids_restore, mask = random_masking(r_mask, B, mcfg)

    x = mae_encode(params, images, mcfg, ids_keep=ids_keep,
                   rng=None if deterministic else r_enc,
                   deterministic=deterministic)          # (B, K+1, E)

    # decoder embed + un-shuffle with mask tokens
    y = jnp.dot(x, dec["embed"]["kernel"].astype(cdt),
                preferred_element_type=jnp.float32).astype(cdt)
    y = y + dec["embed"]["bias"].astype(cdt)             # (B, K+1, Ed)
    mask_tok = jnp.broadcast_to(dec["mask_token"].astype(cdt),
                                (B, N - K, mcfg.decoder_dim))
    patches = jnp.concatenate([y[:, 1:, :], mask_tok], axis=1)   # (B, N, Ed)
    patches = jnp.take_along_axis(patches, ids_restore[:, :, None], axis=1)
    y = jnp.concatenate([y[:, :1, :], patches], axis=1)  # (B, N+1, Ed)
    y = y + dec["pos_embed"].astype(cdt)

    y, _ = run_blocks(dec["blocks"], y, mcfg.decoder_cfg,
                      deterministic=True)
    y = layer_norm(y, dec["norm"]["scale"], dec["norm"]["bias"],
                   eps=enc_cfg.layer_norm_eps)
    pred = jnp.dot(y[:, 1:, :], dec["pred"]["kernel"].astype(cdt),
                   preferred_element_type=jnp.float32)
    pred = (pred + dec["pred"]["bias"].astype(jnp.float32))\
        .astype(jnp.float32)                             # (B, N, P*P*C)

    target = patchify_pixels(images.astype(jnp.float32), enc_cfg)
    if mcfg.norm_pix_loss:
        mean = jnp.mean(target, axis=-1, keepdims=True)
        var = jnp.var(target, axis=-1, keepdims=True)
        target = (target - mean) * jax.lax.rsqrt(var + 1e-6)

    per_patch = jnp.mean(jnp.square(pred - target), axis=-1)   # (B, N)
    loss = jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss, pred, mask


def mae_loss_fn(params, batch, mcfg: MAEConfig, rng):
    loss, _, _ = mae_forward(params, batch["image"], mcfg, rng)
    return loss, ()


def make_mae_train_step(mcfg: MAEConfig, optimizer):
    """Jitted, donated MAE pretraining step (mirrors vitx.train.step)."""
    import optax

    from vitx.train.step import TrainState

    def step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = jax.value_and_grad(mae_loss_fn, has_aux=True)(
            state.params, batch, mcfg, step_rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if getattr(optimizer, "returns_new_params", False):
            params = updates
        else:
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    return jax.jit(step, donate_argnums=(0,))


def create_mae_train_state(rng, mcfg: MAEConfig, optimizer):
    from vitx.train.step import TrainState

    params = init_mae_params(rng, mcfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))


def mae_to_vit_params(mae_params: Params, cfg: ViTConfig, rng) -> Params:
    """Transfer a pretrained MAE encoder into a classifier ViT pytree for
    fine-tuning: encoder weights (patch embed / CLS / pos / blocks /
    final norm) carry over verbatim, the head is freshly initialized.

    ``cfg`` must describe the same encoder geometry and have
    ``final_norm=True`` (the MAE encoder always normalizes its output).
    """
    if not cfg.final_norm:
        raise ValueError("fine-tune cfg must set final_norm=True to match "
                         "the MAE encoder")
    fresh = init_params(rng, cfg)
    enc = mae_params["encoder"]
    out = dict(fresh)
    for key in ("patch_embed", "cls_token", "pos_embed", "blocks",
                "final_norm"):
        out[key] = enc[key]
    return out


def jit_mae_forward(mcfg: MAEConfig):
    return jax.jit(partial(mae_forward, mcfg=mcfg, deterministic=True))
