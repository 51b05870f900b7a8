"""SimCLR contrastive pretraining — the third self-supervised family
(after MAE reconstruction and DINO self-distillation) on the same
TPU-native encoder machinery.

Chen et al. 2020 ("A Simple Framework for Contrastive Learning of Visual
Representations"): two augmented views of every image are pulled together
and pushed apart from every other view in the batch by the NT-Xent
(normalized temperature-scaled cross-entropy) loss. No teacher, no labels;
the batch itself supplies the negatives. Beyond-reference capability (the
reference trains supervised only, ``src/train.py``).

TPU-first design notes:
- The two views run as ONE (2B, S, S, C) fused batch (view v of sample b at
  row ``v*B + b``) — a single compiled encoder program per step, MXU-sized.
- Augmentations are device-resident (the DINO view builder minus solarize —
  RRC -> flip -> jitter -> grayscale -> blur, exactly the paper's chain);
  the host ships ONE [0,1] float batch per step.
- **Global negatives fall out of SPMD.** NT-Xent couples every sample in
  the batch through the (2B, 2B) similarity matrix. The loss is written as
  plain global math on the (2B, D) projection array; under a
  ``jax.sharding`` data-parallel mesh, XLA inserts the all-gather at the
  ``z @ z.T`` contraction automatically — the cross-device-negative
  machinery SimCLR implementations hand-roll on GPU
  (``torch.distributed.all_gather`` + gradient re-stitching) is a sharding
  annotation here, and the dp trajectory is exactly the single-device one
  (pinned by ``tests/test_simclr.py``).
- The projection head keeps the paper's **BatchNorm** — and it is
  load-bearing, not incidental: a freshly initialized ViT maps every image
  to nearly the same CLS feature (pairwise cosine >0.99 at init), so with a
  per-sample norm (LN) the NT-Xent loss starts at its collapse fixed point
  log(2B-1) and never escapes (measured: 600 full-batch Adam steps flat at
  2.7080 = log 15). Batch standardization forces unit variance per
  projection dim *across the batch*, making the all-equal solution
  unrepresentable — the anti-collapse mechanism. Like the loss, the batch
  moments are written as plain global math (means over axis 0); under a dp
  mesh XLA inserts the cross-device reduction, so the sharded step remains
  trajectory-exact vs single device (no per-shard statistics drift — pinned
  by ``tests/test_simclr.py``). Train-mode statistics only: the head is
  dropped at transfer time, so no running moments are tracked.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from vitx.core.config import ViTConfig
from vitx.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
from vitx.nn.dino import _dino_view
from vitx.nn.layers import layer_norm
from vitx.nn.vit import (Params, _trunc_normal, init_params, patch_embed,
                         run_blocks)


@dataclasses.dataclass(frozen=True)
class SimCLRConfig:
    """SimCLR pretraining hyperparameters. Hashable; safe as a static jit arg.

    ``encoder`` is a full ViTConfig (its head is replaced by the projection
    MLP). Defaults follow Chen et al. 2020: 2-layer projection head,
    temperature 0.1 (the paper's best for its LARS recipe is 0.1-0.5;
    ViT-contrastive work — MoCo v3, Chen & He 2021 — settles on 0.1-0.2),
    full augmentation chain with jitter strength 0.4.
    """

    encoder: ViTConfig
    proj_hidden: int = 2048
    proj_dim: int = 128
    temperature: float = 0.1
    crop_scale: tuple = (0.2, 1.0)   # paper: (0.08, 1.0) at ImageNet scale
    color_jitter: float = 0.4
    blur_prob: float = 0.5
    mean: tuple | None = IMAGENET_MEAN
    std: tuple | None = IMAGENET_STD

    def __post_init__(self):
        e = self.encoder
        if self.temperature <= 0.0:
            raise ValueError("temperature must be positive")
        if min(self.proj_hidden, self.proj_dim) <= 0:
            raise ValueError("projection dims must be positive")
        if e.distill_token:
            raise ValueError("SimCLR pretraining has no distillation "
                             "teacher; set distill_token=False and enable "
                             "it on the fine-tune config instead")
        if e.parity == "bug_exact":
            raise ValueError("SimCLR pretraining requires the corrected "
                             "token layout (parity='fixed'); bug_exact "
                             "exists only to reproduce reference-trained "
                             "checkpoints")
        if e.moe_experts:
            raise ValueError("SimCLR pretraining of Soft-MoE encoders is "
                             "unsupported; pretrain dense and add MoE "
                             "blocks on the fine-tune config")
        if e.num_registers:
            raise ValueError("SimCLR pretraining does not thread register "
                             "tokens; pretrain with num_registers=0 and "
                             "add registers on the fine-tune config")

    # view-builder adapter: _dino_view reads these three off its cfg arg
    @property
    def solarize_prob(self):
        return 0.0


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_simclr_params(rng, scfg: SimCLRConfig) -> Params:
    """Headless ViT encoder + 2-layer projection MLP (fc1 -> BN -> GELU ->
    fc2; the output is L2-normalized in the forward, so fc2 has no bias —
    a bias shifts all projections identically and cancels nothing). The BN
    affine (scale, bias) lives under ``head/bn``; its batch moments are
    recomputed per step (see module docstring)."""
    enc_cfg = scfg.encoder
    ke, kh = jax.random.split(rng)
    if enc_cfg.pos_embed != "learned":
        raise ValueError("SimCLR pretraining requires pos_embed='learned'"
                         " (its encoder gathers/resizes the positional table)")
    enc = init_params(ke, enc_cfg)
    enc.pop("head")
    enc.setdefault("final_norm", {
        "scale": jnp.ones((enc_cfg.embed_dim,), enc_cfg.pdtype()),
        "bias": jnp.zeros((enc_cfg.embed_dim,), enc_cfg.pdtype()),
    })

    pdt = enc_cfg.pdtype()
    std = enc_cfg.init_std
    E, H, D = enc_cfg.embed_dim, scfg.proj_hidden, scfg.proj_dim
    ks = jax.random.split(kh, 2)
    head = {
        "fc1": {"kernel": _trunc_normal(ks[0], (E, H), std, pdt),
                "bias": jnp.zeros((H,), pdt)},
        "bn": {"scale": jnp.ones((H,), pdt), "bias": jnp.zeros((H,), pdt)},
        "fc2": {"kernel": _trunc_normal(ks[1], (H, D), std, pdt)},
    }
    return {"encoder": enc, "head": head}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def simclr_encode(params: Params, images, scfg: SimCLRConfig, *, rng=None,
                  deterministic: bool = True):
    """Encoder at the native resolution -> (B, E) CLS features (mirrors
    ``dino_encode`` without the multi-resolution pos-embed resize)."""
    cfg = scfg.encoder
    enc = params["encoder"]
    cdt = cfg.cdtype()
    B = images.shape[0]

    tokens = patch_embed(enc, images, cfg)                     # (B, n, E)
    pos = enc["pos_embed"].astype(cdt)
    tokens = tokens + pos[:, 1:, :]
    cls = enc["cls_token"].astype(cdt) + pos[:, :1, :]
    cls = jnp.broadcast_to(cls, (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, tokens], axis=1)

    x, _ = run_blocks(enc["blocks"], x, cfg, rng=rng,
                      deterministic=deterministic)
    fn = enc["final_norm"]
    x = layer_norm(x, fn["scale"], fn["bias"], eps=cfg.layer_norm_eps)
    return x[:, 0, :]


def simclr_project(params: Params, feats, scfg: SimCLRConfig):
    """(B, E) features -> (B, D) L2-normalized projections, fp32 (the
    similarity/softmax math downstream needs full precision).

    The hidden is standardized across the BATCH (BN train mode, Chen 2020's
    head) — the anti-collapse mechanism; see the module docstring. Written
    as global math so a dp-sharded batch reduces across all devices."""
    h = params["head"]
    x = feats.astype(jnp.float32)
    x = (x @ h["fc1"]["kernel"].astype(jnp.float32)
         + h["fc1"]["bias"].astype(jnp.float32))
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    x = (x * h["bn"]["scale"].astype(jnp.float32)
         + h["bn"]["bias"].astype(jnp.float32))
    x = jax.nn.gelu(x)
    x = x @ h["fc2"]["kernel"].astype(jnp.float32)
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), -1, keepdims=True)
                             + 1e-12)


def simclr_forward(params: Params, images, scfg: SimCLRConfig, *, rng=None,
                   deterministic: bool = True):
    feats = simclr_encode(params, images, scfg, rng=rng,
                          deterministic=deterministic)
    return simclr_project(params, feats, scfg)


# ---------------------------------------------------------------------------
# Views + loss
# ---------------------------------------------------------------------------

def simclr_views(images, rng, scfg: SimCLRConfig):
    """[0,1] float images (B, H, W, C) -> ONE fused (2B, S, S, C) batch of
    two independently augmented views; view v of sample b at row v*B + b."""
    S = scfg.encoder.image_size
    k0, k1 = jax.random.split(rng)
    return jnp.concatenate([
        _dino_view(images, k0, scfg, out_size=S, scale=scfg.crop_scale,
                   solarize=False),
        _dino_view(images, k1, scfg, out_size=S, scale=scfg.crop_scale,
                   solarize=False),
    ], axis=0)


def nt_xent_loss(z, temperature: float):
    """NT-Xent (Chen 2020, eq. 1) over (2B, D) L2-normalized projections in
    view-major layout: the positive of row ``b`` is row ``B + b`` (and vice
    versa); the other 2B - 2 rows are negatives.

    Returns (loss, contrastive accuracy = fraction of rows whose positive
    scores highest among all non-self rows — the standard training monitor).
    Written as global math: under a dp mesh the ``z @ z.T`` contraction
    makes XLA gather the full batch, so negatives always span ALL devices.
    """
    n = z.shape[0]
    B = n // 2
    sim = (z @ z.T) / temperature                              # (2B, 2B)
    # mask self-similarity out of the softmax support
    self_mask = jnp.eye(n, dtype=bool)
    sim = jnp.where(self_mask, -jnp.inf, sim)
    pos_idx = jnp.concatenate([jnp.arange(B) + B, jnp.arange(B)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, pos_idx[:, None], axis=-1))
    acc = jnp.mean((jnp.argmax(sim, axis=-1) == pos_idx)
                   .astype(jnp.float32))
    return loss, acc


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def make_simclr_train_step(scfg: SimCLRConfig, optimizer):
    """Jitted, donated SimCLR step: views -> fused forward -> NT-Xent ->
    optimizer update. State is the plain ``TrainState`` (step, params,
    opt_state) — no teacher, no center."""
    import optax

    from vitx.train.step import TrainState

    def loss_fn(params, views, rng):
        z = simclr_forward(params, views, scfg, rng=rng,
                           deterministic=False)                # (2B, D)
        return nt_xent_loss(z, scfg.temperature)

    def step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        k_view, k_drop = jax.random.split(step_rng)
        views = simclr_views(batch["image"], k_view, scfg)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, views, k_drop)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if getattr(optimizer, "returns_new_params", False):
            params = updates
        else:
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, {"loss": loss, "contrast_acc": acc,
                           "grad_norm": optax.global_norm(grads)}

    return jax.jit(step, donate_argnums=(0,))


def create_simclr_train_state(rng, scfg: SimCLRConfig, optimizer):
    from vitx.train.step import TrainState

    params = init_simclr_params(rng, scfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))


def simclr_to_vit_params(simclr_params: Params, cfg: ViTConfig,
                         rng) -> Params:
    """Transfer a pretrained SimCLR encoder into a classifier ViT pytree for
    fine-tuning: encoder weights carry over verbatim, the projection head is
    dropped, the classifier head is freshly initialized.

    ``cfg`` must describe the same encoder geometry with
    ``final_norm=True`` (the SimCLR encoder always normalizes its output)."""
    if not cfg.final_norm:
        raise ValueError("fine-tune cfg must set final_norm=True to match "
                         "the SimCLR encoder")
    fresh = init_params(rng, cfg)
    enc = simclr_params["encoder"]
    out = dict(fresh)
    for key in ("patch_embed", "cls_token", "pos_embed", "blocks",
                "final_norm"):
        out[key] = enc[key]
    return out


def jit_simclr_forward(scfg: SimCLRConfig):
    return jax.jit(partial(simclr_forward, scfg=scfg, deterministic=True))
