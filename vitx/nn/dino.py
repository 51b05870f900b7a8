"""DINO self-distillation pretraining — a third training family (after
supervised and MAE) on the same TPU-native encoder machinery.

Caron et al. 2021 ("Emerging Properties in Self-Supervised Vision
Transformers"): a student ViT matches, across augmented views, the softmax
targets of an EMA *teacher* of itself. No labels, no negatives — collapse is
avoided by centering (EMA of teacher logits) + sharpening (low teacher
temperature). Beyond-reference capability (the reference trains supervised
only, ``src/train.py``); it reuses vitx's encoder (``vitx/nn/vit.py::
run_blocks``/``patch_embed``) so every kernel/remat/fusion knob applies.

TPU-first design notes:
- Multi-crop is TWO static resolutions (global S, local s): the 2 global
  views run as ONE (2B, S, S, C) batch and the n_local local views as ONE
  (n_local*B, s, s, C) batch — two compiled programs total, both with
  MXU-friendly fused batches, instead of 2+n_local dispatches.
- The local grid reuses the GLOBAL pos-embed, bilinearly resized in-graph
  (``jax.image.resize`` is differentiable and static-shaped) — exactly the
  interpolation the paper's ``interpolate_pos_encoding`` performs, but
  traced once and fused by XLA.
- Crops + jitter + blur + solarize are device-resident (built on the
  train pipeline's vmapped ``scale_and_translate`` RRC) — the host ships
  ONE uint8/float batch per step; the 2+n views never cross PCIe.
- Teacher EMA + centering are pure pytree ops inside the donated train
  step; the teacher never leaves device or enters the gradient (it is a
  separate pytree, outside ``value_and_grad``'s argument).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from vitx.core.config import ViTConfig
from vitx.data.pipeline import (IMAGENET_MEAN, IMAGENET_STD, _color_jitter,
                                _random_resized_crop)
from vitx.nn.layers import layer_norm
from vitx.nn.vit import (Params, _trunc_normal, init_params, patch_embed,
                         run_blocks)


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    """DINO pretraining hyperparameters. Hashable; safe as a static jit arg.

    ``encoder`` is a full ViTConfig at the GLOBAL crop geometry (its
    head_type is ignored — DINO replaces the classifier with the projection
    head). Defaults follow Caron et al. 2021 (ViT recipe): 2 global +
    ``n_local`` local crops, K=65536 prototypes (default lowered to 4096 —
    right-sized for the non-ImageNet datasets this repo targets; raise via
    ``--dino-dim`` at scale), teacher temp 0.04, student temp 0.1, center
    momentum 0.9, teacher EMA 0.996 -> 1.0 on a cosine.
    """

    encoder: ViTConfig
    local_size: int = 96
    n_local: int = 6
    out_dim: int = 4096
    head_hidden: int = 2048
    head_bottleneck: int = 256
    student_temp: float = 0.1
    teacher_temp: float = 0.04
    center_momentum: float = 0.9
    momentum: float = 0.996          # teacher EMA base (cosine -> 1.0)
    norm_last_layer: bool = True     # weight-normed prototypes, g frozen at 1
    global_scale: tuple = (0.4, 1.0)
    local_scale: tuple = (0.05, 0.4)
    color_jitter: float = 0.4
    blur_prob: float = 0.5
    solarize_prob: float = 0.2       # second global view only (paper §B)
    mean: tuple | None = IMAGENET_MEAN
    std: tuple | None = IMAGENET_STD

    def __post_init__(self):
        e = self.encoder
        if self.local_size % e.patch_size:
            raise ValueError(f"local_size {self.local_size} not divisible "
                             f"by patch_size {e.patch_size}")
        if self.local_size >= e.image_size:
            raise ValueError("local crops must be smaller than global crops "
                             f"(local {self.local_size} >= global "
                             f"{e.image_size})")
        if self.n_local < 0:
            raise ValueError("n_local must be >= 0")
        if not (0.0 < self.teacher_temp and 0.0 < self.student_temp):
            raise ValueError("temperatures must be positive")
        if not 0.0 <= self.momentum <= 1.0:
            raise ValueError("teacher momentum must be in [0, 1]")
        if e.distill_token:
            raise ValueError("DINO pretraining has no distillation teacher "
                             "logits; set distill_token=False and enable it "
                             "on the fine-tune config instead")
        if e.parity == "bug_exact":
            raise ValueError("DINO pretraining requires the corrected token "
                             "layout (parity='fixed'); bug_exact exists only "
                             "to reproduce reference-trained checkpoints")
        if e.moe_experts:
            raise ValueError("DINO pretraining of Soft-MoE encoders is "
                             "unsupported; pretrain dense and add MoE "
                             "blocks on the fine-tune config")
        if e.num_registers:
            raise ValueError("DINO pretraining does not thread register "
                             "tokens; pretrain with num_registers=0 and add "
                             "registers on the fine-tune config")
        if min(self.out_dim, self.head_hidden, self.head_bottleneck) <= 0:
            raise ValueError("head dims must be positive")

    @property
    def local_cfg(self) -> ViTConfig:
        return self.encoder.replace(image_size=self.local_size)

    @property
    def n_views(self) -> int:
        return 2 + self.n_local


class DINOState(NamedTuple):
    """Donated train-state pytree: student + its optimizer, teacher, center."""
    step: jnp.ndarray            # () int32
    params: Any                  # student {"encoder", "head"}
    opt_state: Any
    teacher: Any                 # same structure as params; EMA of student
    center: jnp.ndarray          # (out_dim,) fp32 EMA of teacher logits


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_dino_params(rng, dcfg: DINOConfig) -> Params:
    """Headless ViT encoder + DINO projection head (one network; the teacher
    starts as an exact copy — see ``create_dino_train_state``)."""
    enc_cfg = dcfg.encoder
    ke, kh = jax.random.split(rng)
    if enc_cfg.pos_embed != "learned":
        raise ValueError("DINO pretraining requires pos_embed='learned'"
                         " (its encoder gathers/resizes the positional table)")
    enc = init_params(ke, enc_cfg)
    enc.pop("head")
    enc.setdefault("final_norm", {
        "scale": jnp.ones((enc_cfg.embed_dim,), enc_cfg.pdtype()),
        "bias": jnp.zeros((enc_cfg.embed_dim,), enc_cfg.pdtype()),
    })

    pdt = enc_cfg.pdtype()
    std = enc_cfg.init_std
    E, H, Bd, K = (enc_cfg.embed_dim, dcfg.head_hidden,
                   dcfg.head_bottleneck, dcfg.out_dim)
    ks = jax.random.split(kh, 4)
    head = {
        "fc1": {"kernel": _trunc_normal(ks[0], (E, H), std, pdt),
                "bias": jnp.zeros((H,), pdt)},
        "fc2": {"kernel": _trunc_normal(ks[1], (H, H), std, pdt),
                "bias": jnp.zeros((H,), pdt)},
        "fc3": {"kernel": _trunc_normal(ks[2], (H, Bd), std, pdt),
                "bias": jnp.zeros((Bd,), pdt)},
        # prototype directions; used COLUMN-normalized when norm_last_layer
        # (the paper's weight_norm with the gain g frozen at 1)
        "last": _trunc_normal(ks[3], (Bd, K), std, pdt),
    }
    return {"encoder": enc, "head": head}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _resized_pos_embed(pos, grid_from: int, grid_to: int):
    """(1, N+1, E) global pos-embed -> (1, n+1, E) at a new grid (CLS kept).

    In-graph bilinear resize (differentiable, static shapes) — the paper's
    interpolate_pos_encoding equivalent.
    """
    if grid_from == grid_to:
        return pos
    E = pos.shape[-1]
    grid = pos[:, 1:, :].reshape(1, grid_from, grid_from, E)
    grid = jax.image.resize(grid, (1, grid_to, grid_to, E), "bilinear")
    return jnp.concatenate(
        [pos[:, :1, :], grid.reshape(1, grid_to * grid_to, E)], axis=1)


def dino_encode(params: Params, images, dcfg: DINOConfig, *, rng=None,
                deterministic: bool = True):
    """Shared-weight encoder at EITHER crop resolution -> (B, E) CLS features.

    The resolution is read off ``images``; the stored global pos-embed is
    resized in-graph for local crops. ``params`` is the {"encoder", "head"}
    pytree (teacher or student)."""
    size = images.shape[1]
    cfg = (dcfg.encoder if size == dcfg.encoder.image_size
           else dcfg.local_cfg)
    enc = params["encoder"]
    cdt = cfg.cdtype()
    B = images.shape[0]

    tokens = patch_embed(enc, images, cfg)                     # (B, n, E)
    pos = _resized_pos_embed(enc["pos_embed"].astype(jnp.float32),
                             dcfg.encoder.grid_size, cfg.grid_size)
    tokens = tokens + pos.astype(cdt)[:, 1:, :]
    cls = enc["cls_token"].astype(cdt) + pos.astype(cdt)[:, :1, :]
    cls = jnp.broadcast_to(cls, (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, tokens], axis=1)

    x, _ = run_blocks(enc["blocks"], x, cfg, rng=rng,
                      deterministic=deterministic)
    fn = enc["final_norm"]
    x = layer_norm(x, fn["scale"], fn["bias"], eps=cfg.layer_norm_eps)
    return x[:, 0, :]


def dino_head(params: Params, feats, dcfg: DINOConfig):
    """(B, E) features -> (B, K) prototype logits.

    3-layer GELU MLP -> L2-normalized bottleneck -> (weight-normalized)
    prototype matmul, all in fp32 — K can be large and the softmax/centering
    math downstream needs full precision."""
    h = params["head"]
    x = feats.astype(jnp.float32)
    x = jax.nn.gelu(x @ h["fc1"]["kernel"].astype(jnp.float32)
                    + h["fc1"]["bias"].astype(jnp.float32))
    x = jax.nn.gelu(x @ h["fc2"]["kernel"].astype(jnp.float32)
                    + h["fc2"]["bias"].astype(jnp.float32))
    x = (x @ h["fc3"]["kernel"].astype(jnp.float32)
         + h["fc3"]["bias"].astype(jnp.float32))
    x = x * jax.lax.rsqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + 1e-12)
    last = h["last"].astype(jnp.float32)
    if dcfg.norm_last_layer:
        last = last * jax.lax.rsqrt(
            jnp.sum(jnp.square(last), 0, keepdims=True) + 1e-12)
    return x @ last


def dino_forward(params: Params, images, dcfg: DINOConfig, *, rng=None,
                 deterministic: bool = True):
    feats = dino_encode(params, images, dcfg, rng=rng,
                        deterministic=deterministic)
    return dino_head(params, feats, dcfg)


# ---------------------------------------------------------------------------
# Multi-crop augmentation (device-resident)
# ---------------------------------------------------------------------------

def _gaussian_blur(x, rng, taps: int = 9):
    """Per-sample separable Gaussian blur, sigma ~ U(0.1, 2.0) (paper §B).

    Two batched (B, H, W*C) x (B, W, W)-style contractions instead of a
    vmapped conv: each axis blur is an einsum against a per-sample banded
    (size, size) kernel matrix — static shapes, MXU-friendly."""
    B, H, W, C = x.shape
    k1, = jax.random.split(rng, 1)
    sigma = jax.random.uniform(k1, (B,), minval=0.1, maxval=2.0)
    r = jnp.arange(taps, dtype=jnp.float32) - (taps - 1) / 2.0
    k1d = jnp.exp(-jnp.square(r)[None, :] /
                  (2.0 * jnp.square(sigma)[:, None]))      # (B, taps)
    k1d = k1d / jnp.sum(k1d, -1, keepdims=True)

    def band(n):
        # (B, n, n) banded matrix M[b, i, j] = k1d[b, j - i + taps//2]
        idx = (jnp.arange(n)[None, :] - jnp.arange(n)[:, None]
               + (taps - 1) // 2)                           # (n, n)
        valid = (idx >= 0) & (idx < taps)
        gath = jnp.take(k1d, jnp.clip(idx, 0, taps - 1), axis=1)  # (B, n, n)
        gath = jnp.where(valid[None], gath, 0.0)
        return gath / jnp.sum(gath, -1, keepdims=True)      # renorm edges

    x = jnp.einsum("bhi,biwc->bhwc", band(H), x)            # blur rows
    x = jnp.einsum("bwj,bhjc->bhwc", band(W), x)            # blur cols
    return x


def _maybe(rng, prob, fx, x):
    """Apply fx per-sample with probability prob (both branches computed —
    the jit-friendly select; aug math is cheap next to the encoder)."""
    if prob <= 0.0:
        return x
    kb, ka = jax.random.split(rng)
    keep = jax.random.bernoulli(kb, prob, (x.shape[0], 1, 1, 1))
    return jnp.where(keep, fx(x, ka), x)


def _dino_view(images, rng, dcfg: DINOConfig, *, out_size: int, scale,
               solarize: bool):
    """One augmented view: RRC -> flip -> jitter -> gray -> blur ->
    (solarize) -> normalize. Operates on [0,1] floats."""
    ks = jax.random.split(rng, 6)
    x = _random_resized_crop(images, ks[0], out_size, scale, (3 / 4, 4 / 3))
    flip = jax.random.bernoulli(ks[1], 0.5, (x.shape[0], 1, 1, 1))
    x = jnp.where(flip, x[:, :, ::-1, :], x)
    if dcfg.color_jitter:
        x = _maybe(ks[2], 0.8,
                   lambda v, k: _color_jitter(v, k, dcfg.color_jitter), x)
    x = _maybe(ks[3], 0.2,
               lambda v, k: jnp.broadcast_to(
                   jnp.mean(v, -1, keepdims=True), v.shape), x)
    x = _maybe(ks[4], dcfg.blur_prob, lambda v, k: _gaussian_blur(v, k), x)
    if solarize:
        x = _maybe(ks[5], dcfg.solarize_prob,
                   lambda v, k: jnp.where(v > 0.5, 1.0 - v, v), x)
    if dcfg.mean is not None:
        x = ((x - jnp.asarray(dcfg.mean, jnp.float32))
             / jnp.asarray(dcfg.std, jnp.float32))
    return x


def multi_crop(images, rng, dcfg: DINOConfig):
    """[0,1] float images (B, H, W, C) -> (globals (2B, S, S, C),
    locals (n_local*B, s, s, C) or None).

    Views are concatenated along batch so the whole step runs ONE global
    and ONE local encoder program; view v of sample b sits at row v*B + b."""
    S, s = dcfg.encoder.image_size, dcfg.local_size
    keys = jax.random.split(rng, dcfg.n_views)
    gl = [
        _dino_view(images, keys[0], dcfg, out_size=S,
                   scale=dcfg.global_scale, solarize=False),
        _dino_view(images, keys[1], dcfg, out_size=S,
                   scale=dcfg.global_scale, solarize=True),
    ]
    if dcfg.n_local == 0:
        return jnp.concatenate(gl, 0), None
    lc = [_dino_view(images, keys[2 + i], dcfg, out_size=s,
                     scale=dcfg.local_scale, solarize=False)
          for i in range(dcfg.n_local)]
    return jnp.concatenate(gl, 0), jnp.concatenate(lc, 0)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def dino_loss(student_logits, teacher_logits, center, dcfg: DINOConfig):
    """Cross-entropy between teacher targets and student predictions over
    all (teacher global view, student view) pairs with view_t != view_s.

    student_logits: (V, B, K) — V = 2 + n_local views.
    teacher_logits: (2, B, K); targets are softmax((t - center) / temp_t),
    gradient-stopped. Returns (loss, teacher probs (2, B, K))."""
    t = jax.nn.softmax(
        (teacher_logits - center[None, None, :]) / dcfg.teacher_temp, -1)
    t = jax.lax.stop_gradient(t)
    s_logp = jax.nn.log_softmax(student_logits / dcfg.student_temp, -1)

    V = student_logits.shape[0]
    total, n_terms = 0.0, 0
    for iq in range(2):
        for v in range(V):
            if v == iq:
                continue
            total = total + jnp.mean(-jnp.sum(t[iq] * s_logp[v], -1))
            n_terms += 1
    return total / n_terms, t


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def _teacher_momentum(step, total_steps: int, dcfg: DINOConfig):
    """Cosine teacher-EMA momentum: base -> 1.0 over training (paper §4)."""
    frac = jnp.clip(step.astype(jnp.float32) / max(total_steps, 1), 0.0, 1.0)
    return 1.0 - (1.0 - dcfg.momentum) * (jnp.cos(jnp.pi * frac) + 1.0) / 2.0


def make_dino_train_step(dcfg: DINOConfig, optimizer, total_steps: int,
                         freeze_last_steps: int = 0):
    """Jitted, donated DINO step: crops -> student/teacher forwards -> CE ->
    AdamW on the student -> teacher EMA + center EMA.

    ``freeze_last_steps``: zero the prototype-layer gradient for the first
    N steps (the paper's first-epoch last-layer freeze — stabilizes early
    training)."""
    import optax

    def loss_fn(params, teacher, center, g_crops, l_crops, rng):
        B = g_crops.shape[0] // 2
        rs = jax.random.split(rng, 2)
        s_g = dino_forward(params, g_crops, dcfg, rng=rs[0],
                           deterministic=False)               # (2B, K)
        views = [s_g.reshape(2, B, -1)]
        if l_crops is not None:
            s_l = dino_forward(params, l_crops, dcfg, rng=rs[1],
                               deterministic=False)
            views.append(s_l.reshape(dcfg.n_local, B, -1))
        s_all = jnp.concatenate(views, 0)                     # (V, B, K)
        t_g = dino_forward(teacher, g_crops, dcfg).reshape(2, B, -1)
        loss, t_probs = dino_loss(s_all, t_g, center, dcfg)
        return loss, (t_g, t_probs)

    def step(state: DINOState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        k_crop, k_drop = jax.random.split(step_rng)
        g_crops, l_crops = multi_crop(batch["image"], k_crop, dcfg)

        (loss, (t_logits, t_probs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.teacher,
                                   state.center, g_crops, l_crops, k_drop)
        live = None
        if freeze_last_steps > 0:
            # zero the grad (keeps the frozen phase out of the Adam moments)
            live = state.step >= freeze_last_steps
            grads = dict(grads, head=dict(
                grads["head"],
                last=grads["head"]["last"] * live.astype(jnp.float32)))

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if getattr(optimizer, "returns_new_params", False):
            params = updates
        else:
            params = optax.apply_updates(state.params, updates)
        if live is not None:
            # ... and pin the weights themselves, so decoupled weight decay
            # cannot move the frozen layer either (torch freezes by skipping
            # the param entirely; this is the jit-static equivalent)
            params = dict(params, head=dict(
                params["head"],
                last=jnp.where(live, params["head"]["last"],
                               state.params["head"]["last"])))

        m = _teacher_momentum(state.step, total_steps, dcfg)
        teacher = jax.tree.map(
            lambda t, s: (m * t.astype(jnp.float32)
                          + (1.0 - m) * s.astype(jnp.float32)).astype(t.dtype),
            state.teacher, params)
        cm = dcfg.center_momentum
        center = (cm * state.center
                  + (1.0 - cm) * jnp.mean(t_logits, axis=(0, 1)))

        # teacher-target entropy: the collapse monitor (H -> 0 = collapsed
        # to one prototype; H = log K = uniform). Cheap: t_probs is already
        # computed for the loss.
        ent = jnp.mean(-jnp.sum(t_probs * jnp.log(t_probs + 1e-12), -1))
        new_state = DINOState(step=state.step + 1, params=params,
                              opt_state=opt_state, teacher=teacher,
                              center=center)
        return new_state, {"loss": loss, "teacher_entropy": ent,
                           "ema_momentum": m,
                           "grad_norm": optax.global_norm(grads)}

    return jax.jit(step, donate_argnums=(0,))


def create_dino_train_state(rng, dcfg: DINOConfig, optimizer) -> DINOState:
    params = init_dino_params(rng, dcfg)
    teacher = jax.tree.map(jnp.copy, params)
    return DINOState(step=jnp.zeros((), jnp.int32), params=params,
                     opt_state=optimizer.init(params),
                     teacher=teacher,
                     center=jnp.zeros((dcfg.out_dim,), jnp.float32))


def dino_to_vit_params(dino_params: Params, cfg: ViTConfig, rng) -> Params:
    """Transfer a pretrained DINO encoder (conventionally the TEACHER —
    pass ``state.teacher``) into a classifier ViT pytree for fine-tuning:
    encoder weights carry over verbatim, the head is freshly initialized.

    ``cfg`` must describe the same encoder geometry with
    ``final_norm=True`` (the DINO encoder always normalizes its output)."""
    if not cfg.final_norm:
        raise ValueError("fine-tune cfg must set final_norm=True to match "
                         "the DINO encoder")
    fresh = init_params(rng, cfg)
    enc = dino_params["encoder"]
    out = dict(fresh)
    for key in ("patch_embed", "cls_token", "pos_embed", "blocks",
                "final_norm"):
        out[key] = enc[key]
    return out


def jit_dino_forward(dcfg: DINOConfig):
    return jax.jit(partial(dino_forward, dcfg=dcfg, deterministic=True))
