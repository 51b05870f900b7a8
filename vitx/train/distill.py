"""Knowledge distillation (DeiT-style) — a third training family.

Touvron et al. 2021 ("Training data-efficient image transformers &
distillation through attention"): train a student ViT against both the
labels and a (frozen) teacher's predictions. Beyond-reference capability
(the reference trains one model supervised, ``src/train.py``); built on the
same donated train-step machinery, so every kernel/remat/sharding knob
applies.

Both DeiT variants are supported:
- soft: KL(teacher_T || student_T) * T^2 at temperature ``tau``
- hard: cross-entropy against the teacher's argmax labels

The teacher can be ANY params+config pair — a vitx-trained model, an
imported reference ``.pt``, or a timm/HF pretrained ViT
(``vitx.interop.pretrained``). Teacher params are a step ARGUMENT (not
baked into the executable): the compile payload stays small and one
compiled step serves any teacher of that geometry.

Both DeiT FORMS are supported:
- head distillation (default): one classifier; the loss mixes CE and the
  distillation term on the same logits.
- distillation TOKEN (``ViTConfig(distill_token=True)``): DeiT's
  "distillation through attention" — a second learned token with its own
  head; CE applies to the CLS head, the teacher term to the distill head,
  and inference averages the two (vitx/nn/vit.py::forward).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from vitx.core.config import ViTConfig
from vitx.nn.vit import forward
from vitx.train.step import TrainState, cross_entropy_loss


def distill_loss(student_logits, teacher_logits, labels, mask=None, *,
                 alpha: float = 0.5, tau: float = 1.0, hard: bool = False,
                 label_smoothing: float = 0.0):
    """(1-alpha) * CE(labels) + alpha * distillation term."""
    ce = cross_entropy_loss(student_logits, labels, mask, label_smoothing)
    if hard:
        kd = cross_entropy_loss(student_logits,
                                jnp.argmax(teacher_logits, axis=-1), mask)
    else:
        t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / tau, axis=-1)
        logp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / tau,
                                  axis=-1)
        logt = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / tau,
                                  axis=-1)
        kl = jnp.sum(t * (logt - logp), axis=-1) * (tau * tau)
        if mask is None:
            kd = jnp.mean(kl)
        else:
            m = mask.astype(jnp.float32)
            kd = jnp.sum(kl * m) / jnp.maximum(jnp.sum(m), 1.0)
    return (1.0 - alpha) * ce + alpha * kd


def distill_train_step(state: TrainState, batch, teacher_params, rng, *,
                       cfg: ViTConfig, teacher_cfg: ViTConfig, optimizer,
                       alpha: float, tau: float, hard: bool,
                       label_smoothing: float = 0.0):
    """One distillation step. The teacher forward runs frozen (no grads)."""
    step_rng = (jax.random.fold_in(rng, state.step)
                if rng is not None else None)
    teacher_logits = jax.lax.stop_gradient(
        forward(teacher_params, batch["image"], teacher_cfg,
                deterministic=True))

    def _loss(params):
        if cfg.distill_token:
            # DeiT distillation-through-attention: CE on the CLS head,
            # teacher term on the distill head; the returned (metric)
            # logits are the eval-time head average
            from vitx.nn.vit import forward_heads

            cls_logits, dist_logits = forward_heads(
                params, batch["image"], cfg, rng=step_rng,
                deterministic=step_rng is None)
            ce = cross_entropy_loss(cls_logits, batch["label"],
                                    batch.get("mask"), label_smoothing)
            kd = distill_loss(dist_logits, teacher_logits, batch["label"],
                              batch.get("mask"), alpha=1.0, tau=tau,
                              hard=hard)
            loss = (1.0 - alpha) * ce + alpha * kd
            return loss, 0.5 * (cls_logits + dist_logits)
        logits = forward(params, batch["image"], cfg, rng=step_rng,
                         deterministic=step_rng is None)
        loss = distill_loss(logits, teacher_logits, batch["label"],
                            batch.get("mask"), alpha=alpha, tau=tau,
                            hard=hard, label_smoothing=label_smoothing)
        return loss, logits

    (loss, logits), grads = jax.value_and_grad(_loss, has_aux=True)(
        state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    if getattr(optimizer, "returns_new_params", False):
        params = updates
    else:
        params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    agree = (jnp.argmax(logits, axis=-1)
             == jnp.argmax(teacher_logits, axis=-1)).astype(jnp.float32)
    correct = (jnp.argmax(logits, axis=-1) == batch["label"])\
        .astype(jnp.float32)
    if "mask" in batch:
        m = batch["mask"].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        acc = jnp.sum(correct * m) / denom
        agree = jnp.sum(agree * m) / denom
    else:
        acc = jnp.mean(correct)
        agree = jnp.mean(agree)
    return new_state, {"loss": loss, "accuracy": acc,
                       "teacher_agreement": agree,
                       "grad_norm": optax.global_norm(grads)}


def make_distill_train_step(cfg: ViTConfig, teacher_cfg: ViTConfig,
                            optimizer, *, alpha: float = 0.5,
                            tau: float = 1.0, hard: bool = False,
                            label_smoothing: float = 0.0):
    """Jitted, state-donated distillation step:
    ``step(state, batch, teacher_params, rng) -> (state, metrics)``."""
    return jax.jit(
        partial(distill_train_step, cfg=cfg, teacher_cfg=teacher_cfg,
                optimizer=optimizer, alpha=alpha, tau=tau, hard=hard,
                label_smoothing=label_smoothing),
        donate_argnums=(0,),
    )
