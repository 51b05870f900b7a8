"""Jit-compiled train / eval steps.

The TPU-native replacement for the reference's per-batch Python loop
(``src/train.py:92-99``: forward, CrossEntropyLoss, zero_grad/backward/step,
then a forced device→host sync via ``loss.item()`` EVERY iteration). Here the
whole update is ONE donated, jit-compiled function; the host only syncs when
it reads the metrics it wants to log.

Optimizer: AdamW(lr, weight_decay=1e-4) matching train.py:66,137 defaults,
built on optax with a configurable schedule.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vitx.core.config import ViTConfig
from vitx.metrics import confusion_matrix
from vitx.nn.vit import forward, init_params


class TrainState(NamedTuple):
    """The full training state — a pytree, donated through train_step."""
    step: jnp.ndarray          # () int32 global step
    params: Any
    opt_state: Any


class _FusedOptimizer(NamedTuple):
    """optax GradientTransformation whose update returns NEW PARAMS (the
    single-pass Pallas AdamW, vitx/kernels/adamw.py) instead of deltas."""
    init: Any
    update: Any
    returns_new_params: bool = True


class EmaState(NamedTuple):
    """State of the params_ema transform: the shadow parameter pytree."""
    ema: Any


def params_ema(decay: float) -> optax.GradientTransformation:
    """Maintain an exponential moving average of the POST-update parameters
    inside the optimizer state (so it checkpoints/shards with everything
    else), passing updates through unchanged. Extract with
    ``get_ema_params(opt_state)``.
    """

    def init(params):
        # materialize a DISTINCT buffer per leaf: aliasing params here makes
        # the donated train step hand the same buffer to XLA twice
        return EmaState(ema=jax.tree.map(lambda p: jnp.array(p, copy=True),
                                         params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("params_ema requires params in update()")
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                           state.ema, new_p)
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def layerwise_lr_decay(decay: float, depth: int) -> optax.GradientTransformation:
    """Layer-wise learning-rate decay (the BEiT/ELECTRA fine-tuning recipe:
    Bao et al. 2022 §4.1; standard for MAE/DeiT fine-tunes): parameters
    closer to the input train with geometrically smaller learning rates.

    Group assignment (layer id ``i``, scale ``decay**(depth + 1 - i)``):
    embeddings (patch_embed / cls / dist / reg / pos) get id 0, encoder
    block ``l`` gets id ``l + 1``, and everything after the encoder (the
    classifier heads and final norm) gets id ``depth + 1`` → scale 1.

    TPU-native twist: vitx stacks block params along a leading layer axis
    (one ``lax.scan`` over the encoder), so per-layer scaling is ONE
    broadcast multiply per stacked leaf — a ``(depth, 1, ...)`` factor
    vector — instead of the reference-world's per-layer parameter groups.
    Placed AFTER adamw in the chain, it scales the whole update (normalized
    gradient AND decoupled weight decay), exactly equivalent to running
    each group at ``lr * scale``. Stateless → adds no checkpoint leaves.
    """
    head_keys = ("head", "dist_head", "final_norm")
    block_f = (decay ** (depth - jnp.arange(depth))).astype(jnp.float32)
    embed_f = decay ** (depth + 1)

    def update(updates, state, params=None):
        def scale(path, u):
            top = path[0].key
            if top == "blocks":
                f = block_f.reshape((depth,) + (1,) * (u.ndim - 1))
                return u * f.astype(u.dtype)
            if top in head_keys:
                return u
            return u * jnp.asarray(embed_f, u.dtype)
        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                         update)


def make_trainable_mask(train_filter: str | None):
    """A callable ``params -> bool pytree`` selecting the TRAINABLE leaves
    for a freeze policy (``optax.masked``-compatible):

    - ``"lora"``: LoRA adapter leaves (``blocks/lora_*``) plus the classifier
      heads (``head``/``dist_head``) and ``final_norm`` — the Hu et al. 2021
      recipe (adapters + task head train, backbone frozen).
    - ``"head"``: only the heads/final_norm — linear-probe-style head-only
      fine-tuning through the full training loop (frozen backbone).
    - ``None``/``"all"``: everything trains (returns None — no masking).
    """
    if train_filter in (None, "all"):
        return None
    if train_filter not in ("lora", "head"):
        raise ValueError(f"unknown train_filter {train_filter!r}; "
                         "have 'lora', 'head', 'all'/None")
    head_keys = ("head", "dist_head", "final_norm")

    def mask(params):
        def pick(path, _leaf):
            top = path[0].key
            if top in head_keys:
                return True
            if train_filter == "lora" and top == "blocks":
                return str(path[-1].key).startswith("lora_")
            return False
        return jax.tree_util.tree_map_with_path(pick, params)

    return mask


def get_ema_params(opt_state):
    """Find the EMA shadow params inside a (possibly chained) opt_state;
    returns None when the optimizer was built without ``ema_decay``."""
    for leaf_state in jax.tree.leaves(
            opt_state, is_leaf=lambda x: isinstance(x, EmaState)):
        if isinstance(leaf_state, EmaState):
            return leaf_state.ema
    return None


# Leaves that weight decay applies to under ``wd_exclude`` — the matrix
# weights only (timm's param-group rule): patch-embed kernels, the block
# projections, the head/MAP matrices, the MoE expert weights and the LoRA
# factors. Everything else — biases, LayerNorm scales/biases, LayerScale
# gains, QK-Norm scales, CLS/distill/register tokens, pos_embed, the MAP
# probe, the MoE router scale — is regularization-exempt (decaying a scale
# or a token embedding toward zero fights the very statistics LN restores;
# the standard ViT recipes all exclude them).
_WD_DECAY_LEAVES = frozenset({
    "kernel",                          # patch/conv stem kernels
    "wqkv", "wo", "w1", "w2", "w3", "w",   # block + head projections
    "wq", "wk", "wv", "wo_p", "mw1", "mw2",   # MAP head matrices
    "ew1", "ew2", "phi",               # Soft-MoE expert weights + dispatch
})


def weight_decay_mask(params):
    """Bool pytree: True on the leaves weight decay should touch (matrix
    weights), False on biases/norms/gains/token embeddings — the timm/DeiT
    "no weight decay" param-group rule, as an optax mask."""
    def pick(path, _leaf):
        name = str(path[-1].key)
        return name in _WD_DECAY_LEAVES or name.startswith("lora_")
    return jax.tree_util.tree_map_with_path(pick, params)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-4,
                   schedule=None, grad_clip: float | None = None,
                   accum_steps: int = 1, fused: bool | str = "auto",
                   ema_decay: float | None = None,
                   llrd: float | None = None, llrd_depth: int | None = None,
                   optimizer: str = "adamw",
                   trainable: str | None = None,
                   mu_dtype: str | None = None,
                   wd_exclude: bool = False):
    """AdamW (train.py:66 semantics) with optional schedule / grad clipping /
    gradient accumulation (`accum_steps` micro-batches per update).

    ``optimizer``: "adamw" (the reference's choice and the default),
    "sgd" (momentum 0.9, decoupled weight decay — the classic CNN recipe),
    "lion" (Chen et al. 2023; sign-momentum — typical lr ~1e-5..1e-4
    with 3-10x the AdamW weight decay), or "adafactor" (Shazeer & Stern
    2018; FACTORED second moments — optimizer memory sublinear in params:
    row+col statistics instead of a full fp32 moment per weight, the
    standard big-model memory saver). All compose identically with the
    schedule/EMA/LLRD/accumulation chain; checkpoints record the chain so
    eval/serve restore works for every choice.

    ``mu_dtype``: storage dtype for AdamW's FIRST moment (optax mu_dtype;
    e.g. "bfloat16" halves that buffer — 25% of AdamW's optimizer memory —
    with negligible trajectory drift; the variance stays fp32). adamw only.

    ``llrd``: layer-wise lr-decay factor (with ``llrd_depth`` = encoder
    depth) — see ``layerwise_lr_decay``. Stateless: checkpoints made with
    and without it are interchangeable.

    ``wd_exclude``: apply weight decay to MATRIX weights only (the
    timm/DeiT no-decay rule, ``weight_decay_mask``): biases, LayerNorm
    scales/biases, LayerScale gains and token/positional embeddings are
    exempt. Off by default — the reference decays everything (train.py:66)
    and the parity trajectories pin that. State-shape-neutral: checkpoints
    made with and without it restore interchangeably.

    ``fused``: use the single-pass Pallas AdamW kernel (vitx/kernels/adamw.py).
    Default OFF: measured on v5e (round 2), the per-leaf kernel launches run
    at 12.6 ms/update vs 6.2 ms for optax's XLA-fused chain at ViT-B size —
    XLA already fuses the optimizer elementwise chain well. The kernel stays
    available (and trajectory-exact, see tests) for fleets where optimizer
    HBM traffic dominates. Incompatible with accum_steps > 1 (MultiSteps'
    zero-update convention vs params-returning updates).
    """
    if optimizer not in ("adamw", "sgd", "lion", "adafactor"):
        raise ValueError(f"unknown optimizer {optimizer!r}; "
                         "have adamw, sgd, lion, adafactor")
    if mu_dtype is not None and optimizer != "adamw":
        raise ValueError("mu_dtype applies to the adamw moments only")
    use_fused = (fused is True and accum_steps == 1 and ema_decay is None
                 and llrd is None and optimizer == "adamw"
                 and trainable in (None, "all") and mu_dtype is None
                 and not wd_exclude)
    wd_mask = weight_decay_mask if wd_exclude else None
    tx = []
    if grad_clip is not None:
        tx.append(optax.clip_by_global_norm(grad_clip))
    lr_or_sched = schedule if schedule is not None else lr
    if use_fused:
        from vitx.kernels.adamw import fused_adamw

        tx.append(fused_adamw(lr_or_sched, weight_decay=weight_decay))
        opt = optax.chain(*tx)
        return _FusedOptimizer(init=opt.init, update=opt.update)
    if optimizer == "sgd":
        # SGDW (Loshchilov & Hutter 2019): the decay term joins AFTER the
        # momentum trace (so wd never enters the momentum buffer) but
        # BEFORE the lr scaling (so it anneals with the schedule) — truly
        # decoupled, matching how adamw/lion treat their weight_decay
        base = optax.chain(
            optax.trace(decay=0.9),
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.scale_by_learning_rate(lr_or_sched))
    elif optimizer == "lion":
        base = optax.lion(lr_or_sched, weight_decay=weight_decay,
                          mask=wd_mask)
    elif optimizer == "adafactor":
        # relative-step-size machinery OFF (explicit lr like the others, so
        # schedules/LLRD compose identically); factored stats stay on —
        # that's the memory win
        base = optax.adafactor(
            lr_or_sched, multiply_by_parameter_scale=False,
            clipping_threshold=None, weight_decay_rate=weight_decay or None,
            weight_decay_mask=wd_mask)
    else:
        base = optax.adamw(lr_or_sched, weight_decay=weight_decay,
                           mu_dtype=mu_dtype, mask=wd_mask)
    mask_fn = make_trainable_mask(trainable)
    if mask_fn is not None:
        # freeze policy (LoRA / head-only fine-tune): moments, weight decay
        # and lr scaling exist ONLY for the trainable leaves (optax.masked
        # stores a stateless MaskedNode per frozen leaf — the optimizer
        # memory is proportional to the adapters, not the backbone); the
        # complementary set_to_zero pins frozen updates to exact zeros so
        # frozen params are bit-identical across any number of steps,
        # independent of the train step's stop_gradient structure.
        inv = (lambda params: jax.tree.map(lambda m: not m,
                                           mask_fn(params)))
        base = optax.chain(optax.masked(base, mask_fn),
                           optax.masked(optax.set_to_zero(), inv))
    tx.append(base)
    if llrd is not None:
        if llrd_depth is None:
            raise ValueError("llrd requires llrd_depth (the encoder depth)")
        tx.append(layerwise_lr_decay(llrd, llrd_depth))
    if ema_decay is not None:
        # last in the chain: sees the final updates, shadows the params
        tx.append(params_ema(ema_decay))
    opt = optax.chain(*tx)
    if accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    return opt


def warmup_cosine(lr: float, total_steps: int, warmup_steps: int = 0,
                  end_lr_ratio: float = 0.0):
    """Linear warmup -> cosine decay, the standard ViT fine-tune schedule
    (the reference used a constant lr, train.py:137)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=lr * end_lr_ratio)


def create_train_state(rng, cfg: ViTConfig, optimizer) -> TrainState:
    params = init_params(rng, cfg)
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state)


def cross_entropy_loss(logits, labels, mask=None, label_smoothing=0.0,
                       class_weights=None):
    """Mean softmax cross-entropy — nn.CrossEntropyLoss parity (train.py:81).

    ``mask`` (0/1 per row) excludes the loader's padding rows from the mean
    so ragged final batches don't bias the loss or the gradients.
    ``label_smoothing``: standard uniform smoothing (the DeiT recipe knob;
    matches torch CrossEntropyLoss(label_smoothing=s)).
    ``class_weights``: (C,) per-class weights for imbalanced data — torch
    CrossEntropyLoss(weight=w) parity: per-class terms scale by w_c and the
    mean normalizes by the summed TARGET-class weights.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weights is None:
        if label_smoothing:
            s = label_smoothing
            nll = (1.0 - s) * nll + s * (-jnp.mean(logp, axis=-1))
        denom_w = None
    else:
        w = jnp.asarray(class_weights, jnp.float32)
        wy = w[labels]
        if label_smoothing:
            s = label_smoothing
            C = logp.shape[-1]
            nll = ((1.0 - s) * wy * nll
                   + (s / C) * jnp.sum(w[None, :] * (-logp), axis=-1))
        else:
            nll = wy * nll
        denom_w = wy
    if mask is None:
        if denom_w is None:
            return jnp.mean(nll)
        return jnp.sum(nll) / jnp.maximum(jnp.sum(denom_w), 1e-9)
    mask = mask.astype(jnp.float32)
    denom = (jnp.sum(mask) if denom_w is None
             else jnp.sum(denom_w * mask))
    return jnp.sum(nll * mask) / jnp.maximum(denom, 1e-9)


def sigmoid_bce_loss(logits, targets, mask=None):
    """Multi-label loss: mean sigmoid binary cross-entropy over classes,
    masked mean over rows — torch ``BCEWithLogitsLoss`` parity. ``targets``
    is (B, C) multi-hot (soft targets from mixup are fine: BCE is affine in
    the target)."""
    per = optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), targets.astype(jnp.float32))
    per = jnp.mean(per, axis=-1)              # mean over classes, per row
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1e-9)


def _cutmix_weight_map(rng, height, width, alpha):
    """Per-pixel keep-weight map for CutMix (Yun et al. 2019): 1 outside a
    random rectangle of expected area ``1 - Beta(alpha, alpha)``, 0 inside.
    The box is clipped at the borders; the caller recovers the EXACT mixing
    ratio as ``mean(map)`` (pixel-exact, as the paper's lambda adjustment)."""
    k_lam, k_x, k_y = jax.random.split(rng, 3)
    lam = jax.random.beta(k_lam, alpha, alpha)
    cut = jnp.sqrt(1.0 - lam)
    cy = jax.random.uniform(k_y, (), minval=0.0, maxval=float(height))
    cx = jax.random.uniform(k_x, (), minval=0.0, maxval=float(width))
    y0, y1 = cy - cut * height / 2, cy + cut * height / 2
    x0, x1 = cx - cut * width / 2, cx + cut * width / 2
    rows = jnp.arange(height, dtype=jnp.float32)[:, None]
    cols = jnp.arange(width, dtype=jnp.float32)[None, :]
    inside = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
    return 1.0 - inside.astype(jnp.float32)[None, :, :, None]


def _mix_weight_map(rng, image_shape, mixup_alpha, cutmix_alpha):
    """(1, H, W, 1) keep-weight map for input/target mixing.

    mixup only  -> constant Beta(a, a) map; cutmix only -> box map; both ->
    a 50/50 per-batch switch (the DeiT ``mixup_switch_prob`` recipe). The
    target mix coefficient is always ``mean(map)`` — exact for both modes.
    """
    _, height, width, _ = image_shape
    k_mix, k_cut, k_sw = jax.random.split(rng, 3)
    if mixup_alpha and cutmix_alpha:
        w_mix = jnp.full((1, height, width, 1),
                         jax.random.beta(k_mix, mixup_alpha, mixup_alpha))
        w_cut = _cutmix_weight_map(k_cut, height, width, cutmix_alpha)
        return jnp.where(jax.random.bernoulli(k_sw), w_cut, w_mix)
    if cutmix_alpha:
        return _cutmix_weight_map(k_cut, height, width, cutmix_alpha)
    return jnp.full((1, height, width, 1),
                    jax.random.beta(k_mix, mixup_alpha, mixup_alpha))


def loss_fn(params, batch, cfg: ViTConfig, rng, *,
            label_smoothing: float = 0.0, mixup_alpha: float | None = None,
            cutmix_alpha: float | None = None, class_weights=None,
            loss: str = "ce"):
    """Training loss. ``label_smoothing`` / ``mixup_alpha`` /
    ``cutmix_alpha`` implement the DeiT-style recipe knobs (mixup: Zhang et
    al. 2018 — convex input/target mixing with Beta(alpha, alpha) weights;
    cutmix: Yun et al. 2019 — rectangular patch replacement with pixel-exact
    target reweighting; both enabled -> 50/50 per-batch switch). All need
    ``rng``; pair with drop_last loaders so padded rows are never mixed into
    real ones."""
    if cfg.fuse_mlp == "auto":
        # measured (round 2, v5e): the fused MLP kernel wins on inference
        # (no LN/bias/act HBM seams) but its M=T per-item matmuls pay ~30%
        # MXU tile padding that XLA's full-batch weight-grad matmuls don't —
        # net ~1 ms/layer slower under grad. Keep it for eval/serving only.
        cfg = cfg.replace(fuse_mlp="off")
    if loss == "bce":
        # multi-label: (B, C) multi-hot targets through sigmoid BCE; the
        # single-label-only knobs are rejected up front (a silent softmax
        # smoothing applied to BCE targets would be a different objective)
        if label_smoothing or class_weights is not None:
            raise ValueError("loss='bce' does not compose with "
                             "label_smoothing / class_weights")
    elif loss != "ce":
        raise ValueError(f"unknown loss {loss!r} (have 'ce', 'bce')")
    image = batch["image"]
    mask = batch.get("mask")
    if (mixup_alpha or cutmix_alpha) and rng is not None:
        rng, k_perm, k_mix = jax.random.split(rng, 3)
        perm = jax.random.permutation(k_perm, image.shape[0])
        w = _mix_weight_map(k_mix, image.shape, mixup_alpha, cutmix_alpha)
        lam = jnp.mean(w)
        image = (w * image.astype(jnp.float32)
                 + (1.0 - w) * image[perm].astype(jnp.float32)
                 ).astype(image.dtype)
        logits = forward(params, image, cfg, rng=rng, deterministic=False)
        if loss == "bce":
            # BCE is affine in the target: mixing the multi-hot targets is
            # exactly the mixed-loss form used below for CE
            t = batch["label"].astype(jnp.float32)
            mixed = lam * t + (1.0 - lam) * t[perm]
            return sigmoid_bce_loss(logits, mixed, mask), logits
        loss_v = (lam * cross_entropy_loss(
                      logits, batch["label"], mask, label_smoothing,
                      class_weights)
                  + (1.0 - lam) * cross_entropy_loss(
                      logits, batch["label"][perm], mask, label_smoothing,
                      class_weights))
        return loss_v, logits
    logits = forward(params, image, cfg, rng=rng,
                     deterministic=rng is None)
    if loss == "bce":
        return sigmoid_bce_loss(logits, batch["label"], mask), logits
    loss_v = cross_entropy_loss(logits, batch["label"], mask,
                                label_smoothing, class_weights)
    return loss_v, logits


def train_step(state: TrainState, batch, rng, *, cfg: ViTConfig, optimizer,
               label_smoothing: float = 0.0,
               mixup_alpha: float | None = None,
               cutmix_alpha: float | None = None,
               sam_rho: float | None = None,
               class_weights=None, grad_shardings=None,
               train_filter: str | None = None, loss: str = "ce"):
    """One SGD step. batch: {"image": (B,H,W,C), "label": (B,)}.

    ``train_filter`` ("lora" / "head", see ``make_trainable_mask``): frozen
    leaves enter the loss through ``lax.stop_gradient``, so autodiff never
    emits their weight-gradient matmuls (roughly half the backward matmul
    FLOPs for a frozen backbone) and their gradient leaves are zeros. Pair
    with an optimizer built with the same ``trainable=`` so no moments are
    allocated for them either.

    ``grad_shardings``: optional pytree of shardings pinned onto the
    gradients the moment autodiff produces them (ZeRO-2: a data-axis spec
    here turns XLA's gradient all-reduce into a reduce-scatter, so the
    optimizer update runs on 1/dp of each tensor per rank against the
    ZeRO-1-sharded moments, and the updated params are all-gathered once).

    ``sam_rho``: sharpness-aware minimization (Foret et al. 2021; Chen et
    al. 2021 showed it lets ViTs match their augmented recipes from
    scratch). The update direction is the gradient at the adversarial
    point ``params + rho * g/||g||`` — one extra forward+backward per step
    (~2x step cost), same optimizer state, composes with every other
    recipe knob. Under a mesh the perturbation uses the GLOBAL gradient
    norm (XLA's all-reduced grads), so sharded trajectories stay exactly
    single-device-identical. With ``accum_steps > 1`` the ascent happens
    per MICRO-batch (the perturbation is computed before MultiSteps
    averages) — the "m-sharpness" variant, which the SAM paper found
    generalizes better than perturbing on the full accumulated batch."""
    step_rng = jax.random.fold_in(rng, state.step) if rng is not None else None
    base_loss = partial(loss_fn, label_smoothing=label_smoothing,
                        mixup_alpha=mixup_alpha, cutmix_alpha=cutmix_alpha,
                        class_weights=class_weights, loss=loss)
    mask_fn = make_trainable_mask(train_filter)
    if mask_fn is not None:
        mask = mask_fn(state.params)

        def masked_loss(params, batch, cfg, rng):
            p = jax.tree.map(
                lambda m, x: x if m else jax.lax.stop_gradient(x),
                mask, params)
            return base_loss(p, batch, cfg, rng)

        grad_fn = jax.value_and_grad(masked_loss, has_aux=True)
    else:
        grad_fn = jax.value_and_grad(base_loss, has_aux=True)
    (loss, logits), grads = grad_fn(state.params, batch, cfg, step_rng)
    if grad_shardings is not None:
        grads = jax.lax.with_sharding_constraint(grads, grad_shardings)
    grad_norm = optax.global_norm(grads)
    if sam_rho:
        # first-order SAM: re-evaluate the gradient at the ascent point,
        # keep loss/logits/metrics from the clean pass
        scale = sam_rho / (grad_norm + 1e-12)
        params_adv = jax.tree.map(
            lambda p, g: p + (scale * g).astype(p.dtype),
            state.params, grads)
        _, grads = grad_fn(params_adv, batch, cfg, step_rng)
        if grad_shardings is not None:
            grads = jax.lax.with_sharding_constraint(grads, grad_shardings)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    if getattr(optimizer, "returns_new_params", False):
        params = updates           # fused kernel already applied the step
    else:
        params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    if batch["label"].ndim == 2:
        # multi-label: per-element accuracy of the 0.5-threshold decisions
        correct = jnp.mean(((logits > 0)
                            == (batch["label"] > 0.5)).astype(jnp.float32),
                           axis=-1)
    else:
        correct = (jnp.argmax(logits, axis=-1) == batch["label"])\
            .astype(jnp.float32)
    if "mask" in batch:
        m = batch["mask"].astype(jnp.float32)
        acc = jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        acc = jnp.mean(correct)
    metrics = {
        "loss": loss,
        "accuracy": acc,
        "grad_norm": grad_norm,   # clean-pass norm (= SAM's ascent norm)
    }
    return new_state, metrics


def eval_step(params, batch, *, cfg: ViTConfig):
    """Forward + on-device confusion-matrix accumulation for one batch.

    ``batch["mask"]`` (optional, (B,) 0/1) excludes padding rows so ragged
    final batches can be padded to a static shape without biasing metrics.
    """
    logits = forward(params, batch["image"], cfg, deterministic=True)
    preds = jnp.argmax(logits, axis=-1)
    labels = batch["label"]
    if "mask" in batch:
        # route padded rows to a dummy (pred=0, label=0) then subtract them
        mask = batch["mask"].astype(jnp.int32)
        cm = confusion_matrix(preds * mask, labels * mask, cfg.num_classes)
        pad = jnp.sum(1 - mask)
        cm = cm.at[0, 0].add(-pad)
    else:
        cm = confusion_matrix(preds, labels, cfg.num_classes)
    loss = cross_entropy_loss(logits, labels, batch.get("mask"))
    return cm, loss


def make_train_step(cfg: ViTConfig, optimizer, *,
                    label_smoothing: float = 0.0,
                    mixup_alpha: float | None = None,
                    cutmix_alpha: float | None = None,
                    sam_rho: float | None = None,
                    class_weights=None, train_filter: str | None = None,
                    loss: str = "ce"):
    """Jitted train step with the state donated (in-place on device)."""
    return jax.jit(
        partial(train_step, cfg=cfg, optimizer=optimizer,
                label_smoothing=label_smoothing, mixup_alpha=mixup_alpha,
                cutmix_alpha=cutmix_alpha, sam_rho=sam_rho,
                class_weights=class_weights, train_filter=train_filter,
                loss=loss),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: ViTConfig):
    return jax.jit(partial(eval_step, cfg=cfg))
