"""The epoch-based training driver.

Capability equivalent of the reference's ``train(...)`` loop
(``src/train.py:46-119``): per-epoch train/eval, TensorBoard scalars with the
reference's tags, per-epoch checkpoints, auto-resume from the newest one —
minus its pathologies (per-step device→host sync at train.py:98, the
epoch-end NameError at train.py:115-119). Adds throughput/step-time scalars
and optional jax.profiler traces (SURVEY §5 observability plan).
"""

from __future__ import annotations

import dataclasses
import signal
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from vitx.core.config import ViTConfig
from vitx.metrics import confusion_to_metrics
from vitx.train.checkpoint import restore_latest, save_checkpoint
from vitx.train.logging import ScalarWriter
from vitx.train.step import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 10
    lr: float = 1e-4                  # reference default (train.py:137)
    weight_decay: float = 1e-4        # reference default (train.py:66)
    # Decay matrix weights only (step.py::weight_decay_mask — the timm
    # no-decay rule for biases/norms/gains/token embeddings). Default off:
    # the reference decays every parameter.
    wd_exclude: bool = False
    grad_clip: float | None = None
    # DeiT-style recipe knobs (vitx/train/step.py::loss_fn)
    label_smoothing: float = 0.0
    mixup_alpha: float | None = None
    cutmix_alpha: float | None = None
    # Sharpness-aware minimization (Foret 2021; the Chen 2021 ViT recipe):
    # ascend rho along the normalized gradient, update with the gradient
    # there. ~2x step cost. Typical: 0.05 (ViT-B ImageNet).
    sam_rho: float | None = None
    # Per-class loss weights for imbalanced data ((num_classes,) sequence;
    # torch CrossEntropyLoss(weight=...) parity). The train CLI's
    # --class-weights balanced computes n/(C*count_c) from the train split.
    class_weights: tuple | None = None
    # "ce" (single-label softmax cross-entropy, the reference task) or
    # "bce" (multi-label sigmoid BCE over (B, C) multi-hot labels —
    # step.py::sigmoid_bce_loss; eval reports micro/macro F1 + mAP via
    # vitx/metrics/multilabel.py instead of a confusion matrix).
    loss: str = "ce"
    # "adamw" (reference semantics), "sgd" (momentum 0.9, decoupled wd),
    # "lion" (Chen 2023), or "adafactor" (factored second moments,
    # sublinear optimizer memory) — see make_optimizer.
    optimizer: str = "adamw"
    # Storage dtype for adamw's first moment ("bfloat16" halves it); None
    # keeps optax's default (the param dtype, fp32 here).
    mu_dtype: str | None = None
    # Freeze policy (make_trainable_mask): None trains everything, except
    # that a ViTConfig with lora_rank > 0 defaults to "lora" (adapters +
    # heads train, backbone frozen — LoRA's defining semantics); "head"
    # trains only the classifier heads (linear-probe-style fine-tune).
    # Frozen leaves get no optimizer moments, no weight decay, and their
    # weight-gradient matmuls are never emitted (step.py::train_step).
    train_filter: str | None = None
    # Early stopping: end the run after this many CONSECUTIVE evals whose
    # val accuracy fails to beat the best seen by > early_stop_min_delta.
    # Counted in evals (so eval_every scales the horizon). None = off.
    early_stop_patience: int | None = None
    early_stop_min_delta: float = 0.0
    log_every: int = 50               # steps between scalar flushes
    checkpoint_dir: str | None = None
    log_dir: str | None = None
    keep_checkpoints: int | None = None
    eval_every: int = 1               # epochs between evals
    profile_epoch: int | None = None  # jax.profiler trace for this epoch
    # Per-flush in-epoch progress line (the reference's tqdm it/s surface,
    # train.py:88, without a per-step host sync).
    progress: bool = False
    # Save a checkpoint and stop cleanly on SIGTERM/SIGINT (TPU preemption
    # notice) — the reference could only resume from the last epoch boundary.
    preemption_safe: bool = True
    # Exponential moving average of params (shadow kept in opt_state; eval
    # and export use it when set). Typical: 0.999-0.9999.
    ema_decay: float | None = None
    # Layer-wise lr decay for fine-tuning (BEiT recipe): block l trains at
    # lr * llrd^(depth-l), embeddings at lr * llrd^(depth+1), heads at lr.
    # Typical: 0.65-0.75. None = uniform lr.
    llrd: float | None = None
    # Train steps folded into ONE device dispatch (a lax.scan over k stacked
    # batches, preprocessing included). For small models the per-dispatch
    # host/tunnel overhead dominates the sub-ms step (ViT-Tiny: 0.35 ms of
    # compute per step); k=8-32 amortizes it. Single-device only (mesh runs
    # are compute-bound); the epoch remainder runs through the 1-step path.
    steps_per_dispatch: int = 1
    # Gradient accumulation: average grads over k micro-batches before each
    # optimizer update (optax.MultiSteps) — effective batch = k × batch_size
    # without k× activation memory. Composes with dp meshes (per-device
    # micro-batches) and remat for batch sizes past HBM.
    accum_steps: int = 1
    # Microbatches per data shard for pipeline-parallel meshes (a mesh with
    # a "stage" axis, vitx/parallel/pipeline.py). Bubble fraction is
    # (stages-1)/(pp_microbatches+stages-1); per-shard batch must divide.
    pp_microbatches: int = 4
    # Pipeline schedule: "gpipe" (autodiff reverse pipeline, activation
    # memory O(microbatches)) or "1f1b" (hand-scheduled one-fwd-one-bwd,
    # activation memory O(stages) — raise pp_microbatches past GPipe's
    # memory ceiling to shrink the bubble; see pipeline.py::_pp_1f1b_grads
    # for the recompute/tick trade).
    pp_schedule: str = "gpipe"
    # Abort on a non-finite train loss at the next scalar flush (checked
    # host-side per log_every chunk — no extra device syncs). A diverged
    # run otherwise burns the rest of its epochs producing NaNs; the last
    # epoch-boundary checkpoint stays intact for a lower-lr resume.
    nan_abort: bool = True
    # Overlap checkpoint serialization with the next epoch's training: the
    # device->host snapshot still happens at the epoch boundary (the donated
    # step mutates device buffers), but npz/orbax serialization + pruning
    # run on a background thread (checkpoint.py::AsyncCheckpointWriter; one
    # save in flight, drained before exit). Worth it when the state is big
    # relative to the epoch (ViT-B fp32 state is ~1.4 GB ≈ seconds of disk).
    async_checkpoint: bool = False
    seed: int = 0


class NonFiniteLossError(RuntimeError):
    """Raised by Trainer when ``nan_abort`` sees a NaN/inf train loss."""


class Trainer:
    """Epoch loop over BatchLoader-style iterables.

    ``preprocess``: optional jitted (u8 images, rng, train=...) -> float
    images fn (vitx.data.pipeline.make_preprocess); when None, batches are
    fed to the model as-is.

    ``mesh``: a jax.sharding.Mesh (from vitx.parallel.make_mesh) turns this
    into a multi-chip trainer: state is placed per the (data, model)
    shardings (``tp``/``zero1`` select tensor-parallel and ZeRO-1 moment
    sharding), batches are sharded over the data axis, and the steps become
    SPMD — the single-device reference loop (src/train.py) scaled the
    TPU-native way.
    """

    def __init__(self, cfg: ViTConfig, tcfg: TrainerConfig, *,
                 preprocess: Callable | None = None,
                 train_step=None, eval_step=None, init_state=None,
                 mesh=None, tp: bool = False, zero1: bool = False,
                 zero2: bool = False, zero3: bool = False,
                 sp: bool = False, ep: bool = False, optimizer=None,
                 lr_schedule=None):
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh
        self._tp = tp
        from vitx.train.checkpoint import AsyncCheckpointWriter

        # constructed unconditionally: wait() is a no-op when unused, and
        # the sync path never touches it
        self._ckpt_writer = AsyncCheckpointWriter()
        # optional step -> lr callable, logged per epoch (observability
        # only — the jitted step embeds the schedule via the optimizer)
        self._lr_schedule = lr_schedule
        if tcfg.train_filter is None and cfg.lora_rank:
            # LoRA MEANS frozen base weights (Hu et al. 2021) — default the
            # freeze policy rather than silently full-fine-tuning adapters
            tcfg = self.tcfg = dataclasses.replace(tcfg,
                                                   train_filter="lora")
        # ``optimizer``: inject a custom optax transform (e.g. one built on
        # warmup_cosine); default is the reference's AdamW semantics
        self.optimizer = optimizer if optimizer is not None else \
            make_optimizer(lr=tcfg.lr, weight_decay=tcfg.weight_decay,
                           grad_clip=tcfg.grad_clip,
                           ema_decay=tcfg.ema_decay,
                           llrd=tcfg.llrd, llrd_depth=cfg.depth,
                           accum_steps=tcfg.accum_steps,
                           optimizer=tcfg.optimizer,
                           trainable=tcfg.train_filter,
                           mu_dtype=tcfg.mu_dtype,
                           wd_exclude=tcfg.wd_exclude)
        rng = jax.random.PRNGKey(tcfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state = (init_state if init_state is not None
                      else create_train_state(init_rng, cfg, self.optimizer))
        import optax as _optax
        _sched_leaf = lambda x: isinstance(x, _optax.ScaleByScheduleState)
        self._opt_has_schedule = any(
            _sched_leaf(n) for n in jax.tree_util.tree_leaves(
                self.state.opt_state, is_leaf=_sched_leaf))
        if (mesh is not None and "stage" in mesh.axis_names
                and mesh.shape["stage"] > 1):
            # pipeline-parallel mesh (vitx/parallel/pipeline.py)
            from vitx.parallel.pipeline import (
                make_pp_eval_step,
                make_pp_train_step,
                place_pp_state,
                pp_state_sharding,
            )

            if zero2 or zero3:
                raise ValueError("pipeline parallelism composes with dp, "
                                 "tp and zero1 only (zero2/zero3 use the "
                                 "pjit paths in vitx/parallel/sharded.py)")
            unsupported = [name for name, v in (
                ("mixup_alpha", tcfg.mixup_alpha),
                ("cutmix_alpha", tcfg.cutmix_alpha),
                ("sam_rho", tcfg.sam_rho),
                ("class_weights", tcfg.class_weights),
                ("train_filter", tcfg.train_filter)) if v]
            if unsupported:
                raise ValueError(
                    f"pipeline-parallel training supports label_smoothing "
                    f"only; unset {unsupported}")
            self.state = place_pp_state(self.state, cfg, mesh, zero1=zero1,
                                        tp=tp)
            shardings = pp_state_sharding(self.state, cfg, mesh,
                                          zero1=zero1, tp=tp)
            self.train_step = train_step or make_pp_train_step(
                cfg, self.optimizer, mesh, n_micro=tcfg.pp_microbatches,
                state_shardings=shardings,
                label_smoothing=tcfg.label_smoothing,
                schedule=tcfg.pp_schedule)
            self.eval_step = eval_step or make_pp_eval_step(
                cfg, mesh, n_micro=tcfg.pp_microbatches)
        elif mesh is not None:
            from vitx.parallel.sharded import (
                grad_sharding,
                make_parallel_eval_step,
                make_parallel_train_step,
                place_state,
                state_sharding,
            )

            # zero2 = zero1 moment layout + reduce-scattered grads
            zero1 = zero1 or zero2
            self.state = place_state(self.state, cfg, mesh, tp=tp,
                                     zero1=zero1, zero3=zero3, ep=ep)
            # ALWAYS pin the output state to its input shardings: left to
            # infer, the partitioner relayouts the whole state per dispatch
            # (measured 131 -> 111 ms/step at ViT-B b128 dp1, round 3)
            shardings = state_sharding(self.state, cfg, mesh, tp, zero1,
                                       zero3, ep=ep)
            gshard = (grad_sharding(self.state.params, cfg, mesh, tp, ep)
                      if zero2 and not zero3 else None)
            self.train_step = train_step or make_parallel_train_step(
                cfg, self.optimizer, mesh, tp=tp, zero1=zero1, zero3=zero3,
                sp=sp, ep=ep, state_shardings=shardings,
                grad_shardings=gshard,
                label_smoothing=tcfg.label_smoothing,
                mixup_alpha=tcfg.mixup_alpha,
                cutmix_alpha=tcfg.cutmix_alpha,
                sam_rho=tcfg.sam_rho,
                class_weights=tcfg.class_weights,
                train_filter=tcfg.train_filter, loss=tcfg.loss)
            self.eval_step = eval_step or make_parallel_eval_step(
                cfg, mesh, tp=tp, sp=sp, ep=ep)
        else:
            self.train_step = (train_step
                               or make_train_step(
                                   cfg, self.optimizer,
                                   label_smoothing=tcfg.label_smoothing,
                                   mixup_alpha=tcfg.mixup_alpha,
                                   cutmix_alpha=tcfg.cutmix_alpha,
                                   sam_rho=tcfg.sam_rho,
                                   class_weights=tcfg.class_weights,
                                   train_filter=tcfg.train_filter,
                                   loss=tcfg.loss))
            self.eval_step = eval_step or make_eval_step(cfg)
        self.preprocess = preprocess
        if tcfg.steps_per_dispatch > 1 and mesh is not None:
            raise ValueError("steps_per_dispatch > 1 is a single-device "
                             "dispatch-overhead optimization; mesh runs are "
                             "compute-bound — use per-device batch size")
        self._multi_step = None
        if tcfg.steps_per_dispatch > 1:
            self._multi_step = self._make_multi_step(
                tcfg.steps_per_dispatch)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from vitx.parallel.mesh import DATA_AXIS

            self._data_sharding = NamedSharding(mesh,
                                                PartitionSpec(DATA_AXIS))
        else:
            self._data_sharding = None
        self.start_epoch = 0
        self.history: list[dict[str, Any]] = []
        self._preempted = False

    def maybe_resume(self):
        """Resume from the newest {epoch}.ckpt (train.py:52-58 convention)."""
        if self.tcfg.checkpoint_dir is None:
            return None
        self.state, meta = restore_latest(self.tcfg.checkpoint_dir, self.state)
        if meta is not None:
            # a checkpoint written on preemption covers only part of its
            # epoch's data — re-run that epoch rather than skipping the rest
            self.start_epoch = int(meta["epoch"]) + (
                0 if meta.get("partial") else 1)
        return meta

    def _prep(self, batch, rng, train, *, placed=False):
        image = batch["image"]
        if self.preprocess is not None:
            image = self.preprocess(image, rng, train=train)
        out = {"image": image, "label": batch["label"]}
        if "mask" in batch:
            # padding rows are excluded from loss/grads/metrics in both
            # train and eval (loader pads ragged final batches)
            out["mask"] = batch["mask"]
        if self.mesh is not None and not placed:
            from vitx.parallel.sharded import shard_batch

            out = shard_batch(out, self.mesh)
        return out

    def _prefetch(self, loader):
        """Double-buffered host->device transfer: batch N+1's device_put
        overlaps batch N's step (vitx.data.pipeline.device_prefetch)."""
        from vitx.data.pipeline import device_prefetch

        return device_prefetch(iter(loader), size=2,
                               sharding=self._data_sharding)

    def _make_multi_step(self, k: int):
        """One jitted dispatch = lax.scan over ``k`` stacked batches:
        per-step preprocessing (train-mode augmentation) + train step, state
        donated through the whole chain. Returns (state, stacked metrics)."""
        from functools import partial

        from vitx.train.step import train_step as _train_step

        tcfg = self.tcfg
        raw = partial(_train_step, cfg=self.cfg, optimizer=self.optimizer,
                      label_smoothing=tcfg.label_smoothing,
                      mixup_alpha=tcfg.mixup_alpha,
                      cutmix_alpha=tcfg.cutmix_alpha,
                      sam_rho=tcfg.sam_rho,
                      class_weights=tcfg.class_weights,
                      train_filter=tcfg.train_filter)
        pre = self.preprocess

        def multi(state, batches, rng):
            def body(st, xs):
                batch, i = xs
                if pre is not None:
                    batch = dict(batch,
                                 image=pre(batch["image"],
                                           jax.random.fold_in(rng, 2 * i),
                                           train=True))
                st, m = raw(st, batch, jax.random.fold_in(rng, 2 * i + 1))
                return st, m
            return jax.lax.scan(body, state,
                                (batches, jnp.arange(k, dtype=jnp.uint32)))

        return jax.jit(multi, donate_argnums=(0,))

    def eval_params(self):
        """Params to evaluate/export: the EMA shadow when the optimizer
        maintains one (TrainerConfig.ema_decay), else the live params."""
        from vitx.train.step import get_ema_params

        ema = get_ema_params(self.state.opt_state)
        return ema if ema is not None else self.state.params

    def evaluate(self, eval_loader):
        """Accumulate ONE confusion matrix on device over the loader, then a
        single host transfer (vs the reference's per-batch host sync,
        train.py:29-44). Uses the EMA shadow params when enabled.

        tcfg.loss == "bce" (multi-label): ranking metrics (mAP) need the
        full score array, so eval gathers per-batch logits to host and
        reports micro/macro F1 + mAP (vitx/metrics/multilabel.py)."""
        if self.tcfg.loss == "bce":
            return self._evaluate_multilabel(eval_loader)
        cm = None
        loss_sum = None
        params = self.eval_params()
        for batch in self._prefetch(eval_loader):
            prepped = self._prep(batch, None, train=False, placed=True)
            cm_b, loss = self.eval_step(params, prepped)
            # weight each batch-mean loss by its valid-sample count (the CM
            # total) so a padded ragged final batch doesn't bias the mean —
            # the same fix the CM metrics already have
            w_loss = loss * jnp.sum(cm_b).astype(loss.dtype)
            cm = cm_b if cm is None else cm + cm_b
            loss_sum = w_loss if loss_sum is None else loss_sum + w_loss
        if cm is None:
            return {}
        metrics = jax.device_get(confusion_to_metrics(cm))
        metrics = {k: (float(v) if getattr(v, "shape", None) == () else v)
                   for k, v in metrics.items()}
        cm_host = np.asarray(jax.device_get(cm))
        metrics["loss"] = float(jax.device_get(loss_sum)) / \
            max(float(cm_host.sum()), 1.0)
        metrics["confusion_matrix"] = cm_host
        return metrics

    def _evaluate_multilabel(self, eval_loader):
        from functools import partial

        from vitx.metrics.multilabel import multilabel_metrics
        from vitx.nn.vit import forward
        from vitx.train.step import sigmoid_bce_loss

        params = self.eval_params()
        cfg = self.cfg
        if self.mesh is not None:
            from vitx.parallel.sharded import tp_safe_cfg

            # tp shards block weights: route around the fused kernels the
            # same way the parallel train/eval steps do
            cfg = tp_safe_cfg(cfg, self._tp)
        fwd = jax.jit(partial(forward, cfg=cfg))
        scores, targets = [], []
        loss_sum, n = 0.0, 0
        for batch in self._prefetch(eval_loader):
            prepped = self._prep(batch, None, train=False, placed=True)
            logits = fwd(params, prepped["image"])
            m = np.asarray(prepped.get(
                "mask", np.ones(logits.shape[0], np.int32))) > 0
            k = int(m.sum())
            loss_sum += float(sigmoid_bce_loss(
                logits, prepped["label"],
                prepped.get("mask", None))) * k
            n += k
            scores.append(np.asarray(jax.device_get(logits))[m])
            targets.append(np.asarray(jax.device_get(
                prepped["label"]))[m])
        if not scores:
            return {}
        metrics = multilabel_metrics(np.concatenate(scores),
                                     np.concatenate(targets))
        metrics["loss"] = loss_sum / max(n, 1)
        return metrics

    def fit(self, train_loader, eval_loader=None):
        tcfg = self.tcfg
        writer = (ScalarWriter(tcfg.log_dir) if tcfg.log_dir else None)
        resumed = self.maybe_resume()
        if resumed is not None:
            print(f"resumed from epoch {resumed['epoch']}")

        old_handlers = {}
        if tcfg.preemption_safe and tcfg.checkpoint_dir is not None:
            def on_preempt(signum, frame):
                self._preempted = True
                # restore the previous handlers so a second signal (e.g. a
                # repeat Ctrl-C on a wedged run) interrupts instead of being
                # swallowed by this one-shot checkpoint-and-exit handler
                for s, h in old_handlers.items():
                    signal.signal(s, h)
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    old_handlers[sig] = signal.signal(sig, on_preempt)
                except ValueError:   # not the main thread
                    break

        best_acc, best_epoch, stale_evals = -1.0, None, 0
        stop_early = False
        try:
            for epoch in range(self.start_epoch, tcfg.epochs):
                if tcfg.profile_epoch == epoch and tcfg.log_dir:
                    jax.profiler.start_trace(str(tcfg.log_dir))
                stats = self._train_epoch(train_loader, epoch, writer)

                # under preemption, every second between the signal and the
                # checkpoint write risks the kill grace window — skip the
                # eval pass and go straight to saving the partial epoch
                if eval_loader is not None and not self._preempted and \
                        (epoch + 1) % tcfg.eval_every == 0:
                    em = self.evaluate(eval_loader)
                    acc = float(em["accuracy"])
                    if acc > best_acc + tcfg.early_stop_min_delta:
                        best_acc, best_epoch, stale_evals = acc, epoch, 0
                    elif tcfg.early_stop_patience is not None:
                        stale_evals += 1
                        stop_early = (stale_evals
                                      >= tcfg.early_stop_patience)
                    stats.update({f"val_{k}": v for k, v in em.items()
                                  if not hasattr(v, "shape") or v.shape == ()})
                    if writer:
                        # reference's literal tag (train.py:106)
                        writer.add_scalar("val?acc", em["accuracy"], epoch)
                        if "precision_weighted" in em:
                            writer.add_scalar("Val/precision_weighted",
                                              em["precision_weighted"],
                                              epoch)
                            writer.add_scalar("Val/recall_weighted",
                                              em["recall_weighted"], epoch)
                        if "mAP" in em:    # multi-label (tcfg.loss="bce")
                            writer.add_scalar("Val/mAP", em["mAP"], epoch)
                            writer.add_scalar("Val/f1_micro",
                                              em["f1_micro"], epoch)
                if writer and self._lr_schedule is not None:
                    # the schedule's horizon is in OPTIMIZER UPDATES: under
                    # gradient accumulation optax.MultiSteps ticks it once
                    # per accum_steps micro-batches (cli/train.py)
                    cur = int(jax.device_get(self.state.step)) \
                        // max(1, tcfg.accum_steps)
                    writer.add_scalar("LR", float(self._lr_schedule(cur)),
                                      epoch)

                if tcfg.profile_epoch == epoch and tcfg.log_dir:
                    jax.profiler.stop_trace()

                if tcfg.checkpoint_dir is not None:
                    import json as _json

                    # self-describing: consumers (eval/serve CLIs) rebuild
                    # the exact model geometry from the checkpoint itself
                    meta = {"loss": stats.get("loss", 0.0),
                            "step": int(self.state.step),
                            "config": _json.loads(self.cfg.to_json())}
                    if tcfg.loss != "ce":
                        # eval CLI switches to the multi-label report
                        meta["loss_type"] = tcfg.loss
                    if tcfg.ema_decay is not None:
                        # consumers (eval/serve) rebuild a structure-matched
                        # optimizer template and prefer the EMA shadow
                        meta["ema_decay"] = tcfg.ema_decay
                    if tcfg.accum_steps > 1:
                        meta["accum_steps"] = tcfg.accum_steps
                    if tcfg.optimizer != "adamw":
                        # sgd/lion opt_states have different leaf structure;
                        # eval/serve rebuild the template from this
                        meta["optimizer"] = tcfg.optimizer
                    if tcfg.train_filter:
                        # masked optimizers store no moments for frozen
                        # leaves — the restore template must mask identically
                        meta["train_filter"] = tcfg.train_filter
                    if self._opt_has_schedule:
                        # an lr schedule adds a ScaleByScheduleState count
                        # leaf — record it so the eval/serve template matches
                        meta["schedule"] = True
                    if self._preempted:
                        # epoch was cut short — resume must re-run it
                        meta["partial"] = True
                    # jax.device_get snapshots to host BEFORE the next
                    # epoch's donated steps mutate the device buffers; the
                    # async writer overlaps only the serialization
                    host_state = jax.device_get(self.state)
                    save_kw = dict(meta=meta, keep=tcfg.keep_checkpoints,
                                   # pruning must not delete the
                                   # best-accuracy epoch (the one early
                                   # stopping exists to preserve)
                                   protect=best_epoch)
                    if tcfg.async_checkpoint:
                        self._ckpt_writer.save(tcfg.checkpoint_dir,
                                               host_state, epoch, **save_kw)
                    else:
                        save_checkpoint(tcfg.checkpoint_dir, host_state,
                                        epoch, **save_kw)
                self.history.append({"epoch": epoch, **stats})
                msg = ", ".join(f"{k}={v:.4f}" for k, v in stats.items()
                                if isinstance(v, (int, float)))
                print(f"epoch {epoch}: {msg}")
                if self._preempted:
                    print(f"preemption signal received — checkpointed "
                          f"epoch {epoch}, exiting cleanly")
                    break
                if stop_early:
                    print(f"early stop at epoch {epoch}: val accuracy "
                          f"stale for {stale_evals} evals "
                          f"(best {best_acc:.4f} at epoch {best_epoch})")
                    break
        finally:
            # drain the async checkpoint writer FIRST: a preemption exit
            # must not lose the final epoch's in-flight save
            self._ckpt_writer.wait()
            if writer:
                writer.close()
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
        return self.history

    def _train_epoch(self, train_loader, epoch, writer):
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        t0 = time.time()
        n_images = 0
        n_images_dev = []     # per-batch valid counts, fetched with _flush
        running_loss = 0.0
        last_metrics = None
        pending = []          # (step, metrics) not yet host-synced
        # host-side step counter: int(state.step) would force a device sync
        # every iteration, serializing the pipeline
        step = int(jax.device_get(self.state.step))
        k = self.tcfg.steps_per_dispatch if self._multi_step else 1
        buf = []

        def run_single(batch):
            nonlocal step, n_images
            self.rng, prep_rng, step_rng = jax.random.split(self.rng, 3)
            prepped = self._prep(batch, prep_rng, train=True, placed=True)
            self.state, metrics = self.train_step(self.state, prepped,
                                                  step_rng)
            step += 1
            if "mask" in batch:
                # device-resident (prefetched) mask: defer the count to the
                # chunked flush — int(...) here would sync every step
                n_images_dev.append(jnp.sum(batch["mask"]))
            else:
                n_images += batch["image"].shape[0]
            pending.append((step, metrics))

        def run_multi():
            # k steps in ONE dispatch: stacked batches scanned on device
            # (preprocessing inside the program; see _make_multi_step)
            nonlocal step, n_images
            self.rng, disp_rng = jax.random.split(self.rng)
            stacked = {key: jnp.stack([b[key] for b in buf])
                       for key in buf[0]}
            self.state, ms = self._multi_step(self.state, stacked, disp_rng)
            for i in range(k):
                step += 1
                pending.append((step,
                                {kk: vv[i] for kk, vv in ms.items()}))
            if "mask" in buf[0]:
                n_images_dev.append(jnp.sum(stacked["mask"]))
            else:
                n_images += sum(b["image"].shape[0] for b in buf)

        for batch in self._prefetch(train_loader):
            if self._preempted:
                break   # finish the epoch early; caller checkpoints + exits
            if k > 1:
                buf.append(batch)
                if len(buf) < k:
                    continue
                run_multi()
                buf = []
            else:
                run_single(batch)
            # flush asynchronously-computed scalars in chunks: no per-step sync
            if len(pending) >= self.tcfg.log_every:
                running_loss += self._flush(pending, writer)
                last_metrics = pending[-1][1]
                pending = []
                if n_images_dev:
                    n_images += int(np.sum(jax.device_get(n_images_dev)))
                    n_images_dev = []
                if self.tcfg.progress:
                    rate = n_images / max(time.time() - t0, 1e-9)
                    loss = float(jax.device_get(last_metrics["loss"]))
                    print(f"\r  epoch {epoch} step {step}: "
                          f"loss={loss:.4f} {rate:.1f} img/s", end="",
                          flush=True)
        # epoch remainder smaller than a full dispatch group: 1-step path
        if not self._preempted:
            for batch in buf:
                run_single(batch)
        if pending:
            running_loss += self._flush(pending, writer)
            last_metrics = pending[-1][1]
        if n_images_dev:
            n_images += int(np.sum(jax.device_get(n_images_dev)))
        if self.tcfg.progress:
            print()
        dt = time.time() - t0
        stats = {
            "loss": float(jax.device_get(last_metrics["loss"]))
            if last_metrics else float("nan"),
            "epoch_loss_sum": running_loss,
            "images_per_sec": n_images / dt,
            "epoch_secs": dt,
        }
        if writer:
            writer.add_scalar("Throughput/images_per_sec",
                              stats["images_per_sec"], epoch)
        return stats

    def _flush(self, pending, writer) -> float:
        total = 0.0
        for step, m in pending:
            loss = float(jax.device_get(m["loss"]))
            total += loss
            if writer:
                # reference's per-step tag (train.py:99)
                writer.add_scalar("Loss/train_batch", loss, step)
            if self.tcfg.nan_abort and not np.isfinite(loss):
                raise NonFiniteLossError(
                    f"non-finite train loss ({loss}) at step {step}: the "
                    f"run has diverged. The last epoch-boundary checkpoint "
                    f"is intact — resume with a lower lr and/or grad_clip "
                    f"(set TrainerConfig.nan_abort=False to keep going)")
        return total
