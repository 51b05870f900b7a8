"""Pipeline parallelism: GPipe-style stage pipelining over a ``stage`` mesh
axis (Huang et al. 2019), expressed the TPU-native way.

The reference is strictly single-device (SURVEY.md §2.12); dp/tp/ZeRO live
in ``vitx/parallel/sharded.py``. This module adds the remaining classic
axis: the encoder's stacked blocks are SPLIT across devices — stage ``s``
holds layers ``[s*L/S, (s+1)*L/S)`` — and microbatches stream through the
stages. Where the GPU world hand-writes NCCL send/recv per stage, here the
whole schedule is ONE jitted program: a ``shard_map`` over the mesh whose
inter-stage handoff is ``lax.ppermute`` (point-to-point over ICI) inside a
``lax.scan`` over pipeline ticks. Autodiff differentiates straight through
it — the transpose of ``ppermute`` is the reverse permute, so the backward
pass pipelines in reverse schedule automatically; no hand-written backward
pipeline.

Semantics are EXACT vs single-device training (tests/test_pipeline.py pins
trajectory identity): a stage boundary carries ``x + pending`` (the fused
residual pair ``run_blocks`` threads between blocks) which is bit-identical
to re-entering the next block with ``pending = 0``, and the loss/metrics
are masked to the last stage's real outputs then psum-reduced.

Composition: the mesh is (data, stage) — data parallelism over the first
axis comes for free (batch sharded, gradient psum), and ``zero1=True``
shards the Adam moments over ``data`` exactly as in the dp path. Tensor
parallelism composes at the per-stage level in principle but is out of
scope here (tp wants the fully-sharded pjit path in sharded.py; pp targets
the model-doesn't-fit-one-chip regime where stages, not heads, are cut).

When to use pp over ZeRO-3: both shard weights over devices, but ZeRO-3
all-gathers every layer on use (ICI bandwidth per step ~ 2x params) while
pp moves only (mb, T, E) activations between neighbor stages — the better
fit when activations are small vs weights (big model, modest batch) or when
the interconnect is weak on all-to-all but strong on neighbor links.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitx.core.config import ViTConfig
from vitx.metrics.metrics import confusion_matrix
from vitx.nn.layers import layer_norm
from vitx.nn.vit import classify, embed_tokens, run_blocks
from vitx.parallel.mesh import DATA_AXIS
from vitx.parallel.sharded import param_pspecs, state_sharding
from vitx.train.step import TrainState, cross_entropy_loss

STAGE_AXIS = "stage"


def make_pp_mesh(dp: int | None = None, pp: int = 2, devices=None) -> Mesh:
    """Build a (data, stage) mesh. Neighbor stages should sit on neighbor
    devices so the ppermute handoff rides one ICI hop;
    ``mesh_utils.create_device_mesh`` lays the minor axis out that way."""
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % pp:
            raise ValueError(f"{n} devices not divisible by pp={pp}")
        dp = n // pp
    need = dp * pp
    if need > n:
        raise ValueError(f"need {need} devices (dp={dp} x pp={pp}), have {n}")
    try:
        arr = mesh_utils.create_device_mesh((dp, pp), devices=devices[:need])
    except Exception:
        arr = np.asarray(devices[:need]).reshape(dp, pp)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def pp_param_pspecs(cfg: ViTConfig) -> dict:
    """PartitionSpecs for pipeline parallelism: every stacked (L, ...) block
    leaf is sharded over ``stage`` on its layer dim; everything else
    (embed/cls/pos/head — tiny vs the blocks) is replicated."""
    if cfg.moe_experts:
        raise ValueError(
            "pipeline parallelism over Soft-MoE models is unsupported: pp "
            "splits the homogeneous dense block stack across stages; use "
            "dp/tp/ep for MoE configs (vitx/parallel/sharded.py)")
    specs = param_pspecs(cfg, tp=False)
    specs["blocks"] = jax.tree.map(
        lambda s: P(STAGE_AXIS), specs["blocks"],
        is_leaf=lambda x: isinstance(x, P))
    return specs


def pp_param_sharding(cfg: ViTConfig, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        pp_param_pspecs(cfg),
                        is_leaf=lambda x: isinstance(x, P))


def pp_state_sharding(state: TrainState, cfg: ViTConfig, mesh: Mesh,
                      zero1: bool = False):
    """TrainState shardings under pp: params per ``pp_param_pspecs``,
    moments following their parameter (plus a ``data``-axis split with
    ``zero1=True`` — ZeRO-1 composes with pp unchanged)."""
    return state_sharding(state, cfg, mesh, zero1=zero1,
                          pshard=pp_param_sharding(cfg, mesh))


def place_pp_state(state: TrainState, cfg: ViTConfig, mesh: Mesh,
                   zero1: bool = False) -> TrainState:
    shardings = pp_state_sharding(state, cfg, mesh, zero1=zero1)
    return jax.tree.map(jax.device_put, state, shardings)


def _check_pp_cfg(cfg: ViTConfig, pp: int, for_train: bool):
    if cfg.depth % pp:
        raise ValueError(f"depth={cfg.depth} not divisible by pp={pp}")
    if cfg.distill_token:
        raise ValueError("pipeline parallelism does not support "
                         "distill_token models")
    if for_train and (cfg.dropout or cfg.drop_path or cfg.patch_drop):
        raise ValueError(
            "the pipeline-parallel train step runs the deterministic "
            "forward; set dropout=0, drop_path=0, patch_drop=0 (stochastic "
            "regularizers need per-stage rng plumbing — use the dp/ZeRO "
            "paths in vitx/parallel/sharded.py for those recipes)")


def _pp_tokens(params, images, cfg: ViTConfig, pp: int, n_micro: int):
    """The pipelined encoder forward, per-device view inside shard_map.

    Stage ``s`` holds ``cfg.depth // pp`` blocks (its local slice of the
    stacked params). Tick ``t`` runs microbatch ``t - s`` through stage
    ``s`` (garbage zeros flow during warmup/drain ticks — their outputs are
    overwritten or masked, so they carry zero gradient). The handoff is the
    SUMMED residual pair: ``run_blocks`` returns ``x + pending``, and
    re-entering the next stage with ``pending = 0`` is exact (the first op
    is ``add_layer_norm(x, pending)``; adding 0 is a floating-point no-op).

    Returns encoder tokens (B_local, T, E) — REAL only on the last stage.
    """
    stage = jax.lax.axis_index(STAGE_AXIS)
    tokens = embed_tokens(params, images, cfg)   # replicated stage compute:
    # one patch-embed matmul per stage (~3% of a 12-block stage's FLOPs);
    # only stage 0's value is consumed, so the others carry zero gradient.
    b_local, t_len, e = tokens.shape
    if b_local % n_micro:
        raise ValueError(f"per-data-shard batch {b_local} not divisible by "
                         f"n_micro={n_micro}")
    mb = b_local // n_micro
    tok_mb = tokens.reshape(n_micro, mb, t_len, e)
    perm = [(i, i + 1) for i in range(pp - 1)]
    n_ticks = n_micro + pp - 1

    def tick(carry, t):
        x_c, outbuf = carry
        idx = jnp.clip(t, 0, n_micro - 1)
        feed = jax.lax.dynamic_index_in_dim(tok_mb, idx, 0, keepdims=False)
        x_in = jnp.where(stage == 0, feed, x_c)
        y, _ = run_blocks(params["blocks"], x_in, cfg, rng=None,
                          deterministic=True)
        # last stage: microbatch t-(pp-1) finishes at tick t. Early ticks
        # write garbage to slot 0; tick pp-1's real write overwrites it.
        oidx = jnp.clip(t - (pp - 1), 0, n_micro - 1)
        outbuf = jax.lax.dynamic_update_index_in_dim(outbuf, y, oidx, 0)
        x_next = jax.lax.ppermute(y, STAGE_AXIS, perm)
        return (x_next, outbuf), None

    # the zero inits are literal-constant (device-invariant) but the carry
    # becomes stage/data-varying after one tick; mark them varying so
    # shard_map's VMA check accepts the scan
    init = jax.lax.pcast(
        (jnp.zeros((mb, t_len, e), tokens.dtype),
         jnp.zeros((n_micro, mb, t_len, e), tokens.dtype)),
        (DATA_AXIS, STAGE_AXIS), to="varying")
    (_, outbuf), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
    x = outbuf.reshape(b_local, t_len, e)
    if cfg.final_norm:
        fn = params["final_norm"]
        x = layer_norm(x, fn["scale"], fn["bias"], eps=cfg.layer_norm_eps)
    return x


def _pp_logits_local(params, batch, cfg, pp, n_micro):
    x = _pp_tokens(params, batch["image"], cfg, pp, n_micro)
    return classify(params, x, cfg)


def _mask_count(batch):
    mask = batch.get("mask")
    if mask is None:
        return None, jnp.float32(batch["label"].shape[0])
    mask = mask.astype(jnp.float32)
    return mask, jnp.sum(mask)


def _pp_loss_local(params, batch, cfg: ViTConfig, pp: int, n_micro: int,
                   label_smoothing: float):
    """This device's CONTRIBUTION to the global-mean CE (and accuracy):
    the per-shard loss sum masked to the last stage, normalized by the
    global (mask-aware) row count. The global loss is the psum of these —
    but the psum must NOT be inside the differentiated function: under the
    unchecked collectives this module runs with (see make_pp_train_step),
    psum transposes to psum, which would scale every gradient by the device
    count. The caller differentiates THIS local term per device, psums the
    GRADIENTS (``_reduce_grads`` — the same cross-device sum autodiff of a
    checked psum would produce), and psums the value only for reporting."""
    stage = jax.lax.axis_index(STAGE_AXIS)
    logits = _pp_logits_local(params, batch, cfg, pp, n_micro)
    mask, count = _mask_count(batch)
    loss_mean = cross_entropy_loss(logits, batch["label"], mask,
                                   label_smoothing)
    is_last = (stage == pp - 1).astype(jnp.float32)
    # count/is_last carry no parameter gradient, so this psum is safe to
    # differentiate past (it is a constant w.r.t. params)
    n = jax.lax.psum(jax.lax.pcast(count * is_last, (DATA_AXIS,),
                                to="varying"),
                     (DATA_AXIS, STAGE_AXIS))
    n = jnp.maximum(n, 1.0)
    loss_local = loss_mean * count * is_last / n

    correct = (jnp.argmax(logits, axis=-1) == batch["label"])\
        .astype(jnp.float32)
    if mask is not None:
        correct = correct * mask
    acc_local = jnp.sum(correct) * is_last / n
    return loss_local, acc_local


def _reduce_grads(grads):
    """Gradient reductions the SPMD partitioner would have inserted:
    psum over ``data`` for everything (manual-mesh data parallelism), plus
    psum over ``stage`` for the replicated non-block leaves (their gradient
    is nonzero only on the stage that consumes them — stage 0 for the
    embedding, the last stage for the head)."""
    out = {k: jax.tree.map(lambda g: jax.lax.psum(g, (DATA_AXIS, STAGE_AXIS)),
                           v)
           for k, v in grads.items() if k != "blocks"}
    out["blocks"] = jax.tree.map(lambda g: jax.lax.psum(g, DATA_AXIS),
                                 grads["blocks"])
    return out


def make_pp_train_step(cfg: ViTConfig, optimizer, mesh: Mesh,
                       n_micro: int = 4, state_shardings=None,
                       label_smoothing: float = 0.0):
    """Jitted pipeline-parallel train step (state donated).

    ``n_micro`` microbatches per data shard stream through the
    ``mesh.shape['stage']`` stages; bubble fraction = (S-1)/(M+S-1), so use
    the largest M the per-shard batch allows. Loss/accuracy/trajectory are
    exactly single-device (see tests/test_pipeline.py). The optimizer
    update runs OUTSIDE the shard_map under pjit, partitioned by the pinned
    ``state_shardings`` (from ``pp_state_sharding`` — pass it; inferred
    shardings relayout the state per dispatch, see ROADMAP round-3 notes).
    """
    pp = mesh.shape[STAGE_AXIS]
    _check_pp_cfg(cfg, pp, for_train=True)
    pspecs = pp_param_pspecs(cfg)

    def loss_and_grads(params, batch):
        def loss_f(p):
            return _pp_loss_local(p, batch, cfg, pp, n_micro,
                                  label_smoothing)

        (loss_l, acc_l), grads = jax.value_and_grad(
            loss_f, has_aux=True)(params)
        # reduce the local contributions to the replicated global values
        loss = jax.lax.psum(loss_l, (DATA_AXIS, STAGE_AXIS))
        acc = jax.lax.psum(acc_l, (DATA_AXIS, STAGE_AXIS))
        return loss, acc, _reduce_grads(grads)

    def step(state: TrainState, batch, rng=None):
        del rng   # deterministic forward (see _check_pp_cfg)
        if "mask" in batch:
            bspecs = {"image": P(DATA_AXIS), "label": P(DATA_AXIS),
                      "mask": P(DATA_AXIS)}
        else:
            bspecs = {"image": P(DATA_AXIS), "label": P(DATA_AXIS)}
        # check_vma=False: the VMA tracker rejects the TRANSPOSE of the
        # pipeline scan (stage-varying block params x data-varying
        # activations produce carry types its unifier can't match — JAX's
        # own error suggests this flag). The replication claims in
        # out_specs are made true by the explicit psums in _pp_loss /
        # _reduce_grads; test_pipeline.py pins trajectory identity.
        loss, acc, grads = jax.shard_map(
            loss_and_grads, mesh=mesh, in_specs=(pspecs, bspecs),
            out_specs=(P(), P(), pspecs),
            check_vma=False)(state.params, batch)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {"loss": loss, "accuracy": acc, "grad_norm": grad_norm}
        return new_state, metrics

    kw = {}
    if state_shardings is not None:
        rep = NamedSharding(mesh, P())
        kw["out_shardings"] = (state_shardings,
                               {"loss": rep, "accuracy": rep,
                                "grad_norm": rep})
    return jax.jit(step, donate_argnums=(0,), **kw)


def make_pp_eval_step(cfg: ViTConfig, mesh: Mesh, n_micro: int = 4):
    """Jitted pipeline-parallel eval step: (params, batch) -> (confusion
    matrix, loss), both replicated — the ``eval_step`` contract
    (vitx/train/step.py) over a (data, stage) mesh."""
    pp = mesh.shape[STAGE_AXIS]
    _check_pp_cfg(cfg, pp, for_train=False)
    if cfg.tome_r:
        raise ValueError("pp eval runs the full-token encoder; tome_r is "
                         "unsupported (use the dp path)")
    pspecs = pp_param_pspecs(cfg)

    def eval_local(params, batch):
        stage = jax.lax.axis_index(STAGE_AXIS)
        logits = _pp_logits_local(params, batch, cfg, pp, n_micro)
        preds = jnp.argmax(logits, axis=-1)
        labels = batch["label"]
        mask, count = _mask_count(batch)
        if mask is not None:
            mi = mask.astype(jnp.int32)
            cm = confusion_matrix(preds * mi, labels * mi, cfg.num_classes)
            cm = cm.at[0, 0].add(-jnp.sum(1 - mi))
        else:
            cm = confusion_matrix(preds, labels, cfg.num_classes)
        loss_mean = cross_entropy_loss(logits, labels, mask)
        is_last = (stage == pp - 1).astype(jnp.float32)
        cm = jax.lax.psum(cm * is_last.astype(cm.dtype),
                          (DATA_AXIS, STAGE_AXIS))
        loss_sum = jax.lax.psum(loss_mean * count * is_last,
                                (DATA_AXIS, STAGE_AXIS))
        n = jax.lax.psum(jax.lax.pcast(count * is_last, (DATA_AXIS,),
                                to="varying"),
                         (DATA_AXIS, STAGE_AXIS))
        return cm, loss_sum / jnp.maximum(n, 1.0)

    def run(params, batch):
        if "mask" in batch:
            bspecs = {"image": P(DATA_AXIS), "label": P(DATA_AXIS),
                      "mask": P(DATA_AXIS)}
        else:
            bspecs = {"image": P(DATA_AXIS), "label": P(DATA_AXIS)}
        return jax.shard_map(
            eval_local, mesh=mesh, in_specs=(pspecs, bspecs),
            out_specs=(P(), P()), check_vma=False)(params, batch)

    return jax.jit(run)
