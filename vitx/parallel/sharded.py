"""Sharded train / eval steps over a (data, model) mesh.

Data parallelism: batch sharded over ``data``; gradients are reduced by an
XLA-inserted psum over ICI (the SPMD partitioner sees replicated params and
a sharded batch — no hand-written collective, per the scaling-book recipe).

Tensor parallelism (optional, ``tp > 1``): attention heads and the MLP hidden
dimension are sharded over ``model``. The per-head attention kernel is
embarrassingly parallel in H, so the only model-axis collectives are the
psums XLA inserts after the attention output projection and the MLP second
matmul — exactly the Megatron pattern, derived automatically from the
shardings below.

Optimizer state: AdamW moments follow their parameter's sharding, or shard
over ``data`` with ``zero1=True`` (ZeRO-1). ``zero3=True`` shards the
parameters themselves over ``data`` (ZeRO-3 / FSDP) — XLA all-gathers
weights on use and reduce-scatters gradients, all derived from the
PartitionSpecs in ``state_sharding``.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitx.core.config import ViTConfig
from vitx.parallel.mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS
from vitx.train.step import TrainState, eval_step, train_step


# ---------------------------------------------------------------------------
# Sharding specs
# ---------------------------------------------------------------------------

def _block_specs(cfg: ViTConfig, tp: bool) -> dict:
    """PartitionSpecs for the stacked (L, ...) block params."""
    m = MODEL_AXIS if tp else None
    specs = {
        "ln1_scale": P(), "ln1_bias": P(),
        # (L, E, 3, H, D): shard heads
        "wqkv": P(None, None, None, m, None),
        # (L, E, E): rows are the concat of head outputs -> shard rows
        "wo": P(None, m, None),
        "ln2_scale": P(), "ln2_bias": P(),
        # (L, E, M) / (L, M, E): shard the hidden dim
        "w1": P(None, None, m),
        "b1": P(None, m),
        "w2": P(None, m, None),
        "b2": P(),
    }
    if cfg.mlp_act == "swiglu":
        # the gate projection shards like w1 (column-parallel hidden dim);
        # the elementwise gate multiply then stays local to each shard
        specs["w3"] = P(None, None, m)
        specs["b3"] = P(None, m)
    if cfg.layerscale_init:
        # (L, E) per-channel residual gains: tiny; replicate
        specs["ls1"] = P()
        specs["ls2"] = P()
    if cfg.qkv_bias:
        specs["bqkv"] = P(None, None, m, None)
    if cfg.qk_norm:
        # (L, H, D) per-head LN scales: shard H to match the q/k heads
        specs["lnq_scale"] = P(None, m, None)
        specs["lnk_scale"] = P(None, m, None)
    if cfg.proj_bias:
        specs["bo"] = P()
    if cfg.lora_rank:
        # LoRA adapters: B mirrors its base weight's model-axis placement
        # (so the merged w + A@B einsum partitions Megatron-style without a
        # gather), A and the rank dim stay replicated (rank is tiny)
        from vitx.nn.lora import target_names

        # shapes: lora_{t}_a (L, in, r); lora_wqkv_b (L, r, 3, H, D),
        # lora_wo_b / lora_w2_b (L, r, E), lora_w1_b (L, r, M)
        lora_b = {"wqkv": P(None, None, None, m, None),
                  "wo": P(),
                  "w1": P(None, None, m),
                  "w2": P()}
        lora_a = {"wqkv": P(), "wo": P(None, m, None),
                  "w1": P(), "w2": P(None, m, None)}
        for name in target_names(cfg):
            specs[f"lora_{name}_a"] = lora_a[name]
            specs[f"lora_{name}_b"] = lora_b[name]
    return specs


def _moe_block_specs(cfg: ViTConfig, tp: bool, ep: bool) -> dict:
    """PartitionSpecs for the stacked trailing MoE blocks (vitx/nn/moe.py):
    the standard attention specs plus router/expert-weight specs — the
    expert dim shards over ``expert`` (ep), the MLP hidden dim over
    ``model`` (tp); both compose."""
    specs = _block_specs(cfg, tp)
    for name in ("w1", "b1", "w2", "b2"):
        specs.pop(name)
    e = EXPERT_AXIS if ep else None
    m = MODEL_AXIS if tp else None
    specs["phi"] = P()                        # (k, E, n, s): tiny; replicate
    specs["router_scale"] = P()
    specs["ew1"] = P(None, e, None, m)        # (k, n, E, M)
    specs["eb1"] = P(None, e, m)              # (k, n, M)
    specs["ew2"] = P(None, e, m, None)        # (k, n, M, E)
    specs["eb2"] = P(None, e, None)           # (k, n, E)
    return specs


def param_pspecs(cfg: ViTConfig, tp: bool = False, ep: bool = False) -> dict:
    """PartitionSpec pytree matching init_params' structure."""
    if cfg.stem == "conv":
        # conv-stem params (vitx/nn/vit.py::init_params): one dict per conv
        # + the 1x1 proj, all replicated (stem weights are tiny vs blocks)
        n = cfg.patch_size.bit_length() - 1
        embed = {f"conv{i}": {"kernel": P(), "bias": P()} for i in range(n)}
        embed["proj"] = {"kernel": P(), "bias": P()}
    else:
        embed = {"kernel": P(), "bias": P()}
    specs = {
        "patch_embed": embed,
        "cls_token": P(),
        "blocks": _block_specs(cfg, tp),
    }
    if cfg.pos_embed == "learned":
        # sincos2d/rope carry no pos_embed leaf (vit.py::init_params)
        specs["pos_embed"] = P()
    if cfg.moe_experts:
        specs["moe_blocks"] = _moe_block_specs(cfg, tp, ep)
    if cfg.distill_token:
        specs["dist_token"] = P()
        specs["dist_head"] = {"ln_scale": P(), "ln_bias": P(),
                              "w": P(), "b": P()}
    if cfg.num_registers:
        specs["reg_tokens"] = P()
    if cfg.final_norm:
        specs["final_norm"] = {"scale": P(), "bias": P()}
    if cfg.head_type == "reference":
        specs["head"] = {"w1": P(), "b1": P(), "ln_scale": P(),
                         "ln_bias": P(), "w2": P(), "b2": P()}
    elif cfg.head_type == "map":
        # MAP head (Zhai 2022): tiny vs the encoder — fully replicated
        specs["head"] = {k: P() for k in (
            "in_ln_scale", "in_ln_bias",
            "probe", "wq", "wk", "wv", "wo_p", "bo_p",
            "mlp_ln_scale", "mlp_ln_bias", "mw1", "mb1", "mw2", "mb2",
            "ln_scale", "ln_bias", "w", "b")}
    else:
        specs["head"] = {"ln_scale": P(), "ln_bias": P(), "w": P(), "b": P()}
    return specs


def param_sharding(cfg: ViTConfig, mesh: Mesh, tp: bool = False,
                   ep: bool = False):
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        param_pspecs(cfg, tp, ep),
                        is_leaf=lambda x: isinstance(x, P))


def _data_shard(shard, shape, dp, mesh):
    """Extend a sharding with a ``data``-axis split of the largest free dim."""
    spec = list(shard.spec) + [None] * (len(shape) - len(shard.spec))
    if DATA_AXIS in spec:        # already data-sharded (zero3 params)
        return shard
    for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
        if spec[d] is None and shape[d] % dp == 0:
            spec[d] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
    return shard


def grad_sharding(params, cfg: ViTConfig, mesh: Mesh, tp: bool = False,
                  ep: bool = False):
    """Data-axis shardings for the GRADIENTS (ZeRO-2).

    Each gradient leaf gets its parameter's sharding plus a ``data``-axis
    split of its largest free dim — the same rule ``state_sharding`` applies
    to the Adam moments under ``zero1``, so the optimizer update is purely
    local elementwise math on 1/dp of every tensor. Pinning this onto the
    grads (``train_step``'s ``grad_shardings``) makes XLA reduce-scatter
    them instead of all-reducing; the updated params are all-gathered once
    per step. Same per-step comm volume as plain DP, but the optimizer
    (and its fp32 moment reads/writes) runs at 1/dp cost per rank.
    """
    dp_size = mesh.shape[DATA_AXIS]
    pshard = param_sharding(cfg, mesh, tp, ep)
    return jax.tree.map(
        lambda shard, p: (_data_shard(shard, np.shape(p), dp_size, mesh)
                          if np.size(p) >= 1024 else shard),
        pshard, params)


def state_sharding(state: TrainState, cfg: ViTConfig, mesh: Mesh,
                   tp: bool = False, zero1: bool = False,
                   zero3: bool = False, pshard=None, ep: bool = False):
    """Sharding for the full TrainState.

    Params follow param_sharding; optimizer moments follow their parameter —
    or, with ``zero1=True``, are additionally sharded over the ``data`` axis
    (ZeRO-1: each data-parallel rank owns a slice of the Adam moments; XLA's
    SPMD partitioner derives the gather/scatter around the update). Scalars
    stay replicated.

    ``zero3=True`` (implies zero1) additionally shards the PARAMETERS over
    ``data`` — fully-sharded data parallelism: XLA all-gathers each layer's
    weights on use (the scan slices one layer at a time, so only one layer
    is ever gathered) and reduce-scatters its gradients into the sharded
    update. The TPU-native expression of ZeRO-3/FSDP: no hand-written
    collectives, just these PartitionSpecs.
    """
    zero1 = zero1 or zero3
    if pshard is None:
        pshard = param_sharding(cfg, mesh, tp, ep)
    if zero3:
        dp_size = mesh.shape[DATA_AXIS]
        pshard = jax.tree.map(
            lambda shard, p: (_data_shard(shard, np.shape(p), dp_size, mesh)
                              if np.size(p) >= 1024 else shard),
            pshard, state.params)
    # Moments live inside optax state pytrees whose leaf paths END with the
    # parameter's own path (e.g. ...ScaleByAdamState.mu['blocks']['wqkv']).
    # Key the lookup by that path suffix — a (shape, dtype) key collides when
    # distinct params share a shape with different specs (e.g. mlp_ratio=1
    # makes wo/w1/w2 all (L, E, E)).
    param_paths = {
        tuple(path): shard
        for (path, _), shard in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_leaves(pshard))
    }

    rep = NamedSharding(mesh, P())
    dp = mesh.shape[DATA_AXIS]

    def assign(path, x):
        shard = rep
        for i in range(len(path)):
            cand = param_paths.get(tuple(path[i:]))
            if cand is not None:
                shard = cand
                break
        if not zero1 or x.ndim == 0 or x.size < 1024:
            return shard
        # shard the moment's largest unsharded dim over `data`
        return _data_shard(shard, x.shape, dp, mesh)

    return TrainState(
        step=rep,
        params=pshard,
        opt_state=jax.tree_util.tree_map_with_path(assign, state.opt_state),
    )


def _batch_axes(mesh: Mesh):
    """The batch shards over ``data`` — and over data x expert on an
    expert mesh (outside the MoE layers the expert ranks are extra data
    parallelism; the MoE layer's slot constraints insert the dp<->ep
    all-to-alls, vitx/nn/moe.py)."""
    if EXPERT_AXIS in mesh.axis_names:
        return (DATA_AXIS, EXPERT_AXIS)
    return DATA_AXIS


def batch_sharding(mesh: Mesh):
    spec = NamedSharding(mesh, P(_batch_axes(mesh)))
    return {"image": spec, "label": spec}


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, batch axis over ``data`` (x
    ``expert`` when the mesh has an expert axis)."""
    spec = NamedSharding(mesh, P(_batch_axes(mesh)))
    return {k: jax.device_put(v, spec) for k, v in batch.items()}


def shard_host_batch(batch, mesh: Mesh):
    """Multi-host batch placement: each PROCESS contributes its local shard
    of the global batch (a host-sharded input pipeline — every host loads
    only ``global_batch / process_count`` examples), assembled into global
    arrays via ``jax.make_array_from_process_local_data``.

    Single-process (including the virtual CPU mesh) this reduces exactly to
    ``shard_batch``. On a multi-host pod, run the SAME code per host with
    each host's BatchLoader covering a disjoint slice of the dataset (e.g.
    ``dataset[process_index::process_count]``).
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    spec = NamedSharding(mesh, P(_batch_axes(mesh)))
    return {k: jax.make_array_from_process_local_data(spec, v)
            for k, v in batch.items()}


# ---------------------------------------------------------------------------
# Sharded steps
# ---------------------------------------------------------------------------

def place_state(state: TrainState, cfg: ViTConfig, mesh: Mesh,
                tp: bool = False, zero1: bool = False,
                zero3: bool = False, ep: bool = False) -> TrainState:
    """Place an (unsharded, host or single-device) state onto the mesh."""
    shardings = state_sharding(state, cfg, mesh, tp, zero1, zero3, ep=ep)
    return jax.tree.map(jax.device_put, state, shardings)


def sp_cfg(cfg: ViTConfig, tp: bool, sp: bool) -> ViTConfig:
    """Enable Megatron-style sequence parallelism (config.py::sp): the
    residual stream between blocks stays token-sharded over ``model``.
    Only meaningful under tp>1 (the model axis must exist and be busy)."""
    if not sp:
        return cfg
    if not tp:
        raise ValueError("sp=True requires tp (sequence parallelism shards "
                         "the residual stream over the model axis)")
    return cfg.replace(sp=True)


def ep_cfg(cfg: ViTConfig, mesh: Mesh, ep: bool) -> ViTConfig:
    """Enable expert parallelism (config.py::ep): MoE expert weights and
    slot activations shard over the mesh's ``expert`` axis."""
    if not ep:
        return cfg
    if not cfg.moe_experts:
        raise ValueError("ep=True requires a MoE config (moe_experts > 0)")
    if EXPERT_AXIS not in mesh.axis_names:
        raise ValueError("ep=True requires an expert mesh axis "
                         "(make_mesh(ep=...))")
    if cfg.moe_experts % mesh.shape[EXPERT_AXIS]:
        raise ValueError(
            f"moe_experts {cfg.moe_experts} not divisible by the expert "
            f"axis size {mesh.shape[EXPERT_AXIS]}")
    return cfg.replace(ep=True)


def tp_safe_cfg(cfg: ViTConfig, tp: bool) -> ViTConfig:
    """Mesh-aware kernel-fusion gating (VERDICT r2 item 4): the fused
    MHA/MLP kernels' custom_partitioning rules replicate weights on the
    model axis, so under tp>1 an ``"auto"`` fusion choice would silently
    all-gather the tp-sharded weights every layer. Route tp runs to the
    composed path (whose einsums partition Megatron-style) — an explicit
    ``fuse_*="on"`` is honored (the user accepts the gather)."""
    if not tp:
        return cfg
    rep = {}
    if cfg.fuse_mha == "auto":
        rep["fuse_mha"] = "off"
    if cfg.fuse_mlp == "auto":
        rep["fuse_mlp"] = "off"
    return cfg.replace(**rep) if rep else cfg


def make_parallel_train_step(cfg: ViTConfig, optimizer, mesh: Mesh,
                             tp: bool = False, zero1: bool = False,
                             zero3: bool = False, state_shardings=None,
                             label_smoothing: float = 0.0,
                             mixup_alpha: float | None = None,
                             cutmix_alpha: float | None = None,
                             sam_rho: float | None = None,
                             class_weights=None, grad_shardings=None,
                             train_filter: str | None = None,
                             sp: bool = False, ep: bool = False,
                             loss: str = "ce"):
    """Jitted SPMD train step. State donated; grads psum over ``data``.

    Shardings are inferred from the placed inputs (pjit committed-input
    semantics); pass ``state_shardings`` (from ``state_sharding``) to pin the
    output state layout explicitly — required for zero1 so the updated
    moments stay sharded rather than following the replicated params.
    Pass ``grad_shardings`` (from ``grad_sharding``) for ZeRO-2: gradients
    reduce-scatter over ``data`` instead of all-reducing, and the optimizer
    update runs sharded. Redundant under zero3 (sharded params already
    yield sharded grads).
    """
    cfg = ep_cfg(sp_cfg(tp_safe_cfg(cfg, tp), tp, sp), mesh, ep)
    step_fn = partial(train_step, cfg=cfg, optimizer=optimizer,
                      label_smoothing=label_smoothing,
                      mixup_alpha=mixup_alpha, cutmix_alpha=cutmix_alpha,
                      sam_rho=sam_rho, class_weights=class_weights,
                      grad_shardings=grad_shardings,
                      train_filter=train_filter, loss=loss)

    def wrapped(state, batch, rng):
        return step_fn(state, batch, rng)

    kw = {}
    if state_shardings is not None:
        rep = NamedSharding(mesh, P())
        metric_shardings = {"loss": rep, "accuracy": rep, "grad_norm": rep}
        kw["out_shardings"] = (state_shardings, metric_shardings)
    del zero1, zero3  # encoded in the shardings; call-site clarity
    jitted = jax.jit(wrapped, donate_argnums=(0,), **kw)
    if not (sp or ep):
        return jitted

    def with_mesh(state, batch, rng=None):
        # sp's / ep's with_sharding_constraint uses bare PartitionSpecs,
        # which need a mesh context at trace time
        with jax.set_mesh(mesh):
            return jitted(state, batch, rng)

    return with_mesh


def make_parallel_eval_step(cfg: ViTConfig, mesh: Mesh, tp: bool = False,
                            sp: bool = False, ep: bool = False):
    """Jitted SPMD eval step; confusion matrix psum-reduced to replicated."""
    cfg = ep_cfg(sp_cfg(tp_safe_cfg(cfg, tp), tp, sp), mesh, ep)
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(partial(eval_step, cfg=cfg),
                     out_shardings=(rep, rep))
    if not (sp or ep):
        return jitted

    def with_mesh(params, batch):
        with jax.set_mesh(mesh):
            return jitted(params, batch)

    return with_mesh
