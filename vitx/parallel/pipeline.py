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
are masked to the last stage's real outputs then psum-reduced. Stochastic
regularizers (dropout / stochastic depth / patch dropout) train under pp
too: per-(stage, microbatch) keys follow a documented fold_in rule (see
``_embed_tail``) that both schedules — and the 1F1B backward slot's
recompute — derive identically, pinned by an independent single-device
emulation test.

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
from vitx.nn.layers import activation, add_layer_norm, layer_norm
from vitx.nn.vit import classify, embed_tokens, run_blocks
from vitx.parallel.mesh import DATA_AXIS, MODEL_AXIS
from vitx.parallel.sharded import param_pspecs, state_sharding
from vitx.train.step import TrainState, cross_entropy_loss

STAGE_AXIS = "stage"


def make_pp_mesh(dp: int | None = None, pp: int = 2, tp: int = 1,
                 devices=None) -> Mesh:
    """Build a (data, stage[, model]) mesh. Neighbor stages should sit on
    neighbor devices so the ppermute handoff rides one ICI hop, and the
    model axis innermost so each stage's tensor-parallel psums ride the
    tightest links; ``mesh_utils.create_device_mesh`` lays minor axes out
    that way."""
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % (pp * tp):
            raise ValueError(f"{n} devices not divisible by "
                             f"pp={pp} x tp={tp}")
        dp = n // (pp * tp)
    need = dp * pp * tp
    if need > n:
        raise ValueError(f"need {need} devices (dp={dp} x pp={pp} x "
                         f"tp={tp}), have {n}")
    shape = (dp, pp, tp) if tp > 1 else (dp, pp)
    names = ((DATA_AXIS, STAGE_AXIS, MODEL_AXIS) if tp > 1
             else (DATA_AXIS, STAGE_AXIS))
    try:
        arr = mesh_utils.create_device_mesh(shape, devices=devices[:need])
    except Exception:
        arr = np.asarray(devices[:need]).reshape(shape)
    return Mesh(arr, names)


def pp_param_pspecs(cfg: ViTConfig, tp: bool = False) -> dict:
    """PartitionSpecs for pipeline parallelism: every stacked (L, ...) block
    leaf is sharded over ``stage`` on its layer dim; everything else
    (embed/cls/pos/head — tiny vs the blocks) is replicated. With ``tp``
    the Megatron model-axis specs from ``param_pspecs(tp=True)`` compose on
    the remaining dims (heads/hidden sharded over ``model``)."""
    if cfg.moe_experts:
        raise ValueError(
            "pipeline parallelism over Soft-MoE models is unsupported: pp "
            "splits the homogeneous dense block stack across stages; use "
            "dp/tp/ep for MoE configs (vitx/parallel/sharded.py)")
    specs = param_pspecs(cfg, tp=tp)

    def stageify(s):
        rest = tuple(s)[1:]          # drop the (always-None) layer dim
        return P(STAGE_AXIS, *rest)

    specs["blocks"] = jax.tree.map(stageify, specs["blocks"],
                                   is_leaf=lambda x: isinstance(x, P))
    return specs


def pp_param_sharding(cfg: ViTConfig, mesh: Mesh, tp: bool = False):
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        pp_param_pspecs(cfg, tp=tp),
                        is_leaf=lambda x: isinstance(x, P))


def pp_state_sharding(state: TrainState, cfg: ViTConfig, mesh: Mesh,
                      zero1: bool = False, tp: bool = False):
    """TrainState shardings under pp: params per ``pp_param_pspecs``,
    moments following their parameter (plus a ``data``-axis split with
    ``zero1=True`` — ZeRO-1 composes with pp unchanged)."""
    return state_sharding(state, cfg, mesh, zero1=zero1,
                          pshard=pp_param_sharding(cfg, mesh, tp=tp))


def place_pp_state(state: TrainState, cfg: ViTConfig, mesh: Mesh,
                   zero1: bool = False, tp: bool = False) -> TrainState:
    shardings = pp_state_sharding(state, cfg, mesh, zero1=zero1, tp=tp)
    return jax.tree.map(jax.device_put, state, shardings)


def _check_pp_cfg(cfg: ViTConfig, pp: int, for_train: bool,
                  tp: int = 0):
    """``tp``: the model-axis size (0/1 = no tensor parallelism)."""
    if cfg.depth % pp:
        raise ValueError(f"depth={cfg.depth} not divisible by pp={pp}")
    if cfg.distill_token:
        raise ValueError("pipeline parallelism does not support "
                         "distill_token models")
    if tp > 1:
        if cfg.num_heads % tp or (cfg.mlp_ratio * cfg.embed_dim) % tp:
            raise ValueError(
                f"pp x tp needs num_heads ({cfg.num_heads}) and the MLP "
                f"hidden dim ({cfg.mlp_ratio * cfg.embed_dim}) divisible "
                f"by tp={tp}")
        bad = [name for name, v in (
            ("lora_rank", cfg.lora_rank),
            ("parity='bug_exact'", cfg.parity == "bug_exact"),
            ("tome_r", cfg.tome_r),
            # the manual Megatron block is deterministic; the pp-only rng
            # plumbing (dropout/drop_path/patch_drop) stops at tp=1
            ("dropout", for_train and cfg.dropout),
            ("drop_path", for_train and cfg.drop_path),
            ("patch_drop", for_train and cfg.patch_drop)) if v]
        if bad:
            raise ValueError(
                f"pp x tp runs the manual Megatron stage block "
                f"(pipeline.py::_tp_block) which does not support: {bad}")


# --- Megatron f/g collectives for tensor parallelism INSIDE shard_map ---
# This module runs shard_map with check_vma=False (see make_pp_train_step),
# under which autodiff transposes lax.psum to lax.psum — mathematically
# wrong here (the cotangent of an all-reduced value is already replicated;
# re-summing scales it by tp). The classic Megatron operators make the
# gradients explicit: g = all-reduce forward / identity backward (applied
# to row-parallel matmul outputs), f = identity forward / all-reduce
# backward (applied to the replicated input entering column-parallel
# matmuls, whose cotangent contributions live on every model rank).

@jax.custom_vjp
def _tp_g(x):
    return jax.lax.psum(x, MODEL_AXIS)


def _tp_g_fwd(x):
    return _tp_g(x), None


def _tp_g_bwd(_, ct):
    return (ct,)


_tp_g.defvjp(_tp_g_fwd, _tp_g_bwd)


@jax.custom_vjp
def _tp_f(x):
    return x


def _tp_f_fwd(x):
    return x, None


def _tp_f_bwd(_, ct):
    return (jax.lax.psum(ct, MODEL_AXIS),)


_tp_f.defvjp(_tp_f_fwd, _tp_f_bwd)


def _tp_block(x, pending, bp, cfg: ViTConfig):
    """One pre-LN encoder block with Megatron tensor parallelism, manual
    collectives (per-device view inside shard_map; deterministic — the pp
    train step already excludes dropout/drop_path).

    The math mirrors ``_encoder_block``'s composed branch exactly, with the
    block weights arriving as model-axis shards: wqkv (E, 3, H/tp, D),
    wo (E/tp, E), w1 (E, M/tp), b1 (M/tp), w2 (M/tp, E); LN params, bo,
    b2, LayerScale gains replicated. One psum per branch (after the
    row-parallel matmul), biases added post-reduce."""
    from vitx.nn.attention import _qk_layer_norm, reference_attention

    x, h = add_layer_norm(x, pending, bp["ln1_scale"], bp["ln1_bias"],
                          eps=cfg.layer_norm_eps)
    h = _tp_f(h)
    w = bp["wqkv"].astype(h.dtype)                     # (E, 3, H_loc, D)
    bq = bk = bv = None
    if bp.get("bqkv") is not None:
        h_loc, d = w.shape[2], w.shape[3]
        b3 = bp["bqkv"].astype(h.dtype).reshape(3, 1, h_loc, 1, d)
        bq, bk, bv = b3[0], b3[1], b3[2]

    def proj(s, bias):
        r = jnp.einsum("bte,ehd->bhtd", h, w[:, s],
                       preferred_element_type=jnp.float32).astype(h.dtype)
        return r if bias is None else r + bias

    q, k, v = proj(0, bq), proj(1, bk), proj(2, bv)
    if cfg.qk_norm:
        q = _qk_layer_norm(q, bp["lnq_scale"], cfg.layer_norm_eps)
        k = _qk_layer_norm(k, bp["lnk_scale"], cfg.layer_norm_eps)
    if cfg.pos_embed == "rope":
        # the (T, D) rotation tables are per-head-IDENTICAL, so they apply
        # unchanged to this rank's local head slice (after QK-Norm, as the
        # single-device path orders it — attention.py docstring)
        from vitx.nn.vit import apply_rope, rope_tables

        cos, sin = rope_tables(cfg, q.dtype)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    # same flash-eligibility rule as multi_head_attention: the parity impls
    # ("reference"/"xla") opt out so pp x tp parity debugging runs the
    # composed attention it asked for (ADVICE r4)
    if (cfg.attn_impl in ("auto", "flash")
            and jax.default_backend() == "tpu" and q.shape[3] >= 32
            and q.shape[2] >= 128):
        from vitx.kernels.flash_attention import flash_attention

        out = flash_attention(q, k, v)        # local heads: no collectives
    else:
        out, _ = reference_attention(q, k, v)
    h_loc, d = out.shape[1], out.shape[3]
    o = jnp.einsum("bhtd,hdf->btf", out,
                   bp["wo"].astype(h.dtype).reshape(h_loc, d,
                                                    cfg.embed_dim),
                   preferred_element_type=jnp.float32).astype(h.dtype)
    attn_out = _tp_g(o)
    if bp.get("bo") is not None:
        attn_out = attn_out + bp["bo"].astype(attn_out.dtype)
    if "ls1" in bp:
        attn_out = attn_out * bp["ls1"].astype(attn_out.dtype)

    x, h2 = add_layer_norm(x, attn_out, bp["ln2_scale"], bp["ln2_bias"],
                           eps=cfg.layer_norm_eps)
    h2 = _tp_f(h2)
    hm = jnp.einsum("bte,em->btm", h2, bp["w1"].astype(h2.dtype),
                    preferred_element_type=jnp.float32).astype(h2.dtype)
    hm = hm + bp["b1"].astype(h2.dtype)
    if cfg.mlp_act == "swiglu":
        # gated FFN: w3 is column-parallel like w1 (sharded.py::_block_specs)
        # so the SiLU gate multiply stays local to each model rank
        g = jnp.einsum("bte,em->btm", h2, bp["w3"].astype(h2.dtype),
                       preferred_element_type=jnp.float32).astype(h2.dtype)
        hm = jax.nn.silu(hm) * (g + bp["b3"].astype(h2.dtype))
    else:
        hm = activation(hm, cfg.mlp_act)
    o2 = jnp.einsum("btm,me->bte", hm, bp["w2"].astype(h2.dtype),
                    preferred_element_type=jnp.float32).astype(h2.dtype)
    mlp_out = _tp_g(o2) + bp["b2"].astype(h2.dtype)
    if "ls2" in bp:
        mlp_out = mlp_out * bp["ls2"].astype(mlp_out.dtype)
    return x, mlp_out


def _stage_fwd(blocks, x, cfg: ViTConfig, tp: bool, n_local: int,
               rng=None, dp_rates=None):
    """This stage's block slice: run_blocks (one scan) without tp, the
    unrolled manual-Megatron loop with it. Both thread the fused residual
    pair and return x + pending (the stage-boundary value).

    ``rng``: the per-(stage, microbatch) key for dropout/stochastic depth
    (None = deterministic); ``dp_rates``: this stage's slice of the global
    drop-path schedule (the linspace keeps its single-device meaning —
    block l's rate is independent of which stage holds it)."""
    if not tp:
        y, _ = run_blocks(blocks, x, cfg, rng=rng,
                          deterministic=rng is None, depth=n_local,
                          dp_rates=dp_rates)
        return y
    pending = jnp.zeros_like(x)
    for l in range(n_local):
        bp = jax.tree.map(lambda a: a[l], blocks)
        x, pending = _tp_block(x, pending, bp, cfg)
    return x + pending


# --- per-stage rng plumbing (the stochastic-regularizer support) -----------
# Derivation rule, shared by both schedules and pinned by the emulation
# test (tests/test_pipeline.py::test_pp_stochastic_*): with ``r`` the
# per-device key (the step key folded with this device's data coordinate),
#   embed-stage ops (patch_drop + embed dropout), microbatch m:
#       fold_in(fold_in(r, _EMBED_TAG), m)
#   block ops (dropout/drop_path), stage s, microbatch m:
#       fold_in(fold_in(fold_in(r, _BLOCK_TAG), s), m)
# Per-microbatch embed keys (rather than one full-batch draw) exist so the
# 1F1B backward slot can re-run ONE microbatch's embed and reproduce the
# identical masks.

_EMBED_TAG = 0xE4B
_BLOCK_TAG = 0xB10C


def _embed_tail(x, cfg: ViTConfig, key):
    """The stochastic token ops ``encode`` applies after ``embed_tokens``
    (vit.py::encode): patch dropout, then embed dropout."""
    from vitx.nn.layers import dropout
    from vitx.nn.vit import _patch_drop

    if cfg.patch_drop:
        key, r = jax.random.split(key)
        x = _patch_drop(x, cfg, r)
    key, r = jax.random.split(key)
    return dropout(x, cfg.dropout, r, deterministic=False)


def _embed_mb(params, images_mb, cfg: ViTConfig, rng, m):
    """Embed + stochastic tail for ONE microbatch (the 1F1B backward-slot
    recompute): bit-identical masks to the forward's vmapped draw."""
    x = embed_tokens(params, images_mb, cfg)
    if rng is None:
        return x
    return _embed_tail(x, cfg,
                       jax.random.fold_in(jax.random.fold_in(rng, _EMBED_TAG),
                                          m))


def _stochastic_embed_all(params, images, cfg: ViTConfig, n_micro: int,
                          rng):
    """Embed the full local batch, split into microbatches, apply the
    per-microbatch stochastic tail -> (n_micro, mb, T', E)."""
    tokens = embed_tokens(params, images, cfg)
    b_local, t_len, e = tokens.shape
    if b_local % n_micro:
        raise ValueError(f"per-data-shard batch {b_local} not divisible by "
                         f"n_micro={n_micro}")
    tok = tokens.reshape(n_micro, b_local // n_micro, t_len, e)
    if rng is None:
        return tok
    r_e = jax.random.fold_in(rng, _EMBED_TAG)
    keys = jax.vmap(lambda m: jax.random.fold_in(r_e, m))(
        jnp.arange(n_micro, dtype=jnp.uint32))
    return jax.vmap(lambda xm, k: _embed_tail(xm, cfg, k))(tok, keys)


def _stage_block_key(rng, stage, m):
    if rng is None:
        return None
    return jax.random.fold_in(
        jax.random.fold_in(jax.random.fold_in(rng, _BLOCK_TAG), stage), m)


def _stage_dp_rates(cfg: ViTConfig, stage, n_local: int):
    """This stage's slice of the global stochastic-depth linspace."""
    if not cfg.drop_path:
        return None
    rates = jnp.linspace(0.0, cfg.drop_path, cfg.depth)
    return jax.lax.dynamic_slice(rates, (stage * n_local,), (n_local,))


def _pp_tokens(params, images, cfg: ViTConfig, pp: int, n_micro: int,
               tp: bool = False, rng=None):
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
    # replicated stage compute: one patch-embed matmul per stage (~3% of a
    # 12-block stage's FLOPs); only stage 0's value is consumed, so the
    # others carry zero gradient.
    tok_mb = _stochastic_embed_all(params, images, cfg, n_micro, rng)
    _, mb, t_len, e = tok_mb.shape
    b_local = n_micro * mb
    n_local = cfg.depth // pp
    dp_rates = _stage_dp_rates(cfg, stage, n_local)
    perm = [(i, i + 1) for i in range(pp - 1)]
    n_ticks = n_micro + pp - 1

    def tick(carry, t):
        x_c, outbuf = carry
        idx = jnp.clip(t, 0, n_micro - 1)
        feed = jax.lax.dynamic_index_in_dim(tok_mb, idx, 0, keepdims=False)
        x_in = jnp.where(stage == 0, feed, x_c)
        # the microbatch at stage s on tick t is t-s (garbage draws during
        # warmup/drain ticks are masked with the rest of the garbage)
        m_here = jnp.clip(t - stage, 0, n_micro - 1)
        y = _stage_fwd(params["blocks"], x_in, cfg, tp, n_local,
                       rng=_stage_block_key(rng, stage, m_here),
                       dp_rates=dp_rates)
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
        (jnp.zeros((mb, t_len, e), tok_mb.dtype),
         jnp.zeros((n_micro, mb, t_len, e), tok_mb.dtype)),
        (DATA_AXIS, STAGE_AXIS), to="varying")
    (_, outbuf), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
    x = outbuf.reshape(b_local, t_len, e)
    if cfg.final_norm:
        fn = params["final_norm"]
        x = layer_norm(x, fn["scale"], fn["bias"], eps=cfg.layer_norm_eps)
    return x


def _pp_logits_local(params, batch, cfg, pp, n_micro, tp=False, rng=None):
    x = _pp_tokens(params, batch["image"], cfg, pp, n_micro, tp=tp, rng=rng)
    return classify(params, x, cfg)


def _mask_count(batch):
    mask = batch.get("mask")
    if mask is None:
        return None, jnp.float32(batch["label"].shape[0])
    mask = mask.astype(jnp.float32)
    return mask, jnp.sum(mask)


def _pp_loss_local(params, batch, cfg: ViTConfig, pp: int, n_micro: int,
                   label_smoothing: float, tp: bool = False, rng=None):
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
    logits = _pp_logits_local(params, batch, cfg, pp, n_micro, tp=tp,
                              rng=rng)
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


def pp_schedule_ticks(schedule: str, stages: int, n_micro: int) -> int:
    """Pipeline length in scan ticks. gpipe: M+S-1 forward ticks (autodiff
    mirrors them backward). 1f1b: M+2S-2 combined ticks, each carrying one
    forward AND one backward slot per stage."""
    if schedule == "gpipe":
        return n_micro + stages - 1
    if schedule == "1f1b":
        return n_micro + 2 * stages - 2
    raise ValueError(f"unknown pipeline schedule {schedule!r} "
                     f"(expected 'gpipe' or '1f1b')")


def pp_bubble_fraction(schedule: str, stages: int, n_micro: int) -> float:
    """Fraction of schedule slots spent idle (bubble). Under XLA's
    lockstep-SPMD execution every stage pays every tick, so the bubble is
    (ticks - useful) / ticks with ``useful = n_micro`` per stage."""
    ticks = pp_schedule_ticks(schedule, stages, n_micro)
    return (ticks - n_micro) / ticks


def _pp_1f1b_grads(params, batch, cfg: ViTConfig, pp: int, n_micro: int,
                   label_smoothing: float, tp: bool = False, rng=None):
    """1F1B schedule (Narayanan et al. 2019 "PipeDream", non-interleaved
    flush variant), hand-scheduled: one scan whose every tick runs one
    FORWARD slot and one BACKWARD slot per stage. Per-device view inside
    shard_map; returns (loss_local, acc_local, grads_local) with the same
    reduction contract as the GPipe path (psums applied by the caller).

    Why it exists next to GPipe: autodiff-GPipe stashes the per-block
    residuals of ALL ``n_micro`` microbatches (activation memory O(M)),
    which is what caps M — and the bubble fraction (S-1)/(M+S-1) only
    shrinks with M. 1F1B bounds the live state to a (2S-1)-slot ring of
    STAGE INPUTS (O(S), independent of M) by recomputing each stage's
    forward under ``jax.vjp`` at its backward slot. The trade, honest:
    under lockstep SPMD each combined tick costs fwd+bwd everywhere, so
    1F1B runs M+2S-2 ticks vs GPipe's M+S-1 — ~S-1 ticks slower at equal
    M, and each bwd slot pays one stage-forward recompute. Use it to raise
    M past GPipe's memory ceiling (where the bubble savings dominate), not
    at small M.

    Mechanics per tick t:
    - forward slot: exactly the GPipe tick (stage 0 feeds microbatch t,
      stage s processes microbatch t-s arriving by ppermute); the stage
      INPUT is saved into ring slot (t-s) mod (2S-1).
    - backward slot: stage s backprops microbatch m_b = t-(2S-2-s) — the
      classic 1F1B timeline, under which the last stage backprops a
      microbatch the same tick it forwards it, and cotangents arriving by
      reverse ppermute at stage s-1 the NEXT tick are exactly its m_b.
      One uniform ``jax.vjp`` of (stage blocks -> final_norm -> head ->
      masked loss) serves every stage: the loss cotangent is masked to the
      last stage, the incoming activation cotangent to the others, and
      warmup/drain garbage is killed by zeroing both seeds (vjp is linear
      in its cotangents). A second small vjp through ``embed_tokens``
      turns stage 0's input cotangent into embedding grads.
    """
    stage = jax.lax.axis_index(STAGE_AXIS)
    is_first = (stage == 0)
    is_last_f = (stage == pp - 1).astype(jnp.float32)
    images, labels = batch["image"], batch["label"]
    mask, count = _mask_count(batch)
    n = jax.lax.psum(jax.lax.pcast(count * is_last_f, (DATA_AXIS,),
                                   to="varying"),
                     (DATA_AXIS, STAGE_AXIS))
    n = jnp.maximum(n, 1.0)

    tok_mb = _stochastic_embed_all(params, images, cfg, n_micro, rng)
    _, mb, t_len, e = tok_mb.shape
    n_local = cfg.depth // pp
    dp_rates = _stage_dp_rates(cfg, stage, n_local)
    im_mb = images.reshape((n_micro, mb) + images.shape[1:])
    lab_mb = labels.reshape(n_micro, mb)
    msk_mb = (mask.reshape(n_micro, mb) if mask is not None
              else jnp.ones((n_micro, mb), jnp.float32))
    perm_f = [(i, i + 1) for i in range(pp - 1)]
    perm_b = [(i + 1, i) for i in range(pp - 1)]
    s_buf = 2 * pp - 1               # max in-flight distance (stage 0) + 1
    n_ticks = pp_schedule_ticks("1f1b", pp, n_micro)

    def stage_head_loss(p, x_in, lab, msk, r_blk):
        """The uniform per-stage computation the backward slot vjps: this
        stage's blocks, plus (masked to the last stage by the COTANGENT,
        not by control flow) final-norm -> head -> mean CE and the
        accuracy aux. ``r_blk``: the (stage, microbatch) dropout key — the
        backward slot re-derives the SAME key its forward slot used, so
        the recompute reproduces identical masks."""
        y = _stage_fwd(p["blocks"], x_in, cfg, tp, n_local, rng=r_blk,
                       dp_rates=dp_rates)
        yl = y
        if cfg.final_norm:
            fn = p["final_norm"]
            yl = layer_norm(yl, fn["scale"], fn["bias"],
                            eps=cfg.layer_norm_eps)
        logits = classify(p, yl, cfg)
        loss_m = cross_entropy_loss(logits, lab, msk, label_smoothing)
        correct = (jnp.argmax(logits, -1) == lab).astype(jnp.float32) * msk
        return y, loss_m, jnp.sum(correct)

    zero_g = jax.tree.map(jnp.zeros_like, params)

    def tick(carry, t):
        x_recv, g_recv, stash, gacc, loss_acc, acc_acc = carry

        # ---- forward slot (the GPipe tick + stage-input stash) ----
        feed = jax.lax.dynamic_index_in_dim(
            tok_mb, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        x_in = jnp.where(is_first, feed, x_recv)
        stash = jax.lax.dynamic_update_index_in_dim(
            stash, x_in, jnp.mod(t - stage, s_buf), 0)
        m_fwd = jnp.clip(t - stage, 0, n_micro - 1)
        y = _stage_fwd(params["blocks"], x_in, cfg, tp, n_local,
                       rng=_stage_block_key(rng, stage, m_fwd),
                       dp_rates=dp_rates)
        x_next = jax.lax.ppermute(y, STAGE_AXIS, perm_f)

        # ---- backward slot ----
        m_raw = t - (2 * pp - 2 - stage)
        valid = ((m_raw >= 0) & (m_raw < n_micro)).astype(jnp.float32)
        m_b = jnp.clip(m_raw, 0, n_micro - 1)
        x_sav = jax.lax.dynamic_index_in_dim(stash, jnp.mod(m_raw, s_buf),
                                             0, keepdims=False)
        lab = jax.lax.dynamic_index_in_dim(lab_mb, m_b, 0, keepdims=False)
        msk = jax.lax.dynamic_index_in_dim(msk_mb, m_b, 0, keepdims=False)
        cnt = jnp.sum(msk)
        r_bwd = _stage_block_key(rng, stage, m_b)   # == the fwd slot's key
        (_, loss_m, acc_m), vjp_fn = jax.vjp(
            lambda p, x: stage_head_loss(p, x, lab, msk, r_bwd),
            params, x_sav)
        cot_y = g_recv * (valid * (1.0 - is_last_f)).astype(g_recv.dtype)
        cot_loss = (cnt * is_last_f * valid / n).astype(loss_m.dtype)
        dparams, dx = vjp_fn((cot_y, cot_loss,
                              jnp.zeros_like(acc_m)))
        # stage 0's input cotangent is the embedding gradient's seed; the
        # recompute includes the stochastic tail with microbatch m_b's key
        # (identical masks to the forward's vmapped draw)
        imb = jax.lax.dynamic_index_in_dim(im_mb, m_b, 0, keepdims=False)
        _, evjp = jax.vjp(lambda p: _embed_mb(p, imb, cfg, rng, m_b),
                          params)
        (dembed,) = evjp(dx * (valid * is_first).astype(dx.dtype))
        gacc = jax.tree.map(lambda a, b, c: a + b + c, gacc, dparams,
                            dembed)
        loss_acc = loss_acc + loss_m * cnt * is_last_f * valid / n
        acc_acc = acc_acc + acc_m * is_last_f * valid / n
        g_next = jax.lax.ppermute(dx, STAGE_AXIS, perm_b)
        return (x_next, g_next, stash, gacc, loss_acc, acc_acc), None

    init = jax.lax.pcast(
        (jnp.zeros((mb, t_len, e), tok_mb.dtype),
         jnp.zeros((mb, t_len, e), tok_mb.dtype),
         jnp.zeros((s_buf, mb, t_len, e), tok_mb.dtype),
         zero_g, jnp.float32(0), jnp.float32(0)),
        (DATA_AXIS, STAGE_AXIS), to="varying")
    (_, _, _, gacc, loss_l, acc_l), _ = jax.lax.scan(
        tick, init, jnp.arange(n_ticks))
    return loss_l, acc_l, gacc


def make_pp_train_step(cfg: ViTConfig, optimizer, mesh: Mesh,
                       n_micro: int = 4, state_shardings=None,
                       label_smoothing: float = 0.0,
                       schedule: str = "gpipe"):
    """Jitted pipeline-parallel train step (state donated).

    ``n_micro`` microbatches per data shard stream through the
    ``mesh.shape['stage']`` stages. ``schedule``: "gpipe" (all-forward,
    autodiff runs the reverse pipeline; activation memory O(n_micro)) or
    "1f1b" (hand-scheduled one-forward-one-backward; activation memory
    O(stages) via a stage-input ring + per-slot recompute — see
    ``_pp_1f1b_grads`` for the exact trade). Bubble accounting:
    ``pp_schedule_ticks`` / ``pp_bubble_fraction``. Loss/accuracy/
    trajectory match single-device training for BOTH schedules
    (tests/test_pipeline.py). The optimizer update runs OUTSIDE the
    shard_map under pjit, partitioned by the pinned ``state_shardings``
    (from ``pp_state_sharding`` — pass it; inferred shardings relayout the
    state per dispatch, see ROADMAP round-3 notes).
    """
    pp = mesh.shape[STAGE_AXIS]
    tp_size = (mesh.shape[MODEL_AXIS]
               if MODEL_AXIS in mesh.axis_names else 1)
    tp = tp_size > 1
    _check_pp_cfg(cfg, pp, for_train=True, tp=tp_size)
    pp_schedule_ticks(schedule, pp, n_micro)   # validates the name
    pspecs = pp_param_pspecs(cfg, tp=tp)

    stochastic = bool(cfg.dropout or cfg.drop_path or cfg.patch_drop)

    def loss_and_grads(params, batch, step_rng=None):
        # per-device key: the step key folded with this device's data
        # coordinate (stage replicas of a microbatch share embed keys; the
        # per-stage block keys fold the stage coordinate — see the rng
        # derivation rule above _embed_tail)
        r = (jax.random.fold_in(step_rng,
                                jax.lax.axis_index(DATA_AXIS))
             if step_rng is not None else None)
        if schedule == "1f1b":
            loss_l, acc_l, grads = _pp_1f1b_grads(
                params, batch, cfg, pp, n_micro, label_smoothing, tp=tp,
                rng=r)
        else:
            def loss_f(p):
                return _pp_loss_local(p, batch, cfg, pp, n_micro,
                                      label_smoothing, tp=tp, rng=r)

            (loss_l, acc_l), grads = jax.value_and_grad(
                loss_f, has_aux=True)(params)
        # reduce the local contributions to the replicated global values
        loss = jax.lax.psum(loss_l, (DATA_AXIS, STAGE_AXIS))
        acc = jax.lax.psum(acc_l, (DATA_AXIS, STAGE_AXIS))
        return loss, acc, _reduce_grads(grads)

    def step(state: TrainState, batch, rng=None):
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
        if stochastic:
            if rng is None:
                raise ValueError(
                    "cfg has stochastic regularizers (dropout/drop_path/"
                    "patch_drop): the pp train step needs an rng")
            step_rng = jax.random.fold_in(rng, state.step)
            loss, acc, grads = jax.shard_map(
                loss_and_grads, mesh=mesh,
                in_specs=(pspecs, bspecs, P()),
                out_specs=(P(), P(), pspecs),
                check_vma=False)(state.params, batch, step_rng)
        else:
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
    tp_size = (mesh.shape[MODEL_AXIS]
               if MODEL_AXIS in mesh.axis_names else 1)
    tp = tp_size > 1
    _check_pp_cfg(cfg, pp, for_train=False, tp=tp_size)
    if cfg.tome_r:
        raise ValueError("pp eval runs the full-token encoder; tome_r is "
                         "unsupported (use the dp path)")
    pspecs = pp_param_pspecs(cfg, tp=tp)

    def eval_local(params, batch):
        stage = jax.lax.axis_index(STAGE_AXIS)
        logits = _pp_logits_local(params, batch, cfg, pp, n_micro, tp=tp)
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
