"""Fused MHA block kernel: LN -> QKV projection -> attention -> out-proj.

ONE ``pallas_call`` per encoder block's attention half, with the projection
weights resident in VMEM across the batch grid (~4.7 MB at ViT-B). This
removes the two costliest seams of the composed path measured in round 2
(ROADMAP.md roofline): the 0.69 ms qkv relayout copy between the XLA einsum
and the flash kernel, and the HBM round trips at each kernel boundary —
measured 3.9 ms vs 5.7 ms composed per ViT-B layer at batch 128 (1.45x).

Capability-equivalent of the reference's Block attention half
(``src/VisionTransformer/transformer.py:66-79``) in a single fused kernel.

Per grid step (one batch item): LayerNorm in fp32, one (T, E) x (E, 3E)
projection matmul, per-head attention as lane-sliced (T, D) matmuls (no
in-kernel transposes — heads are lane slices of the projection output), and
the (T, E) x (E, E) output projection.

Backward: custom VJP that re-derives the intermediates with the composed
XLA + flash-kernel path (the same work the remat recompute already does) —
the fused kernel accelerates the forward and the remat recompute.

SPMD: batch-parallel over ``data`` via custom_partitioning; the partition
rules replicate weights on the model axis, so tp>1 runs are auto-routed to
the composed path by ``vitx.parallel.sharded.tp_safe_cfg`` (an explicit
``fuse_mha="on"`` opts back in and accepts the weight gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitx.kernels.precision import dot_precision
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as _P

from vitx.kernels.flash_attention import _use_interpret

_VMEM_BYTES = 100 * 1024 * 1024  # guard: skip fusion for configs that blow VMEM


def _kernel(x_ref, wqkv_ref, wo_ref, bo_ref, g_ref, b_ref, o_ref, *rest,
            num_heads: int, eps: float, scale: float, stash: bool):
    E = x_ref.shape[-1]
    D = E // num_heads
    s = x_ref[0]                                        # (T, E)
    s32 = s.astype(jnp.float32)
    mean = jnp.mean(s32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s32 - mean), axis=-1, keepdims=True)
    h = ((s32 - mean) * jax.lax.rsqrt(var + eps)
         * g_ref[...] + b_ref[...]).astype(s.dtype)
    qkv = jnp.dot(h, wqkv_ref[...],
                  preferred_element_type=jnp.float32,
                  precision=dot_precision(h, wqkv_ref))  # (T, 3E)
    outs = []
    for head in range(num_heads):
        # heads are LANE slices of the projection output — zero transposes
        q0 = qkv[:, head * D:(head + 1) * D].astype(s.dtype)
        k = qkv[:, E + head * D:E + (head + 1) * D].astype(s.dtype)
        v = qkv[:, 2 * E + head * D:2 * E + (head + 1) * D].astype(s.dtype)
        if stash:
            # write the kernel-native (H, T, D) planes the flash backward
            # kernel consumes — three separate outputs, so the VJP needs
            # zero relayouts AND zero slice copies (a stacked (B,3,H,T,D)
            # stash cost a 9.4 ms/step slice fusion in the backward,
            # profiled round 2)
            rest[0][0, head] = q0
            rest[1][0, head] = k
            rest[2][0, head] = v
        q = (q0.astype(jnp.float32) * scale).astype(s.dtype)
        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=dot_precision(q, k))
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(s.dtype), v,
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(v)) / l
        outs.append(o.astype(s.dtype))
    o_all = jnp.concatenate(outs, axis=1)               # (T, E)
    if stash:
        rest[3][0] = o_all
    out = jnp.dot(o_all, wo_ref[...],
                  preferred_element_type=jnp.float32,
                  precision=dot_precision(o_all, wo_ref)) + bo_ref[...]
    o_ref[0] = out.astype(o_ref.dtype)


def _fused_fwd(x, wqkv, wo, bo, g, b, *, eps: float, stash: bool = False):
    """stash=True additionally returns (q, k, v each (B,H,T,D), o_all
    (B,T,E)) — the VJP's residuals, written in the flash-bwd kernel's
    native layout as separate arrays (no backward slicing)."""
    B, T, E = x.shape
    H = wqkv.shape[2]
    D = E // H
    # flatten (E, 3, H, D) -> (E, 3E) on the host side: a free bitcast here,
    # an unsupported vector shape-cast inside the kernel (Mosaic)
    wqkv = wqkv.reshape(E, 3 * E)
    out_shape = [jax.ShapeDtypeStruct((B, T, E), x.dtype)]
    out_specs = [pl.BlockSpec((1, T, E), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if stash:
        qkv_spec = pl.BlockSpec((1, H, T, D), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape += [jax.ShapeDtypeStruct((B, H, T, D), x.dtype)] * 3
        out_shape += [jax.ShapeDtypeStruct((B, T, E), x.dtype)]
        out_specs += [qkv_spec, qkv_spec, qkv_spec,
                      pl.BlockSpec((1, T, E), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
    outs = pl.pallas_call(
        functools.partial(_kernel, num_heads=H, eps=eps, scale=1.0 / D**0.5,
                          stash=stash),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * E * 4 * E + 4 * B * H * T * T * D,
            bytes_accessed=2 * B * T * E * 2 + 8 * E * E,
            transcendentals=B * H * T * T,
        ),
    )(x, wqkv, wo, bo, g, b)
    return outs if stash else outs[0]


def _composed(x, wqkv, wo, bo, g, b, *, eps: float):
    """The unfused path (identical math) — backs the VJP and fallbacks.

    q/k/v come from THREE per-projection einsums, not one stacked
    "bte,eshd->sbhtd" einsum + slices: at ViT-L@384 the stacked form cost a
    16.7 ms/call slice fusion (pure HBM copy) to split the (3,B,H,T,D)
    output — profiled round 2. Weight slices are weight-sized and free.
    """
    from vitx.kernels.flash_attention import flash_attention
    from vitx.nn.layers import layer_norm

    H = wqkv.shape[2]
    E = x.shape[-1]
    D = E // H
    h = layer_norm(x, g, b, eps=eps)
    w = wqkv.astype(h.dtype)
    q, k, v = (jnp.einsum("bte,ehd->bhtd", h, w[:, s],
                          preferred_element_type=jnp.float32).astype(h.dtype)
               for s in range(3))
    o = flash_attention(q, k, v)
    out = jnp.einsum("bhtd,hdf->btf", o,
                     wo.astype(h.dtype).reshape(H, D, E),
                     preferred_element_type=jnp.float32).astype(h.dtype)
    return out + bo.astype(h.dtype)


# --- head-chunked variant: large models (ViT-L@384) whose weights + fp32
# qkv blow the single-step VMEM budget. Grid (B, H/hc) with the LayerNorm
# output cached in VMEM scratch across head chunks, per-chunk column blocks
# of the QKV weights, and the out-projection accumulated in fp32 scratch.
# Inference-only fast path: the VJP falls back to differentiating the
# composed path. ---------------------------------------------------------

def _kernel_hchunk(x_ref, wqkv_ref, wo_ref, bo_ref, g_ref, b_ref, o_ref,
                   *rest, hc: int, nh: int, head_dim: int,
                   eps: float, scale: float, num_heads: int,
                   mean_probs: bool):
    if mean_probs:
        probs_ref, h_scr, acc_scr = rest
    else:
        h_scr, acc_scr = rest
    j = pl.program_id(1)
    D = head_dim

    @pl.when(j == 0)
    def _():
        s32 = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(s32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(s32 - mean), axis=-1, keepdims=True)
        h_scr[...] = ((s32 - mean) * jax.lax.rsqrt(var + eps)
                      * g_ref[...] + b_ref[...]).astype(h_scr.dtype)

    h = h_scr[...]                                       # (T, E)
    qkv = jnp.dot(h, wqkv_ref[...],
                  preferred_element_type=jnp.float32,
                  precision=dot_precision(h, wqkv_ref))   # (T, 3*hc*D)
    qkv_c = qkv.astype(h.dtype)
    outs = []
    p_sum = None
    for i in range(hc):
        base = i * 3 * D
        q0 = qkv_c[:, base:base + D]
        k = qkv_c[:, base + D:base + 2 * D]
        v = qkv_c[:, base + 2 * D:base + 3 * D]
        q = (q0.astype(jnp.float32) * scale).astype(h.dtype)
        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=dot_precision(q, k))
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(h.dtype), v,
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(v)) / l
        outs.append(o.astype(h.dtype))
        if mean_probs:
            contrib = p / (l * num_heads)                # (T, T)
            p_sum = contrib if p_sum is None else p_sum + contrib
    o_chunk = jnp.concatenate(outs, axis=1)              # (T, hc*D)
    partial = jnp.dot(o_chunk, wo_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=dot_precision(o_chunk, wo_ref))

    @pl.when(j == 0)
    def _():
        acc_scr[...] = partial + bo_ref[...]
        if mean_probs:
            probs_ref[0] = p_sum

    @pl.when(j > 0)
    def _():
        acc_scr[...] += partial
        if mean_probs:
            probs_ref[0] += p_sum

    @pl.when(j == nh - 1)
    def _():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def _chunk_plan(x_shape, num_heads: int, dtype, mean_probs: bool = False,
                mean_metric: bool = False):
    """-> (hc, est_bytes) for the largest head chunk fitting VMEM."""
    B, T, E = x_shape
    D = E // num_heads
    itemsize = jnp.dtype(dtype).itemsize
    for hc in _divisors_desc_local(num_heads):
        # Mosaic lane constraint (real TPU only; interpret accepts any
        # block): a PARTIAL block's minor dim must be 128-divisible and
        # its second-minor 8-divisible — hc == num_heads means the block
        # equals the array and is always legal. Chip-caught in round 4:
        # hc=1 at D=64 makes a (E, 192) block over a (E, 3*H*64) array,
        # which the TPU lowering rejects.
        if not _use_interpret() and hc != num_heads and (
                (3 * hc * D) % 128 or (hc * D) % 8):
            continue
        need = (E * 3 * hc * D * itemsize      # wqkv column block
                + hc * D * E * itemsize        # wo row block
                + 3 * T * E * itemsize         # x + h scratch + out
                + T * E * 4                    # fp32 out accumulator
                + T * 3 * hc * D * 4           # qkv fp32
                + 2 * T * T * 4                # score/prob temps
                + 2 * hc * T * D * itemsize)   # head slices / o_chunk
        if mean_probs:
            need += 2 * T * T * 4              # probs out block + p_sum
        if mean_metric:
            # ToMe variant: fp32 k_mean scratch + its output block (the
            # kernel itself carries a 32M scoped-vmem limit — the default
            # 16M tripped at T=416/hc=4 in whole-program context, chip
            # round 3)
            need += T * D * 4 + T * D * itemsize
        if need <= 13 * 1024 * 1024:
            return hc, need
    return 0, 0


def _divisors_desc_local(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


def _chunked_fwd(x, wqkv, wo, bo, g, b, *, eps: float,
                 mean_probs: bool = False):
    B, T, E = x.shape
    H = wqkv.shape[2]
    D = E // H
    hc, _ = _chunk_plan(x.shape, H, x.dtype, mean_probs=mean_probs)
    nh = H // hc
    # per-chunk contiguous (q,k,v) columns: (E, 3, H, D) -> (E, H, 3D)
    w = wqkv.transpose(0, 2, 1, 3).reshape(E, H * 3 * D)

    out_shape = [jax.ShapeDtypeStruct((B, T, E), x.dtype)]
    out_specs = [pl.BlockSpec((1, T, E), lambda b_, j: (b_, 0, 0),
                              memory_space=pltpu.VMEM)]
    if mean_probs:
        out_shape.append(jax.ShapeDtypeStruct((B, T, T), jnp.float32))
        out_specs.append(pl.BlockSpec((1, T, T), lambda b_, j: (b_, 0, 0),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_kernel_hchunk, hc=hc, nh=nh, head_dim=D, eps=eps,
                          scale=1.0 / D ** 0.5, num_heads=H,
                          mean_probs=mean_probs),
        grid=(B, nh),
        in_specs=[
            pl.BlockSpec((1, T, E), lambda b_, j: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * hc * D), lambda b_, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc * D, E), lambda b_, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda b_, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda b_, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda b_, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((T, E), x.dtype),
                        pltpu.VMEM((T, E), jnp.float32)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * E * 4 * E + 4 * B * H * T * T * D,
            bytes_accessed=2 * B * T * E * 2 + 8 * E * E,
            transcendentals=B * H * T * T,
        ),
    )(x, w, wo, bo, g, b)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    return tuple(outs) if mean_probs else outs[0]


def _make_chunked_sharded(eps: float):
    def _positional(x, wqkv, wo, bo, g, b):
        return _chunked_fwd(x, wqkv, wo, bo, g, b, eps=eps)

    f = custom_partitioning(_positional)

    def infer(mesh, arg_infos, result_infos):
        return NamedSharding(mesh, _b_spec(arg_infos[0].sharding.spec))

    def part(mesh, arg_infos, result_infos):
        sh = NamedSharding(mesh, _b_spec(arg_infos[0].sharding.spec))
        rep = NamedSharding(mesh, _P())
        return (mesh, _positional, sh, (sh, rep, rep, rep, rep, rep))

    f.def_partition(
        part, infer_sharding_from_operands=infer,
        sharding_rule="b t e, e s h d, f g, o, p, q -> b t e",
        need_replication_factors=("t", "e", "s", "h", "d", "f", "g",
                                  "o", "p", "q"))
    return f


_CHUNKED_CACHE: dict = {}


def _make_chunked_op(eps: float):
    @jax.custom_vjp
    def op(x, wqkv, wo, bo, g, b):
        key = float(eps)
        if key not in _CHUNKED_CACHE:
            _CHUNKED_CACHE[key] = _make_chunked_sharded(eps)
        return _CHUNKED_CACHE[key](x, wqkv, wo, bo, g, b)

    def fwd(x, wqkv, wo, bo, g, b):
        return op(x, wqkv, wo, bo, g, b), (x, wqkv, wo, bo, g, b)

    def bwd(res, dout):
        # training at these shapes differentiates the composed path (the
        # chunked kernel is the inference fast path)
        _, vjp = jax.vjp(
            lambda *a: _composed(*a, eps=eps), *res)
        return vjp(dout)

    op.defvjp(fwd, bwd)
    return op


_CHUNKED_OP_CACHE: dict = {}


def supports_chunked_mha(x_shape, num_heads: int, dtype,
                         mean_probs: bool = False,
                         mean_metric: bool = False) -> bool:
    if _use_interpret():
        return False          # the full kernel already covers interpret mode
    B, T, E = x_shape
    D = E // num_heads
    if D % 32 or T > _MAX_CHUNK_T or T < 128 or E < 256:
        return False
    hc, _ = _chunk_plan(x_shape, num_heads, dtype, mean_probs=mean_probs,
                        mean_metric=mean_metric)
    return hc > 0


_MAX_CHUNK_T = 1024


def _composed_with_mean_probs(x, wqkv, wo, bo, g, b, *, eps: float):
    """Differentiable reference for the probs-emitting path (O(T^2) probs
    in HBM — the same cost class as the reference's stashed attention_probs,
    transformer.py:39,48)."""
    from vitx.nn.attention import reference_attention
    from vitx.nn.layers import layer_norm

    H = wqkv.shape[2]
    E = x.shape[-1]
    D = E // H
    h = layer_norm(x, g, b, eps=eps)
    w = wqkv.astype(h.dtype)
    q, k, v = (jnp.einsum("bte,ehd->bhtd", h, w[:, s],
                          preferred_element_type=jnp.float32).astype(h.dtype)
               for s in range(3))
    o, p = reference_attention(q, k, v, return_probs=True)
    out = jnp.einsum("bhtd,hdf->btf", o,
                     wo.astype(h.dtype).reshape(H, D, E),
                     preferred_element_type=jnp.float32).astype(h.dtype)
    return out + bo.astype(h.dtype), jnp.mean(p.astype(jnp.float32), axis=1)


def _make_chunked_probs_sharded(eps: float):
    """custom_partitioning wrapper for the probs-emitting chunked forward:
    batch-parallel over ``data`` exactly like every other kernel entry point
    here (without it, a dp mesh would all-gather the full batch per device
    or fail to partition — ADVICE r2)."""
    def _positional(x, wqkv, wo, bo, g, b):
        return _chunked_fwd(x, wqkv, wo, bo, g, b, eps=eps, mean_probs=True)

    f = custom_partitioning(_positional)

    def _outs(mesh, x_spec):
        b_axis = _b_spec(x_spec)[0]
        return (NamedSharding(mesh, _P(b_axis, None, None)),
                NamedSharding(mesh, _P(b_axis, None, None)))

    def infer(mesh, arg_infos, result_infos):
        return _outs(mesh, arg_infos[0].sharding.spec)

    def part(mesh, arg_infos, result_infos):
        sh = NamedSharding(mesh, _b_spec(arg_infos[0].sharding.spec))
        rep = NamedSharding(mesh, _P())
        return (mesh, _positional,
                _outs(mesh, arg_infos[0].sharding.spec),
                (sh, rep, rep, rep, rep, rep))

    f.def_partition(
        part, infer_sharding_from_operands=infer,
        # probs output factors (u, v) are T-sized but must stay unsharded
        sharding_rule="b t e, e s h d, f g, o, p, q -> b t e, b u v",
        need_replication_factors=("t", "e", "s", "h", "d", "f", "g",
                                  "o", "p", "q", "u", "v"))
    return f


_CHUNKED_PROBS_SHARDED_CACHE: dict = {}


def _make_chunked_probs_op(eps: float):
    @jax.custom_vjp
    def op(x, wqkv, wo, bo, g, b):
        key = float(eps)
        if key not in _CHUNKED_PROBS_SHARDED_CACHE:
            _CHUNKED_PROBS_SHARDED_CACHE[key] = \
                _make_chunked_probs_sharded(eps)
        return _CHUNKED_PROBS_SHARDED_CACHE[key](x, wqkv, wo, bo, g, b)

    def fwd(x, wqkv, wo, bo, g, b):
        return op(x, wqkv, wo, bo, g, b), (x, wqkv, wo, bo, g, b)

    def bwd(res, cts):
        _, vjp = jax.vjp(
            lambda *a: _composed_with_mean_probs(*a, eps=eps), *res)
        return vjp(tuple(cts))

    op.defvjp(fwd, bwd)
    return op


_CHUNKED_PROBS_CACHE: dict = {}


def fused_mha_block_with_mean_probs(x, wqkv, wo, bo, g, b, *,
                                    eps: float = 1e-5):
    """Fused attention half emitting head-MEAN attention probs (B, T, T) —
    the rollout path's input — alongside the block output. Uses the
    head-chunked kernel (probs accumulated across chunks in the output
    block); falls back to the composed differentiable path elsewhere."""
    H = wqkv.shape[2]
    if supports_chunked_mha(x.shape, H, x.dtype, mean_probs=True):
        key = float(eps)
        if key not in _CHUNKED_PROBS_CACHE:
            _CHUNKED_PROBS_CACHE[key] = _make_chunked_probs_op(float(eps))
        return _CHUNKED_PROBS_CACHE[key](x, wqkv, wo, bo, g, b)
    return _composed_with_mean_probs(x, wqkv, wo, bo, g, b, eps=eps)


# --- ToMe variant: per-key additive score bias + head-mean-key output ------
#
# ToMe's proportional attention (Bolya 2023 §3.1) adds log(size) per KEY to
# the attention logits, and its merge metric is the head-mean key — neither
# fits the plain fused kernel's signature, which is why encode_tome ran the
# composed path (chip-measured bench_6: 3082 vs 3879 img/s full-token,
# ROADMAP round 3). This variant folds both into the same one-pallas_call
# block: score bias added in-kernel before the softmax, k accumulated
# across the head loop into a (T, D) fp32 sum written as k_mean, and QKV
# bias supported (imported timm/HF checkpoints — the realistic ToMe users —
# have one; the reference does not, transformer.py:12-17).

def _kernel_tome(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g_ref, b_ref,
                 ls_ref, o_ref, km_ref, *, num_heads: int, eps: float,
                 scale: float):
    E = x_ref.shape[-1]
    D = E // num_heads
    s = x_ref[0]                                        # (T, E)
    s32 = s.astype(jnp.float32)
    mean = jnp.mean(s32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s32 - mean), axis=-1, keepdims=True)
    h = ((s32 - mean) * jax.lax.rsqrt(var + eps)
         * g_ref[...] + b_ref[...]).astype(s.dtype)
    qkv = (jnp.dot(h, wqkv_ref[...],
                   preferred_element_type=jnp.float32,
                   precision=dot_precision(h, wqkv_ref))
           + bqkv_ref[...]).astype(s.dtype)             # (T, 3E)
    ls = ls_ref[0].astype(jnp.float32)                  # (1, T) key bias
    outs = []
    k_sum = None
    for head in range(num_heads):
        q0 = qkv[:, head * D:(head + 1) * D]
        k = qkv[:, E + head * D:E + (head + 1) * D]
        v = qkv[:, 2 * E + head * D:2 * E + (head + 1) * D]
        k_sum = (k.astype(jnp.float32) if k_sum is None
                 else k_sum + k.astype(jnp.float32))
        q = (q0.astype(jnp.float32) * scale).astype(s.dtype)
        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=dot_precision(q, k))
        sc = sc + ls                                    # proportional attn
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(s.dtype), v,
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(v)) / l
        outs.append(o.astype(s.dtype))
    o_all = jnp.concatenate(outs, axis=1)               # (T, E)
    out = jnp.dot(o_all, wo_ref[...],
                  preferred_element_type=jnp.float32,
                  precision=dot_precision(o_all, wo_ref)) + bo_ref[...]
    o_ref[0] = out.astype(o_ref.dtype)
    km_ref[0] = (k_sum / num_heads).astype(km_ref.dtype)


def _tome_fwd(x, wqkv, bqkv, wo, bo, g, b, log_size, *, eps: float):
    B, T, E = x.shape
    H = wqkv.shape[2]
    D = E // H
    wqkv = wqkv.reshape(E, 3 * E)
    bqkv = bqkv.reshape(1, 3 * E).astype(jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_kernel_tome, num_heads=H, eps=eps,
                          scale=1.0 / D ** 0.5),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            # (B, 1, T) with a full (1, 1, T) block: a plain (1, T) block
            # of a (B, T) array violates the TPU (8, 128) trailing-tile rule
            pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, T, E), x.dtype),
                   jax.ShapeDtypeStruct((B, T, D), x.dtype)],
        out_specs=[pl.BlockSpec((1, T, E), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * E * 4 * E + 4 * B * H * T * T * D,
            bytes_accessed=2 * B * T * E * 2 + 8 * E * E,
            transcendentals=B * H * T * T,
        ),
    )(x, wqkv, bqkv, wo, bo, g, b, log_size.reshape(B, 1, T))
    return tuple(outs)


def _composed_tome(x, wqkv, bqkv, wo, bo, g, b, log_size, *, eps: float):
    """Identical math unfused (fallback + VJP reference): LN -> biased QKV
    -> proportional attention -> out-proj, plus the head-mean key."""
    from vitx.nn.layers import layer_norm

    H = wqkv.shape[2]
    E = x.shape[-1]
    h = layer_norm(x, g, b, eps=eps)
    w = wqkv.astype(h.dtype)
    bq = bqkv.astype(h.dtype)                            # (3, H, D)
    q, k, v = (jnp.einsum("bte,ehd->bhtd", h, w[:, s],
                          preferred_element_type=jnp.float32)
               .astype(h.dtype) + bq[s][None, :, None, :]
               for s in range(3))
    D = E // H
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) / (D ** 0.5)
    logits = logits + log_size[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
    o = jnp.einsum("bhts,bhsd->bthd", probs, v,
                   preferred_element_type=jnp.float32).astype(h.dtype)
    o = o.reshape(x.shape)
    out = jnp.einsum("bte,ef->btf", o, wo.astype(h.dtype),
                     preferred_element_type=jnp.float32).astype(h.dtype)
    out = out + bo.astype(h.dtype)
    return out, k.mean(axis=1).astype(h.dtype)


def _make_tome_sharded(eps: float):
    def _positional(x, wqkv, bqkv, wo, bo, g, b, log_size):
        return _tome_fwd(x, wqkv, bqkv, wo, bo, g, b, log_size, eps=eps)

    f = custom_partitioning(_positional)

    def _outs(mesh, x_spec):
        b_axis = _b_spec(x_spec)[0]
        return (NamedSharding(mesh, _P(b_axis, None, None)),
                NamedSharding(mesh, _P(b_axis, None, None)))

    def infer(mesh, arg_infos, result_infos):
        return _outs(mesh, arg_infos[0].sharding.spec)

    def part(mesh, arg_infos, result_infos):
        b_axis = _b_spec(arg_infos[0].sharding.spec)[0]
        sh = NamedSharding(mesh, _P(b_axis, None, None))
        ls_sh = NamedSharding(mesh, _P(b_axis, None))
        rep = NamedSharding(mesh, _P())
        return (mesh, _positional,
                _outs(mesh, arg_infos[0].sharding.spec),
                (sh, rep, rep, rep, rep, rep, rep, ls_sh))

    f.def_partition(
        part, infer_sharding_from_operands=infer,
        # x (b,t,e); wqkv (e,s,h,d); bqkv (s,h,d); wo (f,g); bo/g/b; ls (b,t)
        sharding_rule=("b t e, e s h d, i j k, f g, o, p, q, b u "
                       "-> b t e, b t d"),
        need_replication_factors=("t", "e", "s", "h", "d", "i", "j", "k",
                                  "f", "g", "o", "p", "q", "u"))
    return f


_TOME_SHARDED_CACHE: dict = {}
_TOME_OP_CACHE: dict = {}


def _make_tome_op(eps: float):
    @jax.custom_vjp
    def op(x, wqkv, bqkv, wo, bo, g, b, log_size):
        key = float(eps)
        if key not in _TOME_SHARDED_CACHE:
            _TOME_SHARDED_CACHE[key] = _make_tome_sharded(eps)
        return _TOME_SHARDED_CACHE[key](x, wqkv, bqkv, wo, bo, g, b,
                                        log_size)

    def fwd(*args):
        return op(*args), args

    def bwd(res, cts):
        # ToMe is an inference path; grads (saliency through a ToMe model)
        # differentiate the composed reference math
        _, vjp = jax.vjp(lambda *a: _composed_tome(*a, eps=eps), *res)
        return vjp(tuple(cts))

    op.defvjp(fwd, bwd)
    return op


# -- head-chunked ToMe variant: ViT-L-class blocks whose weights + fp32 qkv
# blow the single-step VMEM budget. Same structure as _kernel_hchunk (LN
# cached across head chunks, out-projection accumulated in fp32 scratch)
# plus the per-key score bias and the head-mean key accumulated in a second
# fp32 scratch, written on the last chunk. ----------------------------------

def _kernel_hchunk_tome(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g_ref,
                        b_ref, ls_ref, o_ref, km_ref, h_scr, acc_scr, km_scr,
                        *, hc: int, nh: int, head_dim: int, eps: float,
                        scale: float, num_heads: int):
    j = pl.program_id(1)
    D = head_dim

    @pl.when(j == 0)
    def _():
        s32 = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(s32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(s32 - mean), axis=-1, keepdims=True)
        h_scr[...] = ((s32 - mean) * jax.lax.rsqrt(var + eps)
                      * g_ref[...] + b_ref[...]).astype(h_scr.dtype)

    h = h_scr[...]                                       # (T, E)
    qkv = (jnp.dot(h, wqkv_ref[...],
                   preferred_element_type=jnp.float32,
                   precision=dot_precision(h, wqkv_ref))
           + bqkv_ref[...])                              # (T, 3*hc*D) fp32
    qkv_c = qkv.astype(h.dtype)
    ls = ls_ref[0].astype(jnp.float32)                   # (1, T)
    outs = []
    k_sum = None
    for i in range(hc):
        base = i * 3 * D
        q0 = qkv_c[:, base:base + D]
        k = qkv_c[:, base + D:base + 2 * D]
        v = qkv_c[:, base + 2 * D:base + 3 * D]
        k_sum = (k.astype(jnp.float32) if k_sum is None
                 else k_sum + k.astype(jnp.float32))
        q = (q0.astype(jnp.float32) * scale).astype(h.dtype)
        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=dot_precision(q, k))
        sc = sc + ls                                     # proportional attn
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(h.dtype), v,
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(v)) / l
        outs.append(o.astype(h.dtype))
    o_chunk = jnp.concatenate(outs, axis=1)              # (T, hc*D)
    partial = jnp.dot(o_chunk, wo_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=dot_precision(o_chunk, wo_ref))
    k_part = k_sum / num_heads

    @pl.when(j == 0)
    def _():
        acc_scr[...] = partial + bo_ref[...]
        km_scr[...] = k_part

    @pl.when(j > 0)
    def _():
        acc_scr[...] += partial
        km_scr[...] += k_part

    @pl.when(j == nh - 1)
    def _():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)
        km_ref[0] = km_scr[...].astype(km_ref.dtype)


def _chunked_tome_fwd(x, wqkv, bqkv, wo, bo, g, b, log_size, *, eps: float):
    B, T, E = x.shape
    H = wqkv.shape[2]
    D = E // H
    hc, _ = _chunk_plan(x.shape, H, x.dtype, mean_metric=True)
    nh = H // hc
    # per-chunk contiguous (q,k,v) columns, bias in the same layout
    w = wqkv.transpose(0, 2, 1, 3).reshape(E, H * 3 * D)
    bq = bqkv.transpose(1, 0, 2).reshape(1, H * 3 * D).astype(jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_kernel_hchunk_tome, hc=hc, nh=nh, head_dim=D,
                          eps=eps, scale=1.0 / D ** 0.5, num_heads=H),
        grid=(B, nh),
        in_specs=[
            pl.BlockSpec((1, T, E), lambda b_, j: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * hc * D), lambda b_, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hc * D), lambda b_, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc * D, E), lambda b_, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda b_, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda b_, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda b_, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b_, j: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, T, E), x.dtype),
                   jax.ShapeDtypeStruct((B, T, D), x.dtype)],
        out_specs=[pl.BlockSpec((1, T, E), lambda b_, j: (b_, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, T, D), lambda b_, j: (b_, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((T, E), x.dtype),
                        pltpu.VMEM((T, E), jnp.float32),
                        pltpu.VMEM((T, D), jnp.float32)],
        interpret=_use_interpret(),
        # 32M scoped-vmem limit: at mid-ladder shapes (e.g. T=416, hc=4)
        # the kernel compiles standalone but the default 16M limit trips
        # in whole-program context (compiler stack temps; chip, round 3) —
        # the real footprint is ~16.6M
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * E * 4 * E + 4 * B * H * T * T * D,
            bytes_accessed=2 * B * T * E * 2 + 8 * E * E,
            transcendentals=B * H * T * T,
        ),
    )(x, w, bq, wo, bo, g, b, log_size.reshape(B, 1, T))
    return tuple(outs)


def _make_chunked_tome_sharded(eps: float):
    def _positional(x, wqkv, bqkv, wo, bo, g, b, log_size):
        return _chunked_tome_fwd(x, wqkv, bqkv, wo, bo, g, b, log_size,
                                 eps=eps)

    f = custom_partitioning(_positional)

    def _outs(mesh, x_spec):
        b_axis = _b_spec(x_spec)[0]
        return (NamedSharding(mesh, _P(b_axis, None, None)),
                NamedSharding(mesh, _P(b_axis, None, None)))

    def infer(mesh, arg_infos, result_infos):
        return _outs(mesh, arg_infos[0].sharding.spec)

    def part(mesh, arg_infos, result_infos):
        b_axis = _b_spec(arg_infos[0].sharding.spec)[0]
        sh = NamedSharding(mesh, _P(b_axis, None, None))
        ls_sh = NamedSharding(mesh, _P(b_axis, None))
        rep = NamedSharding(mesh, _P())
        return (mesh, _positional,
                _outs(mesh, arg_infos[0].sharding.spec),
                (sh, rep, rep, rep, rep, rep, rep, ls_sh))

    f.def_partition(
        part, infer_sharding_from_operands=infer,
        sharding_rule=("b t e, e s h d, i j k, f g, o, p, q, b u "
                       "-> b t e, b t d"),
        need_replication_factors=("t", "e", "s", "h", "d", "i", "j", "k",
                                  "f", "g", "o", "p", "q", "u"))
    return f


_CHUNKED_TOME_SHARDED_CACHE: dict = {}
_CHUNKED_TOME_OP_CACHE: dict = {}


def _make_chunked_tome_op(eps: float):
    @jax.custom_vjp
    def op(x, wqkv, bqkv, wo, bo, g, b, log_size):
        key = float(eps)
        if key not in _CHUNKED_TOME_SHARDED_CACHE:
            _CHUNKED_TOME_SHARDED_CACHE[key] = _make_chunked_tome_sharded(eps)
        return _CHUNKED_TOME_SHARDED_CACHE[key](x, wqkv, bqkv, wo, bo, g, b,
                                                log_size)

    def fwd(*args):
        return op(*args), args

    def bwd(res, cts):
        _, vjp = jax.vjp(lambda *a: _composed_tome(*a, eps=eps), *res)
        return vjp(tuple(cts))

    op.defvjp(fwd, bwd)
    return op


def fused_mha_block_tome(x, wqkv, bqkv, wo, bo, g, b, log_size, *,
                         eps: float = 1e-5):
    """ToMe attention half, fused: LN -> QKV(+bias) -> proportional
    attention (per-key ``log_size`` score bias) -> out-proj; also returns
    the head-mean key (B, T, D) — the merge metric. ``bqkv`` is (3, H, D)
    (zeros when the model has no QKV bias). Large models route through the
    head-chunked variant; shapes outside both envelopes run composed."""
    H = wqkv.shape[2]
    key = float(eps)
    if supports_fused_mha(x.shape, H, x.dtype):
        if key not in _TOME_OP_CACHE:
            _TOME_OP_CACHE[key] = _make_tome_op(key)
        return _TOME_OP_CACHE[key](x, wqkv, bqkv, wo, bo, g, b, log_size)
    if supports_chunked_mha(x.shape, H, x.dtype, mean_metric=True):
        if key not in _CHUNKED_TOME_OP_CACHE:
            _CHUNKED_TOME_OP_CACHE[key] = _make_chunked_tome_op(key)
        return _CHUNKED_TOME_OP_CACHE[key](x, wqkv, bqkv, wo, bo, g, b,
                                           log_size)
    return _composed_tome(x, wqkv, bqkv, wo, bo, g, b, log_size, eps=eps)


# --- SPMD: batch-parallel; weights/params replicated per shard -------------

def _b_spec(spec, ndim=3):
    parts = list(spec) + [None] * (ndim - len(spec))
    return _P(parts[0], None, None)


def _make_sharded(eps: float, stash: bool):
    def _positional(x, wqkv, wo, bo, g, b):
        return _fused_fwd(x, wqkv, wo, bo, g, b, eps=eps, stash=stash)

    f = custom_partitioning(_positional)

    def _out_shardings(mesh, x_spec):
        sh = NamedSharding(mesh, _b_spec(x_spec))
        if not stash:
            return sh
        qkv_sh = NamedSharding(mesh, _P(_b_spec(x_spec)[0]))
        return (sh, qkv_sh, qkv_sh, qkv_sh, sh)

    def infer(mesh, arg_infos, result_infos):
        return _out_shardings(mesh, arg_infos[0].sharding.spec)

    def part(mesh, arg_infos, result_infos):
        x_sh = NamedSharding(mesh, _b_spec(arg_infos[0].sharding.spec))
        rep = NamedSharding(mesh, _P())
        arg_sh = (x_sh, rep, rep, rep, rep, rep)
        return (mesh, _positional,
                _out_shardings(mesh, arg_infos[0].sharding.spec), arg_sh)

    rule_out = ("b t e, b h t d, b h t d, b h t d, b t e" if stash
                else "b t e")
    f.def_partition(
        part, infer_sharding_from_operands=infer,
        # x (b,t,e); wqkv (e,s,h,d); wo (f,g); bo/g/b (o, p, q)
        sharding_rule=(f"b t e, e s h d, f g, o, p, q -> {rule_out}"),
        need_replication_factors=("t", "e", "s", "h", "d", "f", "g",
                                  "o", "p", "q"))
    return f


_SHARDED_CACHE: dict = {}


def _fused_fwd_sharded(x, wqkv, wo, bo, g, b, *, eps: float,
                       stash: bool = False):
    key = (float(eps), stash)
    if key not in _SHARDED_CACHE:
        _SHARDED_CACHE[key] = _make_sharded(eps, stash)
    return _SHARDED_CACHE[key](x, wqkv, wo, bo, g, b)


# --- public op with VJP -----------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_op(x, wqkv, wo, bo, g, b, eps):
    return _fused_fwd_sharded(x, wqkv, wo, bo, g, b, eps=eps)


def _fused_op_fwd(x, wqkv, wo, bo, g, b, eps):
    # the stash variant writes q/k/v in the flash-bwd kernel's native
    # (B, H, T, D) layout as three separate arrays plus the pre-projection
    # head outputs — the backward below needs NO forward recompute, NO
    # relayout copies, and NO slice of a stacked stash
    out, q, k, v, o_all = _fused_fwd_sharded(x, wqkv, wo, bo, g, b, eps=eps,
                                             stash=True)
    # Under jax.checkpoint this fwd rule runs in BOTH passes (remat of a
    # custom_vjp re-runs the rule; profiled round 2). Naming the outputs
    # lets remat="save_stash" (vitx/nn/vit.py) keep them instead of
    # re-running the kernel in the backward — the fwd pass already paid
    # for these HBM writes.
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "mha_out")
    q = checkpoint_name(q, "mha_q")
    k = checkpoint_name(k, "mha_k")
    v = checkpoint_name(v, "mha_v")
    o_all = checkpoint_name(o_all, "mha_oall")
    return out, (x, wqkv, wo, g, b, q, k, v, o_all)


def _fused_op_bwd(eps, res, dout):
    from vitx.kernels.flash_attention import _bwd_sharded
    from vitx.nn.layers import layer_norm

    x, wqkv, wo, g, b, q, k, v, o_all = res
    H = wqkv.shape[2]
    E = x.shape[-1]
    D = E // H

    # out-projection grads (out = o_all @ wo + bo)
    dwo = jnp.einsum("bte,btf->ef", o_all, dout,
                     preferred_element_type=jnp.float32).astype(wo.dtype)
    dbo = jnp.sum(dout.astype(jnp.float32), axis=(0, 1))
    do = jnp.einsum("btf,hdf->bhtd", dout,
                    wo.astype(dout.dtype).reshape(H, D, E),
                    preferred_element_type=jnp.float32).astype(dout.dtype)

    # attention grads via the flash backward kernel (q/k/v already native)
    dq, dk, dv = _bwd_sharded(q, k, v, do)

    # qkv-projection grads (qkv = LN(x) @ wqkv), per projection — stacking
    # only the WEIGHT-sized grads (E,3,H,D), never a (3,B,H,T,D) activation
    # stack (the old stacked einsums cost a full extra HBM round trip of
    # the activation gradients, profiled round 2)
    h = layer_norm(x, g, b, eps=eps)
    wq, wk, wv = (wqkv[:, s].astype(dq.dtype) for s in range(3))
    dwqkv = jnp.stack(
        [jnp.einsum("bte,bhtd->ehd", h, d,
                    preferred_element_type=jnp.float32).astype(wqkv.dtype)
         for d in (dq, dk, dv)], axis=1)                 # (E, 3, H, D)
    dh = (jnp.einsum("bhtd,ehd->bte", dq, wq,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bhtd,ehd->bte", dk, wk,
                       preferred_element_type=jnp.float32)
          + jnp.einsum("bhtd,ehd->bte", dv, wv,
                       preferred_element_type=jnp.float32)).astype(x.dtype)

    # LayerNorm backward (custom VJP -> fused Pallas pass on TPU)
    _, ln_vjp = jax.vjp(
        lambda x_, g_, b_: layer_norm(x_, g_, b_, eps=eps), x, g, b)
    dx, dg, db = ln_vjp(dh)
    return dx, dwqkv, dwo, dbo, dg, db


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


def supports_fused_mha(x_shape, num_heads: int, dtype) -> bool:
    """VMEM feasibility + Mosaic constraints for the fused block."""
    if _use_interpret():
        return True
    B, T, E = x_shape
    D = E // num_heads
    if D % 32 or T > 2048:
        return False
    if T < 32 or E < 256:
        # tiny MODELS (small E) lose to XLA's fusions (see mlp_block guard).
        # Small T with large E — ToMe's late blocks — WINS in-kernel: the
        # floor was 128 until round 3 measured ViT-B tome_r=13 at 4871
        # img/s with T>=32 fused vs 4181 with its T<128 blocks composed.
        return False
    itemsize = jnp.dtype(dtype).itemsize
    need = (4 * E * E * itemsize            # wqkv (E,3E) + wo (E,E) resident
            + 2 * T * E * itemsize          # x + out blocks
            + T * 3 * E * 4                 # qkv fp32
            + 2 * T * T * 4                 # score/prob temporaries
            + 4 * T * E * itemsize          # head slices / o_all
            + 4 * T * E * itemsize)         # stash output blocks (VJP path)
    # 16 MB VMEM; moving blocks are small, weights single-buffered —
    # ViT-B needs ~10 MB incl. stash (measured working, round 2); ViT-L@384
    # (~22 MB: the fp32 qkv at T=577 dominates) correctly falls back.
    return need <= 15 * 1024 * 1024


def fused_mha_block(x, wqkv, wo, bo, g, b, *, eps: float = 1e-5):
    """LN(x) -> multi-head attention -> output projection, fused.

    x: (B, T, E); wqkv: (E, 3, H, D); wo: (E, E); bo: (E,) (pass zeros when
    the projection has no bias); g, b: LayerNorm scale/bias (E,).
    Falls back to the composed XLA + flash path for unsupported shapes.
    """
    H = wqkv.shape[2]
    if supports_fused_mha(x.shape, H, x.dtype):
        return _fused_op(x, wqkv, wo, bo, g, b, float(eps))
    if supports_chunked_mha(x.shape, H, x.dtype):
        # large models (ViT-L@384): head-chunked kernel, inference-only
        # fast path (its VJP differentiates the composed path)
        key = float(eps)
        if key not in _CHUNKED_OP_CACHE:
            _CHUNKED_OP_CACHE[key] = _make_chunked_op(float(eps))
        return _CHUNKED_OP_CACHE[key](x, wqkv, wo, bo, g, b)
    return _composed(x, wqkv, wo, bo, g, b, eps=eps)
