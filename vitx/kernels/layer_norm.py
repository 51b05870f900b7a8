"""Fused LayerNorm Pallas TPU kernels.

LayerNorm is pure HBM bandwidth; XLA's lowering of the fp32-upcast pattern
spends ~5x the roofline on it at ViT-B/16 batch 256 (measured ~1.5 ms per LN,
24 LNs per forward). These kernels do one read + one write per tensor:

- ``fused_layer_norm(x, scale, bias)``: plain LN over the last axis.
- ``fused_add_layer_norm(x, r, scale, bias) -> (x + r, LN(x + r))``: the
  pre-LN residual pattern ``x = x + f(...); h = LN(x)`` in a single pass —
  the sum is computed once in VMEM and both outputs stream out.

Stats are fp32 per row regardless of I/O dtype (bf16-safe). Both have custom
VJPs with Pallas backward kernels (the backward is equally bandwidth-bound).

Used by vitx.nn.layers.layer_norm when running on TPU; jnp fallback
elsewhere. Reference counterpart: nn.LayerNorm uses in Block
(transformer.py:66-79); the C stack defined but never called its own
layer_normalization (vit.c:394-417).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_PER_STEP = 512


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_tiles(n_rows: int):
    rows = min(_ROWS_PER_STEP, n_rows)
    while n_rows % rows:
        rows -= 8 if rows > 8 else 1
        if rows <= 0:
            return n_rows
    return rows


def _stats(x32, eps):
    # two-pass (centered) variance: matches the jnp/torch formulation bit-for
    # -bit closely; the data is VMEM-resident so the extra pass is free
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return mean, inv


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------

def _ln_kernel(x_ref, s_ref, b_ref, y_ref, *, eps, with_add, r_ref=None,
               sum_ref=None):
    x = x_ref[...]
    if with_add:
        x = (x.astype(jnp.float32) + r_ref[...].astype(jnp.float32))\
            .astype(x.dtype)
        sum_ref[...] = x
    x32 = x.astype(jnp.float32)
    mean, inv = _stats(x32, eps)
    y = (x32 - mean) * inv
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _ln_fwd(x2, scale, bias, eps, residual2=None):
    """x2: (R, E) 2-D input; returns y2 (and the sum when residual given)."""
    R, E = x2.shape
    rows = _row_tiles(R)
    grid = (R // rows,)
    xspec = pl.BlockSpec((rows, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM)

    with_add = residual2 is not None
    if with_add:
        def kernel(x_ref, r_ref, s_ref, b_ref, sum_ref, y_ref):
            _ln_kernel(x_ref, s_ref, b_ref, y_ref, eps=eps, with_add=True,
                       r_ref=r_ref, sum_ref=sum_ref)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[xspec, xspec, sspec, sspec],
            out_shape=[jax.ShapeDtypeStruct((R, E), x2.dtype)] * 2,
            out_specs=[xspec, xspec],
            interpret=_use_interpret(),
        )(x2, residual2, scale, bias)
        return outs[1], outs[0]          # (y, summed)

    def kernel(x_ref, s_ref, b_ref, y_ref):
        _ln_kernel(x_ref, s_ref, b_ref, y_ref, eps=eps, with_add=False)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[xspec, sspec, sspec],
        out_shape=jax.ShapeDtypeStruct((R, E), x2.dtype),
        out_specs=xspec,
        interpret=_use_interpret(),
    )(x2, scale, bias)
    return y


# ---------------------------------------------------------------------------
# Backward kernel (recomputes stats — still one read of x)
# ---------------------------------------------------------------------------

def _ln_bwd_kernel(x_ref, s_ref, g_ref, dx_ref, dsum_ref, *, eps):
    x32 = x_ref[...].astype(jnp.float32)
    g32 = g_ref[...].astype(jnp.float32)
    s32 = s_ref[...].astype(jnp.float32)
    mean, inv = _stats(x32, eps)
    xhat = (x32 - mean) * inv
    gs = g32 * s32
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = inv * (gs - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # per-block partial reductions for dscale/dbias
    dsum_ref[0, 0] = jnp.sum(g32 * xhat, axis=0)
    dsum_ref[0, 1] = jnp.sum(g32, axis=0)


def _ln_bwd(x2, scale, g2, eps):
    R, E = x2.shape
    rows = _row_tiles(R)
    nb = R // rows
    xspec = pl.BlockSpec((rows, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM)

    dx, dsums = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(nb,),
        in_specs=[xspec, sspec, xspec],
        out_shape=[
            jax.ShapeDtypeStruct((R, E), x2.dtype),
            jax.ShapeDtypeStruct((nb, 2, E), jnp.float32),
        ],
        out_specs=[
            xspec,
            pl.BlockSpec((1, 2, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=_use_interpret(),
    )(x2, scale, g2)
    dscale = jnp.sum(dsums[:, 0], axis=0)
    dbias = jnp.sum(dsums[:, 1], axis=0)
    return dx, dscale, dbias


# ---------------------------------------------------------------------------
# Batched backward kernel on (B, T, E) with per-item dscale/dbias partials.
#
# This is the kernel vitx.nn.layers.layer_norm routes its BACKWARD through on
# TPU: XLA's autodiff of the fp32-upcast LN pattern ran at ~10x the HBM
# roofline inside the ViT-B train step (profiled round 2: ~19 ms/step across
# 24 LN backwards), because it splits the pass into separate dg/db reductions,
# per-row stats reductions and the dx elementwise in awkward layouts. Here:
# one read of x and dy, one write of dx, fp32 throughout, with the (B, 2, E)
# dscale/dbias partials reduced by one cheap XLA sum outside.
#
# SPMD: batch-parallel over the leading dim via custom_partitioning (the
# (B, 2, E) partials shard with the batch; the outer sum becomes a psum).
# ---------------------------------------------------------------------------

def _ln_bwd3_kernel(x_ref, s_ref, dy_ref, dx_ref, part_ref, *, eps):
    x32 = x_ref[...].astype(jnp.float32)                 # (bb, T, E)
    g32 = dy_ref[...].astype(jnp.float32)
    s32 = s_ref[...].astype(jnp.float32)
    mean, inv = _stats(x32, eps)
    xhat = (x32 - mean) * inv
    gs = g32 * s32
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (inv * (gs - m1 - xhat * m2)).astype(dx_ref.dtype)
    part_ref[:, 0, :] = jnp.sum(g32 * xhat, axis=1)
    part_ref[:, 1, :] = jnp.sum(g32, axis=1)


def _ln_bwd3_call(x, scale, dy, *, eps: float):
    """x, dy: (B, T, E) -> (dx (B, T, E), partials (B, 2, E) fp32)."""
    B, T, E = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    per_item = T * E * (2 * itemsize + itemsize + 12)    # io + fp32 temps
    bb = 1
    for cand in range(min(B, 16), 0, -1):
        if B % cand == 0 and cand * per_item <= _VMEM_BUDGET3:
            bb = cand
            break
    spec = pl.BlockSpec((bb, T, E), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_bwd3_kernel, eps=eps),
        grid=(B // bb,),
        in_specs=[spec,
                  pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
                  spec],
        out_shape=[jax.ShapeDtypeStruct((B, T, E), x.dtype),
                   jax.ShapeDtypeStruct((B, 2, E), jnp.float32)],
        out_specs=[spec,
                   pl.BlockSpec((bb, 2, E), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        interpret=_use_interpret(),
    )(x, scale, dy)


_VMEM_BUDGET3 = 8 * 1024 * 1024

from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as _P  # noqa: E402

_LN_BWD3_CACHE: dict = {}


def _make_ln_bwd3_sharded(eps: float):
    def _positional(x, scale, dy):
        return _ln_bwd3_call(x, scale, dy, eps=eps)

    f = custom_partitioning(_positional)

    def _b_sh(mesh, spec):
        parts = list(spec) + [None] * (3 - len(spec))
        return (NamedSharding(mesh, _P(parts[0], None, None)),
                NamedSharding(mesh, _P(parts[0], None, None)))

    def infer(mesh, arg_infos, result_infos):
        return _b_sh(mesh, arg_infos[0].sharding.spec)

    def part(mesh, arg_infos, result_infos):
        outs = _b_sh(mesh, arg_infos[0].sharding.spec)
        rep = NamedSharding(mesh, _P())
        return (mesh, _positional, outs, (outs[0], rep, outs[0]))

    f.def_partition(part, infer_sharding_from_operands=infer,
                    sharding_rule="b t e, s, b t e -> b t e, b p e",
                    need_replication_factors=("t", "e", "s", "p"))
    return f


def ln_bwd(x, scale, dy, *, eps: float = 1e-5):
    """LayerNorm backward on (..., E): -> (dx, dscale fp32, dbias fp32).

    One fused Pallas pass (see block comment above); any leading dims are
    flattened to (B, T, E) internally. SPMD-safe (batch-parallel rule).
    """
    shape = x.shape
    E = shape[-1]
    if x.ndim == 3:
        x3, dy3 = x, dy
    else:
        x3 = x.reshape(-1, 1, E) if x.ndim < 3 else x.reshape(-1, shape[-2], E)
        dy3 = dy.reshape(x3.shape)
    key = float(eps)
    if key not in _LN_BWD3_CACHE:
        _LN_BWD3_CACHE[key] = _make_ln_bwd3_sharded(key)
    dx, parts = _LN_BWD3_CACHE[key](x3, scale, dy3)
    dscale = jnp.sum(parts[:, 0, :], axis=0)
    dbias = jnp.sum(parts[:, 1, :], axis=0)
    return dx.reshape(shape), dscale, dbias


# ---------------------------------------------------------------------------
# Public API (any leading batch dims; custom VJP)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps=1e-5):
    """LN over the last axis; one HBM read + one write. Any leading dims."""
    shape = x.shape
    y = _ln_fwd(x.reshape(-1, shape[-1]), scale, bias, eps)
    return y.reshape(shape)


def _fln_fwd(x, scale, bias, eps):
    return fused_layer_norm(x, scale, bias, eps), (x, scale)


def _fln_bwd(eps, res, g):
    x, scale = res
    shape = x.shape
    dx, dscale, dbias = _ln_bwd(x.reshape(-1, shape[-1]), scale,
                                g.reshape(-1, shape[-1]), eps)
    return (dx.reshape(shape), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_add_layer_norm(x, r, scale, bias, eps=1e-5):
    """-> (x + r, LN(x + r)) in one pass (the pre-LN residual pattern)."""
    shape = x.shape
    y, summed = _ln_fwd(x.reshape(-1, shape[-1]), scale, bias, eps,
                        residual2=r.reshape(-1, shape[-1]))
    return summed.reshape(shape), y.reshape(shape)


def _faln_fwd(x, r, scale, bias, eps):
    summed, y = fused_add_layer_norm(x, r, scale, bias, eps)
    return (summed, y), (summed, scale)


def _faln_bwd(eps, res, gs):
    summed, scale = res
    g_sum, g_y = gs
    shape = summed.shape
    dx, dscale, dbias = _ln_bwd(summed.reshape(-1, shape[-1]), scale,
                                g_y.reshape(-1, shape[-1]), eps)
    dx = dx.reshape(shape) + g_sum
    return (dx, dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype))


fused_add_layer_norm.defvjp(_faln_fwd, _faln_bwd)
