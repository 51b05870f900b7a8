"""Fused multi-head attention Pallas TPU kernels.

The TPU-native replacement for the reference's attention kernels — both the
Python per-head loop (``src/VisionTransformer/transformer.py:20-31``) and the
hand-written C path (``csrc/vit.c:241-326``, QKV_MUL/MAT_MUL/SOFTMAX_MAT).
One kernel computes all of scale -> logits -> stable softmax -> @V without
materializing the (T, T) matrix in HBM.

Design notes (ViT regime: non-causal, no mask, T <= ~600, head_dim 64):
- ViT attention is grid-overhead-bound, not FLOP-bound, at these sizes: a
  (B, H, nq) grid is hundreds of microsecond-scale iterations. So the grid is
  (B, H/hc, nq) with ``hc`` heads batched per step, hc chosen as the largest
  divisor of H whose buffers fit a VMEM budget; K/V for those heads live
  fully in VMEM and each step does ONE batched matmul + stable softmax + one
  batched matmul — no online-softmax K loop needed at ViT sequence lengths.
- Matmul inputs stay in native dtype (bf16 rides the MXU at full rate) with
  fp32 accumulation; softmax is fp32 and max-subtracted (the reference C
  softmax is not, vit.c:215-229 — a bug class this kernel removes).
- Backward: custom VJP; the backward kernel recomputes logits AND softmax
  stats from (q, k, v, do) in one full-T pass — no lse/output residuals, so
  forward saves nothing but its inputs.
- ``flash_attention_with_probs`` additionally writes the (T, T) probabilities
  to HBM — the instrumented variant backing the attention-map API
  (reference transformer.py:39,48) without slowing the fast path.

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_VMEM_BUDGET = 8 * 1024 * 1024     # conservative half of ~16 MB VMEM


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block_q(t_pad: int) -> int:
    for bq in (512, 256, 128):
        if t_pad % bq == 0:
            return bq
    return t_pad  # below the 128 target: single sublane-aligned block


def _pad_len(t: int, bq_target: int = 128) -> int:
    if t <= bq_target:
        return max(8, -(-t // 8) * 8)
    return -(-t // bq_target) * bq_target


def _head_chunk(H: int, vmem_per_head: int) -> int:
    """Largest divisor of H whose per-step buffers fit the VMEM budget."""
    for hc in range(H, 0, -1):
        if H % hc == 0 and hc * vmem_per_head <= _VMEM_BUDGET:
            return hc
    return 1


def _maybe_pad_t(arrs, T: int, t_pad: int):
    if t_pad == T:
        return arrs
    pad = [(0, 0), (0, 0), (0, t_pad - T), (0, 0)]
    return [jnp.pad(a, pad) for a in arrs]


def _bmm(a, b, contract, batch=((0,), (0,))):
    """Batched matmul over the head axis, fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, ((contract[0], contract[1]), batch),
        preferred_element_type=jnp.float32)


def _softmax_probs(q, k, scale, kv_len):
    """(hc, bq, D) x (hc, Tp, D) -> stable softmax probs (hc, bq, Tp) fp32."""
    s = _bmm(q, k, ((2,), (2,))) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_len, with_probs):
    q = q_ref[0]                                         # (hc, bq, D)
    k = k_ref[0]                                         # (hc, Tp, D)
    v = v_ref[0]

    p = _softmax_probs(q, k, scale, kv_len)
    o = _bmm(p.astype(v.dtype), v, ((2,), (1,)))         # (hc, bq, D)
    o_ref[0] = o.astype(o_ref.dtype)
    if with_probs:
        probs_ref = rest[0]
        probs_ref[0] = p.astype(probs_ref.dtype)


def _fwd(q, k, v, *, with_probs: bool):
    """q,k,v: (B, H, T, D) -> out (B, H, T, D) [, probs (B, H, T, T)]."""
    B, H, T, D = q.shape
    scale = 1.0 / (D ** 0.5)
    t_pad = _pad_len(T)
    bq = _pick_block_q(t_pad)
    nq = t_pad // bq
    q, k, v = _maybe_pad_t([q, k, v], T, t_pad)

    itemsize = jnp.dtype(q.dtype).itemsize
    per_head = (bq * D * itemsize          # q block
                + 2 * t_pad * D * itemsize  # k, v
                + 2 * bq * t_pad * 4        # s/p fp32 (2 live)
                + bq * D * 4)               # o accum
    if with_probs:
        per_head += bq * t_pad * 4
    hc = _head_chunk(H, per_head)
    nh = H // hc

    qspec = pl.BlockSpec((1, hc, bq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, hc, t_pad, D), lambda b, h, i: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((B, H, t_pad, D), q.dtype)]
    out_specs = [qspec]
    if with_probs:
        out_shape.append(
            jax.ShapeDtypeStruct((B, H, t_pad, t_pad), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, hc, bq, t_pad), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=T,
                          with_probs=with_probs),
        grid=(B, nh, nq),
        in_specs=[qspec, kvspec, kvspec],
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * t_pad * t_pad * D,
            bytes_accessed=4 * B * H * t_pad * D * itemsize,
            transcendentals=B * H * t_pad * t_pad,
        ),
    )(q, k, v)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]

    o = outs[0][:, :, :T, :]
    if with_probs:
        return o, outs[1][:, :, :T, :T]
    return o


# ---------------------------------------------------------------------------
# Backward (full-T recompute)
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale, kv_len):
    q = q_ref[0]                                         # (hc, Tp, D)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    p = _softmax_probs(q, k, scale, kv_len)              # (hc, Tp, Tp) fp32
    pc = p.astype(q.dtype)
    dv = _bmm(pc, do, ((1,), (1,)))                      # P^T dO
    dp = _bmm(do, v, ((2,), (2,)))                       # dO V^T
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)      # rowsum(P ∘ dP)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq = _bmm(ds, k, ((2,), (1,))) * scale
    dk = _bmm(ds, q, ((1,), (1,))) * scale               # dS^T Q

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(res, do):
    q, k, v = res
    B, H, T, D = q.shape
    scale = 1.0 / (D ** 0.5)
    t_pad = _pad_len(T)
    q, k, v, do = _maybe_pad_t([q, k, v, do], T, t_pad)

    itemsize = jnp.dtype(q.dtype).itemsize
    per_head = (4 * t_pad * D * itemsize    # q, k, v, do
                + 4 * t_pad * t_pad * 4     # p, dp, ds + slack, fp32
                + 3 * t_pad * D * 4)        # dq, dk, dv accum
    hc = _head_chunk(H, per_head)
    nh = H // hc

    tspec = pl.BlockSpec((1, hc, t_pad, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_len=T),
        grid=(B, nh),
        in_specs=[tspec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, H, t_pad, D), q.dtype)] * 3,
        out_specs=[tspec] * 3,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * t_pad * t_pad * D,
            bytes_accessed=7 * B * H * t_pad * D * itemsize,
            transcendentals=B * H * t_pad * t_pad,
        ),
    )(q, k, v, do)

    return dq[:, :, :T, :], dk[:, :, :T, :], dv[:, :, :T, :]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@jax.custom_vjp
def flash_attention(q, k, v):
    """Fused non-causal attention. q,k,v: (B, H, T, D) -> (B, H, T, D)."""
    return _fwd(q, k, v, with_probs=False)


def _flash_fwd_rule(q, k, v):
    return _fwd(q, k, v, with_probs=False), (q, k, v)


flash_attention.defvjp(_flash_fwd_rule, _bwd)


def flash_attention_with_probs(q, k, v):
    """Instrumented variant: returns (out, probs) with probs (B,H,T,T) fp32.

    Forward-only (no VJP) — used by the attention-map / rollout API.
    """
    return _fwd(q, k, v, with_probs=True)
