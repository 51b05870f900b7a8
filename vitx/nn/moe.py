"""Soft Mixture-of-Experts MLP (Soft-MoE, Puigcerver et al. 2023).

A beyond-reference model family (the reference is a dense ViT only —
``src/VisionTransformer/transformer.py:55-60`` is its one MLP): the last
``cfg.moe_block_count`` encoder blocks replace the dense MLP with a soft
mixture of ``cfg.moe_experts`` expert MLPs.

Soft-MoE is the TPU-native MoE design point. Routed (top-k) MoEs need
data-dependent gather/scatter and capacity buffers — dynamic shapes XLA
can't tile; Soft-MoE instead makes every slot a learned CONVEX combination
of all tokens and every token's output a convex combination of all slot
outputs, so the whole layer is five static-shape einsums and two softmaxes:

    logits  = scale * l2n(x) @ l2n(phi)          (B,T,n,s)
    D       = softmax_T(logits)                  dispatch weights
    C       = softmax_{n*s}(logits)              combine weights
    slots   = D^T x                              (B,n,s,E)
    y_slots = expert_mlp_n(slots)                per-expert weights
    y       = C @ y_slots                        (B,T,E)

Fully differentiable (no load-balancing loss, no token dropping), and every
matmul is large and batched — it lowers straight onto the MXU. The l2
normalization + learned per-layer scale is the paper's §2.3 stability fix
(unnormalized router logits drift with the residual-stream norm, which
matters in bf16).

Expert parallelism (``cfg.ep``): the expert dimension of the weights and the
slot activations is sharded over the mesh's ``expert`` axis
(vitx/parallel/mesh.py). Outside the MoE layer the batch is sharded over
data x expert; XLA inserts the dp<->ep all-to-alls at the dispatch/combine
einsums — the scaling-book MoE recipe, no hand-written collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vitx.core.config import ViTConfig
from vitx.nn.layers import activation

Params = dict


def init_moe_blocks(rng, cfg: ViTConfig) -> Params:
    """Stacked params for the trailing MoE blocks: the standard attention/LN
    leaves (shared machinery with ``init_blocks``) with the dense MLP weights
    replaced by router + per-expert MLP weights."""
    from vitx.nn.vit import _trunc_normal, init_blocks

    k = cfg.moe_block_count
    pdt = cfg.pdtype()
    n, s = cfg.moe_experts, cfg.moe_slot_count
    E, M = cfg.embed_dim, cfg.mlp_dim
    std = cfg.init_std

    ka, kp, k1, k2 = jax.random.split(rng, 4)
    bp = init_blocks(ka, cfg, depth=k)
    for name in ("w1", "b1", "w2", "b2"):
        bp.pop(name)
    bp["phi"] = _trunc_normal(kp, (k, E, n, s), std, pdt)
    # the paper's learned router scale, init 1 (one scalar per layer)
    bp["router_scale"] = jnp.ones((k,), pdt)
    bp["ew1"] = _trunc_normal(k1, (k, n, E, M), std, pdt)
    bp["eb1"] = jnp.zeros((k, n, M), pdt)
    bp["ew2"] = _trunc_normal(k2, (k, n, M, E), std, pdt)
    bp["eb2"] = jnp.zeros((k, n, E), pdt)
    return bp


def _l2n(x, axis):
    return x * jax.lax.rsqrt(
        jnp.sum(jnp.square(x), axis=axis, keepdims=True) + 1e-6)


def soft_moe_mlp(h, bp, cfg: ViTConfig):
    """Post-LN tokens h (B, T, E) -> MoE MLP output (B, T, E).

    Router math (logits + both softmaxes) in fp32; the expert matmuls in the
    compute dtype with fp32 accumulation, like the dense MLP
    (vitx/nn/layers.py::mlp).
    """
    cdt = h.dtype
    f32 = jnp.float32
    xn = _l2n(h.astype(f32), axis=-1)
    phin = _l2n(bp["phi"].astype(f32), axis=0)              # (E, n, s)
    logits = bp["router_scale"].astype(f32) * jnp.einsum(
        "bte,ens->btns", xn, phin, preferred_element_type=f32)
    B, T, n, s = logits.shape
    disp = jax.nn.softmax(logits, axis=1)                   # over tokens
    comb = jax.nn.softmax(logits.reshape(B, T, n * s),
                          axis=-1).reshape(B, T, n, s)      # over all slots

    slot_in = jnp.einsum("bte,btns->bnse", h, disp.astype(cdt),
                         preferred_element_type=f32).astype(cdt)
    if cfg.ep:
        # pin the slot tensors expert-sharded: XLA turns the surrounding
        # einsums into the dp<->ep all-to-alls (batch rides data, experts
        # ride the expert axis through the expert matmuls)
        from jax.sharding import PartitionSpec as P

        slot_spec = P("data", "expert", None, None)
        slot_in = jax.lax.with_sharding_constraint(slot_in, slot_spec)
    h1 = jnp.einsum("bnse,nem->bnsm", slot_in, bp["ew1"].astype(cdt),
                    preferred_element_type=f32).astype(cdt)
    h1 = h1 + bp["eb1"].astype(cdt)[:, None, :]
    h1 = activation(h1, cfg.mlp_act)
    ys = jnp.einsum("bnsm,nme->bnse", h1, bp["ew2"].astype(cdt),
                    preferred_element_type=f32).astype(cdt)
    ys = ys + bp["eb2"].astype(cdt)[:, None, :]
    if cfg.ep:
        ys = jax.lax.with_sharding_constraint(ys, slot_spec)
    return jnp.einsum("bnse,btns->bte", ys, comb.astype(cdt),
                      preferred_element_type=f32).astype(cdt)
