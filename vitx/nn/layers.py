"""Small functional building blocks (LayerNorm, MLP, dropout).

Functional equivalents of the reference's ``nn.LayerNorm`` / ``FeedForward``
modules (``src/VisionTransformer/transformer.py:52-79``), computed in fp32
regardless of the compute dtype so that bf16 runs stay numerically sound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _jnp_layer_norm(x, scale, bias, *, eps: float = 1e-5):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def _ln_bwd_math(x, scale, g, *, eps: float):
    """The LN backward formula (fp32) — the jnp twin of the Pallas kernel in
    vitx.kernels.layer_norm (same math, same accumulation dtype)."""
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    s32 = scale.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * inv
    gs = g32 * s32
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = (inv * (gs - m1 - xhat * m2)).astype(x.dtype)
    red = tuple(range(x.ndim - 1))
    return dx, jnp.sum(g32 * xhat, axis=red), jnp.sum(g32, axis=red)


def _ln_bwd_dispatch(x, scale, g, *, eps: float):
    """Pallas backward on TPU (one fused HBM pass — XLA's autodiff of the
    fp32-upcast LN pattern measured ~10x the roofline inside the ViT-B train
    step, round-2 profile); identical jnp math elsewhere."""
    if jax.default_backend() == "tpu" and x.shape[-1] % 128 == 0:
        from vitx.kernels.layer_norm import ln_bwd

        return ln_bwd(x, scale, g, eps=eps)
    return _ln_bwd_math(x, scale, g, eps=eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_op(x, scale, bias, eps):
    return _jnp_layer_norm(x, scale, bias, eps=eps)


def _layer_norm_op_fwd(x, scale, bias, eps):
    return _jnp_layer_norm(x, scale, bias, eps=eps), (x, scale)


def _layer_norm_op_bwd(eps, res, g):
    x, scale = res
    dx, dscale, dbias = _ln_bwd_dispatch(x, scale, g, eps=eps)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_layer_norm_op.defvjp(_layer_norm_op_fwd, _layer_norm_op_bwd)


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    """LayerNorm over the last axis, fp32 stats, returns x.dtype.

    Forward is deliberately plain XLA: measured on v5e at ViT-B/16 batch 256,
    XLA's LN forward is already at the HBM roofline (~0.3 ms net) and routing
    it through the Pallas kernel (vitx.kernels.layer_norm) breaks XLA's
    surrounding fusions — the end-to-end model got 24% SLOWER. The BACKWARD
    is a custom VJP through the fused Pallas pass (see _ln_bwd_dispatch).
    """
    return _layer_norm_op(x, scale, bias, float(eps))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _add_layer_norm_op(x, r, scale, bias, eps):
    s = x + r
    return s, _jnp_layer_norm(s, scale, bias, eps=eps)


def _add_layer_norm_op_fwd(x, r, scale, bias, eps):
    s = x + r
    return (s, _jnp_layer_norm(s, scale, bias, eps=eps)), (s, scale)


def _add_layer_norm_op_bwd(eps, res, gs):
    s, scale = res
    g_sum, g_y = gs
    dx, dscale, dbias = _ln_bwd_dispatch(s, scale, g_y, eps=eps)
    dx = dx + g_sum
    return dx, dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_add_layer_norm_op.defvjp(_add_layer_norm_op_fwd, _add_layer_norm_op_bwd)


def add_layer_norm(x, r, scale, bias, *, eps: float = 1e-5):
    """-> (x + r, LN(x + r)): the pre-LN residual pattern (XLA fuses the add
    into the LN's first pass on its own — see layer_norm's measurement note).
    Backward routes through the fused Pallas LN-backward on TPU."""
    return _add_layer_norm_op(x, r, scale, bias, float(eps))


def activation(x, name: str):
    if name == "gelu":
        # exact (erf) GELU to match torch nn.GELU default for parity tests
        return jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        # tanh approximation (GPT-2/BERT form): ~15% faster on the MLP
        # matmul+act fusion at ViT-L shapes (measured v5e, round 2); the
        # perf presets use it, parity configs keep exact erf
        return jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"unknown activation {name!r}")


def mlp(x, w1, b1, w2, b2, *, act: str, w3=None, b3=None):
    """Position-wise MLP: Linear -> act -> Linear.

    The reference's FeedForward (transformer.py:55-60) with the expansion
    factor folded into the weight shapes. Computed on a flattened (B*T, E)
    view (measured identical to the einsum form on v5e — XLA flattens the
    batch dims either way; kept 2-D for layout predictability).

    act="swiglu" (Shazeer 2020 "GLU Variants Improve Transformer";
    EVA-02's FFN): hidden = SiLU(x@w1 + b1) * (x@w3 + b3) — a gated hidden
    state from the extra ``w3`` projection, then ``w2`` down as usual.
    Both up-projections are plain (B*T, E) x (E, M) MXU matmuls and the
    gate multiply fuses into them, so the only cost vs GELU is w3's FLOPs.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    h = jnp.dot(x2, w1.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1.astype(x.dtype)
    if act == "swiglu":
        g = jnp.dot(x2, w3.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        g = g + b3.astype(x.dtype)
        h = jax.nn.silu(h) * g
    else:
        h = activation(h, act)
    o = jnp.dot(h, w2.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    o = o + b2.astype(x.dtype)
    return o.reshape(shape[:-1] + (o.shape[-1],))


def dropout(x, rate: float, rng, *, deterministic: bool):
    """Inverted dropout. No-op when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def drop_path(x, rate, rng, *, deterministic: bool):
    """Stochastic depth (per-SAMPLE residual-branch drop, Huang et al. 2016;
    the DeiT training recipe's regularizer). ``rate`` may be a traced
    per-layer value (the model passes a linearly increasing schedule through
    the encoder scan). Identity when deterministic."""
    if deterministic or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                     jnp.zeros_like(x))
