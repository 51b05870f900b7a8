"""Small functional building blocks (LayerNorm, MLP, dropout).

Functional equivalents of the reference's ``nn.LayerNorm`` / ``FeedForward``
modules (``src/VisionTransformer/transformer.py:52-79``), computed in fp32
regardless of the compute dtype so that bf16 runs stay numerically sound.
"""

from __future__ import annotations

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


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    """LayerNorm over the last axis, fp32 stats, returns x.dtype.

    Deliberately plain XLA: measured on v5e at ViT-B/16 batch 256, XLA's LN
    is already at the HBM roofline (~0.3 ms net) and routing it through the
    Pallas kernel (vitx.kernels.layer_norm) breaks XLA's surrounding fusions
    — the end-to-end model got 24% SLOWER. The Pallas LN kernels remain
    available for standalone use and as reference kernels.
    """
    return _jnp_layer_norm(x, scale, bias, eps=eps)


def add_layer_norm(x, r, scale, bias, *, eps: float = 1e-5):
    """-> (x + r, LN(x + r)): the pre-LN residual pattern (XLA fuses the add
    into the LN's first pass on its own — see layer_norm's measurement note)."""
    s = x + r
    return s, _jnp_layer_norm(s, scale, bias, eps=eps)


def activation(x, name: str):
    if name == "gelu":
        # exact (erf) GELU to match torch nn.GELU default for parity tests
        return jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"unknown activation {name!r}")


def mlp(x, w1, b1, w2, b2, *, act: str):
    """Position-wise MLP: Linear -> act -> Linear.

    The reference's FeedForward (transformer.py:55-60) with the expansion
    factor folded into the weight shapes.
    """
    h = jnp.einsum("...e,ef->...f", x, w1.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1.astype(x.dtype)
    h = activation(h, act)
    o = jnp.einsum("...f,fe->...e", h, w2.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return o + b2.astype(x.dtype)


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
