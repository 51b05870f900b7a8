"""Confidence calibration: ECE and temperature scaling (Guo et al. 2017).

Production serving reads softmax confidences as probabilities; modern ViTs
are systematically overconfident. Temperature scaling is the standard
post-hoc fix — ONE scalar ``T`` fitted on a held-out set by minimizing NLL
of ``logits / T`` — and expected calibration error (ECE) is the standard
measure. Beyond-reference capability (the reference reports accuracy only,
``src/train.py:100-113``).

Everything here is jit-compiled JAX with static bin counts — the ECE
histogram is one ``segment_sum``-style one-hot matmul, and the temperature
fit is Newton's method on the 1-D convex NLL (``lax.scan``, fixed 30
steps), so both run on-device for any eval-set size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_bins",))
def expected_calibration_error(probs, labels, num_bins: int = 15):
    """ECE over equal-width confidence bins (Guo 2017 eq. 3).

    probs: (N, C) softmax outputs; labels: (N,) int. Returns a scalar in
    [0, 1]: sum_b (n_b / N) * |acc_b - conf_b|.
    """
    probs = probs.astype(jnp.float32)
    conf = jnp.max(probs, axis=-1)
    correct = (jnp.argmax(probs, axis=-1) == labels).astype(jnp.float32)
    # bin index in [0, num_bins); conf == 1.0 lands in the last bin
    idx = jnp.clip((conf * num_bins).astype(jnp.int32), 0, num_bins - 1)
    onehot = jax.nn.one_hot(idx, num_bins, dtype=jnp.float32)   # (N, B)
    n_b = onehot.sum(axis=0)
    acc_b = correct @ onehot
    conf_b = conf @ onehot
    gap = jnp.abs(acc_b - conf_b) / jnp.maximum(n_b, 1.0)
    return jnp.sum(gap * n_b) / probs.shape[0]


@jax.jit
def fit_temperature(logits, labels):
    """Fit the temperature-scaling scalar: argmin_T NLL(logits / T).

    Newton's method on ``t = log T`` (the NLL is smooth and convex in T;
    the log parameterization keeps T positive). 30 fixed iterations — far
    past convergence for any real logit distribution. Returns T (scalar).
    """
    logits = logits.astype(jnp.float32)

    def nll(t):
        logp = jax.nn.log_softmax(logits / jnp.exp(t), axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(logp, labels[:, None], axis=-1))

    g = jax.grad(nll)
    h = jax.grad(lambda t: g(t))

    def newton(t, _):
        step = g(t) / jnp.maximum(jnp.abs(h(t)), 1e-8)
        return t - jnp.clip(step, -1.0, 1.0), None

    t, _ = jax.lax.scan(newton, jnp.float32(0.0), None, length=30)
    return jnp.exp(t)


def calibration_report(logits, labels, num_bins: int = 15) -> dict:
    """Fit T and report ECE/NLL before and after scaling (host floats)."""
    logits = jnp.asarray(logits, dtype=jnp.float32)
    labels = jnp.asarray(labels)
    temp = fit_temperature(logits, labels)

    def stats(lg):
        probs = jax.nn.softmax(lg, axis=-1)
        logp = jax.nn.log_softmax(lg, axis=-1)
        nll = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        return (expected_calibration_error(probs, labels, num_bins), nll)

    ece0, nll0 = stats(logits)
    ece1, nll1 = stats(logits / temp)
    return {
        "temperature": round(float(temp), 4),
        "ece_before": round(float(ece0), 4),
        "ece_after": round(float(ece1), 4),
        "nll_before": round(float(nll0), 4),
        "nll_after": round(float(nll1), 4),
    }
