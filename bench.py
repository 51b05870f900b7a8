"""Benchmark: ViT-B/16 @224 images/sec/chip (BASELINE.json headline metric).

Measures batched inference (batch 256, bf16, fused patch-embed + Pallas flash
attention — BASELINE.json config 3) and the full training step
(fwd+bwd+AdamW, batch 128). Prints ONE JSON line.

vs_baseline is against the reference's only empirical record: ~372.5
images/sec on its author's CUDA GPU (src/vit.ipynb cell 28; BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp

from vitx.core.cache import enable_persistent_cache


def _sync(x):
    """Force device->host materialization: on the axon TPU tunnel,
    block_until_ready alone does not synchronize until a buffer has been
    fetched at least once."""
    import numpy as np

    return np.asarray(jax.tree.leaves(x)[0])


def _bench(fn, args, iters, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    enable_persistent_cache()
    from vitx import forward, get_config, init_params
    from vitx.train import create_train_state, make_train_step
    from vitx.train.step import make_optimizer

    cfg = get_config("base16")          # ViT-B/16 @224, bf16 compute
    rng = jax.random.PRNGKey(0)
    params = init_params(rng, cfg)

    # --- inference: batch 256 ---
    B_inf = 256
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (B_inf, 224, 224, 3), jnp.bfloat16)
    infer = jax.jit(lambda p, x: forward(p, x, cfg))
    dt_inf = _bench(infer, (params, images), iters=20)
    infer_ips = B_inf / dt_inf

    # --- train step: batch 128, fwd+bwd+AdamW ---
    B_tr = 128
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(2), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3),
                                   (B_tr, 224, 224, 3), jnp.bfloat16),
        "label": jax.random.randint(jax.random.PRNGKey(4), (B_tr,), 0,
                                    cfg.num_classes),
    }
    srng = jax.random.PRNGKey(5)

    def train_once(state, batch, srng):
        new_state, metrics = step(state, batch, srng)
        return new_state, metrics

    # donation consumes state; thread it through the timing loop
    for _ in range(3):
        state, metrics = train_once(state, batch, srng)
    _sync(metrics["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_once(state, batch, srng)
    _sync(metrics["loss"])
    train_ips = B_tr * iters / (time.perf_counter() - t0)

    baseline_ips = 372.5               # reference GPU record, BASELINE.md
    print(json.dumps({
        "metric": "ViT-B/16 @224 images/sec/chip (batch-256 bf16 inference, "
                  "flash-attn; train fwd+bwd+AdamW batch 128)",
        "value": round(infer_ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(infer_ips / baseline_ips, 2),
        "train_images_per_sec": round(train_ips, 1),
        "infer_step_ms": round(dt_inf * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
