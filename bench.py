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


def _devloop_seconds(body, iters, *args):
    """Time `iters` applications of body inside ONE jitted device-side loop
    (single dispatch; immune to per-call host/tunnel overhead). `body` takes
    (accumulator, *args) and must fold the accumulator into its input so the
    loop cannot be hoisted. Operands MUST travel as jit arguments — closing
    over them bakes them into the compile payload, which the remote-compile
    tunnel rejects (HTTP 413) for model-sized constants."""
    @jax.jit
    def fn(*args):
        return jax.lax.fori_loop(
            0, iters, lambda i, acc: body(acc, *args), jnp.float32(0))

    _sync(fn(*args))                 # compile + warm
    t0 = time.perf_counter()
    _sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    enable_persistent_cache()
    from vitx import forward, get_config, init_params
    from vitx.train import create_train_state, make_train_step
    from vitx.train.step import make_optimizer

    cfg = get_config("base16", scan_unroll=12)   # ViT-B/16, bf16, unrolled
    cfg_train = get_config("base16")             # rolled scan for training
    rng = jax.random.PRNGKey(0)
    params = init_params(rng, cfg)

    # --- inference: batch 256 (device-looped: one dispatch, 10 iters) ---
    B_inf = 256
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (B_inf, 224, 224, 3), jnp.bfloat16)

    def infer_body(acc, params, images):
        s = jnp.bfloat16(1) + jnp.bfloat16(1e-9) * acc.astype(jnp.bfloat16)
        logits = forward(params, images * s, cfg)
        return acc + jnp.mean(logits)

    dt_inf = _devloop_seconds(infer_body, 10, params, images)
    infer_ips = B_inf / dt_inf

    # --- train step: batch 128, fwd+bwd+AdamW ---
    B_tr = 128
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(2), cfg_train, opt)
    step = make_train_step(cfg_train, opt)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3),
                                   (B_tr, 224, 224, 3), jnp.bfloat16),
        "label": jax.random.randint(jax.random.PRNGKey(4), (B_tr,), 0,
                                    cfg_train.num_classes),
    }
    srng = jax.random.PRNGKey(5)

    # device-looped: lax.scan threads the donated state through 10 steps in
    # one dispatch (steady-state step time, no per-call tunnel overhead)
    from vitx.train.step import train_step as _train_step
    from functools import partial as _partial

    raw_step = _partial(_train_step, cfg=cfg_train, optimizer=opt)

    def scan_steps(state, batch, srng):
        def body(st, _):
            st, metrics = raw_step(st, batch, srng)
            return st, metrics["loss"]
        return jax.lax.scan(body, state, None, length=10)

    scan_jit = jax.jit(scan_steps, donate_argnums=(0,))
    state, losses = scan_jit(state, batch, srng)
    _sync(losses)                    # compile + warm
    t0 = time.perf_counter()
    state, losses = scan_jit(state, batch, srng)
    _sync(losses)
    train_ips = B_tr * 10 / (time.perf_counter() - t0)
    del step

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
