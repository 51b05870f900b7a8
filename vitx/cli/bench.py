"""Benchmark CLI: ``python -m vitx.cli.bench [--config N|all]``.

Runs the five BASELINE.json benchmark configurations:
  1 ViT-Tiny 64x64 4-class, batch 8 (forward + train step)
  2 ViT-Small/16 @224 with full augmentation pipeline, batch 32 (train)
  3 ViT-Base/16 @224 batched inference, batch 256 (fused kernels)
  4 ViT-Base/16 @224 full fine-tune step, data-parallel over all devices
  5 ViT-Large/16 @384 inference with attention-rollout extraction

Each prints a JSON line; the repo-root ``bench.py`` is the driver's
single-line headline entry point.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vitx import attention_rollout, forward, forward_with_attn, get_config, init_params
from vitx.core.cache import enable_persistent_cache
from vitx.data.pipeline import make_preprocess
from vitx.parallel import make_mesh, make_parallel_train_step, shard_batch
from vitx.parallel.sharded import place_state
from vitx.train import create_train_state, make_train_step
from vitx.train.step import make_optimizer


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0])


def _time(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _train_time(step, state, batch, rng, iters=10, warmup=2):
    for _ in range(warmup):
        state, metrics = step(state, batch, rng)
    _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    _sync(metrics["loss"])
    return (time.perf_counter() - t0) / iters


def _images(rng, b, s, dtype=jnp.bfloat16):
    return jax.random.normal(rng, (b, s, s, 3), dtype)


def bench_1():
    cfg = get_config("tiny")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _images(jax.random.PRNGKey(1), 8, 64)
    fwd = jax.jit(lambda p, x: forward(p, x, cfg))
    dt_f = _time(fwd, params, x)
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = {"image": x, "label": jnp.zeros((8,), jnp.int32)}
    dt_t = _train_time(step, state, batch, jax.random.PRNGKey(2))
    return {"config": "1:vit-tiny-64", "forward_ms": round(dt_f * 1e3, 3),
            "train_step_ms": round(dt_t * 1e3, 3),
            "train_images_per_sec": round(8 / dt_t, 1)}


def bench_2():
    cfg = get_config("small16")
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    pre = make_preprocess(out_size=224, random_flip=True)
    u8 = np.random.default_rng(0).integers(0, 255, (32, 256, 256, 3),
                                           dtype=np.uint8)

    def full(state, u8, rng):
        imgs = pre(u8, rng, train=True).astype(cfg.cdtype())
        return step(state, {"image": imgs,
                            "label": jnp.zeros((32,), jnp.int32)}, rng)

    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        state, metrics = full(state, u8, rng)
    _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = full(state, u8, rng)
    _sync(metrics["loss"])
    dt = (time.perf_counter() - t0) / 10
    return {"config": "2:vit-s16-augment-train", "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(32 / dt, 1)}


def bench_3():
    cfg = get_config("base16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _images(jax.random.PRNGKey(1), 256, 224)
    fwd = jax.jit(lambda p, x: forward(p, x, cfg))
    dt = _time(fwd, params, x, iters=20)
    return {"config": "3:vit-b16-infer-256", "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(256 / dt, 1)}


def bench_4():
    cfg = get_config("base16")
    n = len(jax.devices())
    mesh = make_mesh(dp=n, tp=1)
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    state = place_state(state, cfg, mesh)
    step = make_parallel_train_step(cfg, opt, mesh)
    B = 64 * n
    batch = shard_batch(
        {"image": _images(jax.random.PRNGKey(1), B, 224),
         "label": jnp.zeros((B,), jnp.int32)}, mesh)
    dt = _train_time(step, state, batch, jax.random.PRNGKey(2))
    return {"config": f"4:vit-b16-train-dp{n}", "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(B / dt, 1), "devices": n}


def bench_5():
    cfg = get_config("large16_384")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _images(jax.random.PRNGKey(1), 8, 384)

    def infer_rollout(p, x):
        logits, probs = forward_with_attn(p, x, cfg)
        return logits, attention_rollout(probs)

    fn = jax.jit(infer_rollout)
    dt = _time(fn, params, x, iters=5)
    return {"config": "5:vit-l16-384-rollout", "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(8 / dt, 1)}


BENCHES = {1: bench_1, 2: bench_2, 3: bench_3, 4: bench_4, 5: bench_5}


def main(argv=None):
    p = argparse.ArgumentParser(prog="vitx.bench")
    p.add_argument("--config", default="all",
                   help="benchmark number 1-5 or 'all'")
    args = p.parse_args(argv)
    enable_persistent_cache()
    which = (sorted(BENCHES) if args.config == "all"
             else [int(args.config)])
    for i in which:
        print(json.dumps(BENCHES[i]()))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
