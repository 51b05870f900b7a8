"""Throughput autotuner: ``python -m vitx.cli.tune --preset base16 --mode train``.

Sweeps the deployment-relevant knobs — per-device batch size, remat policy,
scan unroll — on the CURRENT device and reports images/sec for every
candidate plus the best operating point. The knobs it sweeps are exactly
the ones whose optimum is hardware- and model-dependent (measured on v5e:
ViT-B prefers remat="none" + full unroll at b128, ViT-Tiny prefers the
rolled scan, ViT-L@384 needs remat="block"; a mis-picked batch cost the
round-2 published config-4 number 21%).

One JSON line per candidate on stdout, then a ``{"best": ...}`` summary.
Candidates that fail to compile or exceed memory are reported with an
``"error"`` field and skipped — an OOM at large batch is data, not a crash.

Timing: N iterations inside one jitted device loop, min over reps
(per-dispatch tunnel jitter is tens of ms — see vitx/cli/bench.py).
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0])


def _time_infer(cfg, batch, iters, reps):
    from vitx.nn.vit import forward, init_params

    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, cfg.image_size, cfg.image_size,
                           cfg.num_channels), cfg.cdtype())

    @jax.jit
    def fn(params, x):
        def body(i, acc):
            scl = jnp.asarray(1, x.dtype) + jnp.asarray(1e-9, x.dtype) \
                * acc.astype(x.dtype)
            return acc + jnp.mean(forward(params, x * scl, cfg))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    _sync(fn(params, x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(params, x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _time_train(cfg, batch, iters, reps):
    from vitx.train import create_train_state
    from vitx.train.step import make_optimizer, train_step

    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    data = {
        "image": jax.random.normal(
            jax.random.PRNGKey(1),
            (batch, cfg.image_size, cfg.image_size, cfg.num_channels),
            cfg.cdtype()),
        "label": jnp.zeros((batch,), jnp.int32),
    }
    raw = partial(train_step, cfg=cfg, optimizer=opt)
    rng = jax.random.PRNGKey(2)

    def scan_steps(state, data):
        def body(st, _):
            st, m = raw(st, data, rng)
            return st, m["loss"]
        return jax.lax.scan(body, state, None, length=iters)

    f = jax.jit(scan_steps, donate_argnums=(0,))
    state, losses = f(state, data)
    _sync(losses)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = f(state, data)
        _sync(losses)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run_sweep(cfg, mode, batches, remats, unrolls, iters, reps,
              emit=print):
    """Measure every (batch, remat, unroll) candidate; returns the result
    rows (dicts). Compile/OOM failures become rows with an "error" field."""
    results = []
    for batch, remat, unroll in itertools.product(batches, remats, unrolls):
        cand = {"batch": batch, "remat": remat, "scan_unroll": unroll}
        try:
            c = cfg.replace(remat=remat, scan_unroll=unroll)
            dt = (_time_train if mode == "train" else _time_infer)(
                c, batch, iters, reps)
            row = {**cand, "step_ms": round(dt * 1e3, 3),
                   "images_per_sec": round(batch / dt, 1)}
        except Exception as e:  # XlaRuntimeError / RESOURCE_EXHAUSTED / ...
            row = {**cand, "error": f"{type(e).__name__}: {e}"[:200]}
        results.append(row)
        emit(json.dumps(row))
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--preset", default="base16")
    p.add_argument("--config-json", default=None,
                   help="full ViTConfig JSON (overrides --preset)")
    p.add_argument("--mode", default="train", choices=["train", "infer"])
    p.add_argument("--batches", default="32,64,128,256",
                   help="comma-separated per-device batch sizes")
    p.add_argument("--remat", default=None,
                   help="comma-separated remat policies to sweep "
                        "(default: train sweeps none,block; infer uses "
                        "the config's)")
    p.add_argument("--unroll", default=None,
                   help="comma-separated scan_unroll values (default: the "
                        "config's value and full depth)")
    p.add_argument("--iters", type=int, default=20,
                   help="device-side iterations per dispatch")
    p.add_argument("--reps", type=int, default=3,
                   help="dispatches per candidate (min is reported)")
    p.add_argument("--out", default=None,
                   help="also write the rows + best to this JSON file")
    args = p.parse_args(argv)

    from vitx.core.cache import enable_persistent_cache
    from vitx.core.config import ViTConfig, get_config

    enable_persistent_cache()
    cfg = (ViTConfig.from_json(open(args.config_json).read())
           if args.config_json else get_config(args.preset))
    batches = [int(b) for b in args.batches.split(",")]
    if args.remat:
        remats = args.remat.split(",")
    else:
        remats = (["none", "block"] if args.mode == "train"
                  else [cfg.remat])
    if args.unroll:
        unrolls = [int(u) for u in args.unroll.split(",")]
    else:
        unrolls = sorted({cfg.scan_unroll, cfg.depth})

    results = run_sweep(cfg, args.mode, batches, remats, unrolls,
                        args.iters, args.reps)
    ok = [r for r in results if "error" not in r]
    best = max(ok, key=lambda r: r["images_per_sec"]) if ok else None
    summary = {"best": best, "mode": args.mode,
               "device": jax.devices()[0].device_kind,
               "candidates": len(results), "failed": len(results) - len(ok)}
    print(json.dumps(summary))
    if args.out:
        # written on the all-failed path too: the per-candidate error rows
        # ARE the diagnostics of an unattended sweep
        with open(args.out, "w") as f:
            json.dump({"results": results, **summary}, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
