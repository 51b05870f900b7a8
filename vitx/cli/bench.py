"""Benchmark CLI: ``python -m vitx.cli.bench [--config N|all]``.

Runs the five BASELINE.json benchmark configurations:
  1 ViT-Tiny 64x64 4-class, batch 8 (forward + train step)
  2 ViT-Small/16 @224 with full augmentation pipeline, batch 32 (train)
  3 ViT-Base/16 @224 batched inference, batch 256 (fused kernels)
  4 ViT-Base/16 @224 full fine-tune step, data-parallel over all devices
  5 ViT-Large/16 @384 inference with attention-rollout extraction
  6 ViT-Base/16 @224 batch-256 inference with ToMe (r=13 + aligned schedule)
  7 ViT-Base/16 @224 serving latency b1/4/8 (float; int8 runtime retired)
  8 ViT-Large/16 @384 batch-32 inference with ToMe (r=23 + aligned schedule)

Each prints a JSON line; the repo-root ``bench.py`` is the driver's
single-line headline entry point.

Timing methodology: N iterations inside ONE jitted device-side loop with all
operands passed as jit arguments, then a forced host fetch — per-call timing
through the axon TPU tunnel is wrong in both directions (see bench.py).
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vitx import forward, forward_with_rollout, get_config, init_params
from vitx.core.cache import enable_persistent_cache
from vitx.data.pipeline import make_preprocess
from vitx.parallel import make_mesh, shard_batch
from vitx.parallel.sharded import place_state
from vitx.train import create_train_state
from vitx.train.step import make_optimizer, train_step


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0])


def _scl(acc):
    return jnp.bfloat16(1) + jnp.bfloat16(1e-9) * acc.astype(jnp.bfloat16)


def _fwd_loop_seconds(body, iters, *args, reps=3):
    """body(acc, *args) -> new acc; one dispatch, iters device iterations.

    min-of-reps: per-DISPATCH tunnel jitter is tens of ms (ROADMAP round-3
    timing trap), so short loops need both enough iters to amortize it AND
    the min over repeated dispatches."""
    @jax.jit
    def fn(*args):
        return jax.lax.fori_loop(
            0, iters, lambda i, acc: body(acc, *args), jnp.float32(0))

    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _train_scan_seconds(cfg, opt, state, batch, iters=10, rng=None,
                        out_shardings=None, reps=3):
    raw = partial(train_step, cfg=cfg, optimizer=opt)

    def scan_steps(state, batch):
        def body(st, _):
            st, m = raw(st, batch, rng)
            return st, m["loss"]
        return jax.lax.scan(body, state, None, length=iters)

    kw = {"out_shardings": out_shardings} if out_shardings else {}
    f = jax.jit(scan_steps, donate_argnums=(0,), **kw)
    state, losses = f(state, batch)
    _sync(losses)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = f(state, batch)
        _sync(losses)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _images(rng, b, s, dtype=jnp.bfloat16):
    return jax.random.normal(rng, (b, s, s, 3), dtype)


def bench_1():
    cfg = get_config("tiny")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _images(jax.random.PRNGKey(1), 8, 64)

    def fwd_body(acc, params, x):
        return acc + jnp.mean(forward(params, x * _scl(acc), cfg))

    # tiny bodies are sub-ms: 100+ device iters or the tunnel jitter IS the
    # measurement (the round-2 "2844 img/s" record was exactly that artifact)
    dt_f = _fwd_loop_seconds(fwd_body, 200, params, x)
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = {"image": x, "label": jnp.zeros((8,), jnp.int32)}
    dt_t = _train_scan_seconds(cfg, opt, state, batch, iters=100)
    out = {"config": "1:vit-tiny-64", "forward_ms": round(dt_f * 1e3, 3),
           "train_step_ms": round(dt_t * 1e3, 3),
           "train_images_per_sec": round(8 / dt_t, 1)}

    # Dispatch-amortization rows (VERDICT r4 item 7): tiny models through
    # the remote tunnel are DISPATCH-bound — k=1 is what a naive per-step
    # host loop pays per step; k>1 folds k steps into one dispatch via the
    # Trainer's --steps-per-dispatch scan (loop.py::_make_multi_step,
    # distinct batches per step, exactly the product path). The steady-state
    # row above (train_step_ms, a 100-iter device loop) is the k->inf limit.
    raw = partial(train_step, cfg=cfg, optimizer=opt)
    for k in (1, 4, 16):
        def multi(state, batches, rng):
            def body(st, xs):
                b, i = xs
                st, m = raw(st, b, jax.random.fold_in(rng, i))
                return st, m["loss"]
            return jax.lax.scan(
                body, state, (batches, jnp.arange(k, dtype=jnp.uint32)))

        f = jax.jit(multi, donate_argnums=(0,))
        batches = {"image": jnp.stack([x] * k),
                   "label": jnp.zeros((k, 8), jnp.int32)}
        st = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        st, _ = f(st, batches, jax.random.PRNGKey(1))   # compile
        _sync(st.step)
        n_disp = max(64 // k, 4)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_disp):
                st, losses = f(st, batches, jax.random.PRNGKey(2))
            _sync(losses)
            best = min(best, (time.perf_counter() - t0) / (n_disp * k))
        out[f"train_step_ms_k{k}"] = round(best * 1e3, 3)
        out[f"train_images_per_sec_k{k}"] = round(8 / best, 1)
    return out


def bench_2():
    cfg = get_config("small16")
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    pre = make_preprocess(out_size=224, random_flip=True)
    u8 = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (32, 256, 256, 3), dtype=np.uint8))
    raw = partial(train_step, cfg=cfg, optimizer=opt)
    labels = jnp.zeros((32,), jnp.int32)

    def scan_steps(state, u8, labels, rng):
        def body(carry, _):
            st, r = carry
            r, pr, sr = jax.random.split(r, 3)
            imgs = pre(u8, pr, train=True).astype(cfg.cdtype())
            st, m = raw(st, {"image": imgs, "label": labels}, sr)
            return (st, r), m["loss"]
        return jax.lax.scan(body, (state, rng), None, length=50)

    f = jax.jit(scan_steps, donate_argnums=(0,))
    carry, losses = f(state, u8, labels, jax.random.PRNGKey(1))
    _sync(losses)
    dt = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        carry, losses = f(carry[0], u8, labels, jax.random.PRNGKey(2 + rep))
        _sync(losses)
        dt = min(dt, (time.perf_counter() - t0) / 50)
    return {"config": "2:vit-s16-augment-train", "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(32 / dt, 1)}


def bench_3():
    cfg = get_config("base16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _images(jax.random.PRNGKey(1), 256, 224)

    def body(acc, params, x):
        return acc + jnp.mean(forward(params, x * _scl(acc), cfg))

    dt = _fwd_loop_seconds(body, 20, params, x)
    return {"config": "3:vit-b16-infer-256", "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(256 / dt, 1)}


def bench_4():
    # 128/device is the measured throughput-optimal per-device batch for
    # ViT-B/16 train on v5e (a b64 run undersold the chip by 21% and
    # disagreed with the repo-root bench.py headline — VERDICT r2 item 2;
    # dp sweep note: per-device batch is held constant as dp grows, so the
    # number scales ~linearly with devices modulo the gradient psum).
    cfg = get_config("base16")
    n = len(jax.devices())
    mesh = make_mesh(dp=n, tp=1)
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    # pin the scan's output state to the input shardings — inferred output
    # shardings relayout the whole state per dispatch (131 vs 111 ms/step
    # at dp1, measured round 3; same pinning the Trainer applies)
    from jax.sharding import NamedSharding, PartitionSpec as _P
    from vitx.parallel.sharded import state_sharding

    shardings = state_sharding(state, cfg, mesh)
    state = place_state(state, cfg, mesh)
    B = 128 * n
    batch = shard_batch(
        {"image": _images(jax.random.PRNGKey(1), B, 224),
         "label": jnp.zeros((B,), jnp.int32)}, mesh)
    dt = _train_scan_seconds(
        cfg, opt, state, batch,
        out_shardings=(shardings, NamedSharding(mesh, _P())))
    return {"config": f"4:vit-b16-train-dp{n}", "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(B / dt, 1), "devices": n,
            "per_device_batch": 128}


def bench_5():
    """ViT-L/16@384 inference + attention rollout, fused in-scan accumulation
    (forward_with_rollout): the (depth, B, T, T) probability stack is never
    materialized. Base-model context: plain fwd measures ~226 img/s at these
    shapes on v5e-1 (87 TFLOP/s, ~71% of the chip's measured matmul ceiling) —
    rollout extraction costs ~9% on top."""
    cfg = get_config("large16_384")
    params = init_params(jax.random.PRNGKey(0), cfg)
    B = 8
    x = _images(jax.random.PRNGKey(1), B, 384)

    def body(acc, params, x):
        logits, roll = forward_with_rollout(params, x * _scl(acc), cfg)
        return acc + jnp.mean(logits) + jnp.mean(roll).astype(jnp.float32)

    dt = _fwd_loop_seconds(body, 20, params, x)
    return {"config": "5:vit-l16-384-rollout", "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(B / dt, 1)}


def bench_6():
    """ViT-B/16 @224 batch-256 inference with ToMe token merging, two
    operating points vs bench_3's full-token number:

    - r=13 constant (Bolya 2023 runs ViT-B at r=13-16): block l runs on
      197 - 13l tokens (last block 41), ~45% fewer encoder FLOPs.
    - schedule (35, 34): merge to exactly 128 tokens by block 2, then ten
      full blocks at 128 — every T x T attention tile lane-exact, and it
      RETAINS 128 final tokens vs r=13's 41 (gentler on accuracy).

    Round-3 chip history: composed ToMe was a net LOSS (2656 -> 3082 with
    the fused-MLP/einsum fixes, vs 3879 full-token). The fused ToMe
    attention kernel (per-key log-size bias + merge metric in-kernel,
    vitx/kernels/mha_block.py::_kernel_tome) turned it into a win: r=13
    4871 img/s, sched(35,34) 5509 img/s. Compile note: the unrolled
    per-block shapes make the FIRST compile minutes through the
    remote-compile tunnel; cached after."""
    x = _images(jax.random.PRNGKey(1), 256, 224)
    out = {"config": "6:vit-b16-infer-256-tome"}
    for tag, r in (("r13", 13), ("sched_35_34", (35, 34))):
        cfg = get_config("base16", tome_r=r)
        params = init_params(jax.random.PRNGKey(0), cfg)

        def body(acc, params, x, cfg=cfg):
            return acc + jnp.mean(forward(params, x * _scl(acc), cfg))

        dt = _fwd_loop_seconds(body, 20, params, x)
        out[f"{tag}_step_ms"] = round(dt * 1e3, 2)
        out[f"{tag}_images_per_sec"] = round(256 / dt, 1)
    return out


def bench_7():
    """Serving latency: ViT-B/16 @224 at request-sized batches (1/4/8)
    through the predict program (forward + softmax + top-k). Device
    latency only (the HTTP/batching layers add host time; see
    test_serve.py's soak for those). iters=50 per the round-3 timing rule
    (sub-5ms bodies need >=50-iter device loops on the tunnel).

    History: this bench used to race a resident-int8 runtime encoder
    against the float path. Chip verdict, twice over: int8 LOSES at every
    reachable shape — ViT-B b1/4/8 0.98/2.65/4.80 ms vs 0.88/1.59/2.67
    float (round 3), and even ViT-L/16@384 — the most weight-bound config
    this framework builds — b1/2/4 6.63/11.45/24.26 ms vs 4.03/6.72/11.72
    float (round 4). The float path's fused MHA/MLP kernels fuse the
    LN/bias/act seams the int8 path paid separately, and no vitx config
    is HBM-capacity-bound, so the runtime was retired in round 4
    (VERDICT r3 item 9); int8 .quant.npz ARTIFACTS (4x smaller on disk,
    dequantized to float at load) remain the deployment form."""
    cfg = get_config("base16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    out = {"config": "7:vit-b16-serving-latency"}

    def body_float(acc, p, x):
        lg = forward(p, x * _scl(acc), cfg)
        v, _ = jax.lax.top_k(jax.nn.softmax(lg.astype(jnp.float32)), 5)
        return acc + jnp.mean(v)

    for b in (1, 4, 8):
        x = _images(jax.random.PRNGKey(b), b, 224)
        out[f"float_b{b}_ms"] = round(
            _fwd_loop_seconds(body_float, 50, params, x) * 1e3, 3)
    return out


def bench_8():
    """ViT-L/16 @384 batch-32 inference with ToMe — the ToMe paper's
    flagship scale (Bolya 2023 Table 1 uses ViT-L). Two operating points vs
    the 374.6 img/s full-token forward (chip, round 3):

    - r=23 constant (the paper's ViT-L rate; depth 24 -> final 25 tokens):
      chunked ToMe kernel (32M scoped vmem) at T=577..416, full kernel
      below; 604.9 img/s (the composed path measured 307.7 — a LOSS).
    - schedule (65, 64 x6): merge to exactly 128 tokens by block 7, then
      seventeen lane-exact blocks; retains 128 final tokens; 1017.5 img/s.
    """
    x = _images(jax.random.PRNGKey(1), 32, 384)
    out = {"config": "8:vit-l16-384-infer-32-tome"}
    for tag, r in (("r23", 23),
                   ("sched_to128", (65, 64, 64, 64, 64, 64, 64))):
        cfg = get_config("large16_384", tome_r=r)
        params = init_params(jax.random.PRNGKey(0), cfg)

        def body(acc, params, x, cfg=cfg):
            return acc + jnp.mean(forward(params, x * _scl(acc), cfg))

        dt = _fwd_loop_seconds(body, 10, params, x)
        out[f"{tag}_step_ms"] = round(dt * 1e3, 2)
        out[f"{tag}_images_per_sec"] = round(32 / dt, 1)
    return out


def bench_9():
    """ViT-B/16 @224 batch-128 TRAIN with patch dropout (FLIP / PatchDropout,
    ``--patch-drop``) vs bench_4's full-token step. Each sample keeps a
    random static-count subset of its 196 patch tokens (T: 197 -> 148 at
    p=0.25 / 99 at p=0.5), cutting encoder train FLOPs ~linearly and
    attention quadratically — the training-side counterpart of bench_6/8's
    inference-side ToMe. Same mesh/sharding-pinning methodology as bench_4;
    rng is live (the subset changes per step like real training)."""
    from jax.sharding import NamedSharding, PartitionSpec as _P

    from vitx.parallel.sharded import state_sharding

    n = len(jax.devices())
    mesh = make_mesh(dp=n, tp=1)
    opt = make_optimizer(lr=1e-4)
    B = 128 * n
    batch = shard_batch(
        {"image": _images(jax.random.PRNGKey(1), B, 224),
         "label": jnp.zeros((B,), jnp.int32)}, mesh)
    out = {"config": f"9:vit-b16-train-128-patchdrop-dp{n}"}
    for tag, pdrop in (("p25", 0.25), ("p50", 0.5)):
        cfg = get_config("base16", patch_drop=pdrop)
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        shardings = state_sharding(state, cfg, mesh)
        state = place_state(state, cfg, mesh)
        dt = _train_scan_seconds(
            cfg, opt, state, batch, rng=jax.random.PRNGKey(7),
            out_shardings=(shardings, NamedSharding(mesh, _P())))
        out[f"{tag}_step_ms"] = round(dt * 1e3, 2)
        out[f"{tag}_images_per_sec"] = round(B / dt, 1)
    return out


def bench_10():
    """Soft-MoE ViT-B (vitx/nn/moe.py, Puigcerver 2023): 8 experts over the
    last 6 blocks — ~3.3x the dense encoder's parameters at near-constant
    per-token FLOPs (total slots ~= seq_len). Inference b256 on bench_3's
    methodology + train b128 on bench_4's; the headline property is
    throughput CLOSE TO DENSE at Nx params (the MoE layer is five static
    einsums — it stays matmul-bound on the MXU)."""
    from jax.sharding import NamedSharding, PartitionSpec as _P

    from vitx.nn.vit import param_count
    from vitx.parallel.sharded import state_sharding

    cfg = get_config("base16", moe_experts=8, moe_blocks=6)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _images(jax.random.PRNGKey(1), 256, 224)

    def body(acc, params, x):
        return acc + jnp.mean(forward(params, x * _scl(acc), cfg))

    dt_f = _fwd_loop_seconds(body, 20, params, x)
    out = {"config": "10:vit-b16-softmoe-e8x6",
           "params_millions": round(param_count(params) / 1e6, 1),
           "infer_step_ms": round(dt_f * 1e3, 2),
           "infer_images_per_sec": round(256 / dt_f, 1)}
    del params

    n = len(jax.devices())
    mesh = make_mesh(dp=n, tp=1)
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    shardings = state_sharding(state, cfg, mesh)
    state = place_state(state, cfg, mesh)
    B = 128 * n
    batch = shard_batch(
        {"image": _images(jax.random.PRNGKey(1), B, 224),
         "label": jnp.zeros((B,), jnp.int32)}, mesh)
    dt_t = _train_scan_seconds(
        cfg, opt, state, batch,
        out_shardings=(shardings, NamedSharding(mesh, _P())))
    out["train_step_ms"] = round(dt_t * 1e3, 2)
    out["train_images_per_sec"] = round(B / dt_t, 1)
    return out


def _e2e_dataset_dirs(n_images=5120, classes=4, src_size=256, out_size=224):
    """Build (once, cached under <repo>/.bench_data) the on-disk datasets the
    end-to-end pipeline bench feeds from:

    - ``jpeg/``: class-foldered 256x256 quality-87 JPEGs (the reference's
      input form, src/BrainTumorDataset.py — per-file open + PIL decode).
    - ``raw224/``: the same images packed as pre-decoded uint8 tar shards at
      224 (vitx.cli.pack --format raw) — the production input form.
    """
    import pathlib

    from PIL import Image

    from vitx.data.folder import FolderDataset
    from vitx.data.shards import write_shards
    from vitx.data.synthetic import SyntheticDataset

    root = pathlib.Path(__file__).parents[2] / ".bench_data" / \
        f"e2e_{n_images}_{src_size}_{out_size}"
    jpeg, raw = root / "jpeg", root / "raw224"
    done = root / ".done"
    if not done.exists():
        # crash-safe rebuild: a killed previous build leaves partial
        # JPEG trees / raw shards that write_shards rightly refuses —
        # clear and restart rather than wedging every future run
        import shutil

        if root.exists():
            shutil.rmtree(root)
        src = SyntheticDataset(num_examples=n_images, image_size=src_size,
                               num_classes=classes, seed=0, noise=0.06)
        for i in range(n_images):
            img, label = src.get_example(i)
            d = jpeg / f"class_{label}"
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(img).save(d / f"{i:06d}.jpg", quality=87)
        write_shards(FolderDataset(jpeg, test_size=None, image_size=out_size),
                     raw, shard_size=1024, image_format="raw")
        done.touch()
    return jpeg, raw


def bench_11():
    """END-TO-END input pipeline (VERDICT r3 item 1): real data flowing
    disk -> BatchLoader -> device_prefetch -> device preprocess -> step, vs
    the device-resident synthetic batches every other bench feeds.

    Three loader-fed measurements at ViT-B/16 shapes on the real chip:
    - train b128 (bench_4's config) through the actual Trainer epoch loop,
    - batched inference b256 (bench_3's config) through device_prefetch,
    each from BOTH disk forms (JPEG folder / raw uint8 shards), plus
    host-only loader throughput (no device) for the decode-ceiling number.

    Context that makes the numbers interpretable (all chip-measured, round
    4). Two independent ceilings sit between disk and the 1161 img/s
    synthetic-fed train step:

    1. HOST DECODE (the framework-addressable one). This host has ONE core.
       JPEG decode+resize: loader measures ~316 img/s — JPEG cannot feed
       the step on one core. Raw uint8 shards (vitx.cli.pack --format raw)
       measure ~2253 img/s through the same BatchLoader — 1.9x the required
       rate, ON ONE CORE, and thread-scalable on real hosts (PIL-free
       path). This is the decode-ceiling fix, demonstrated.
    2. TUNNEL H2D (an environment artifact, not a framework property). The
       axon tunnel's true host->device bandwidth, measured with a forced
       data dependency (``h2d_mb_s`` below; plain block_until_ready LIES on
       this backend and suggests 1.4 GB/s), is ~16-40 MB/s + ~60 ms fixed
       latency. A b128@224 uint8 batch is 19.3 MB -> ~0.7 s/transfer, so
       NO loader can push past ~190-280 img/s end to end here. A real TPU
       host feeds chips over PCIe/DMA at >10 GB/s — 150 KB/img would
       sustain >60k img/s; the loader-side 2253 img/s (and its core-count
       scaling) is the number that transfers to production.

    The e2e rows below are therefore tunnel-bound by (2); the loader rows
    prove (1) is solved. The reference hides decode cost behind 4-16
    DataLoader worker PROCESSES (src/train.py:161-162) — same fix, more
    cores; its 370 img/s record never faced (2) because its GPU was local."""
    import os

    from vitx.data.folder import FolderDataset
    from vitx.data.loader import BatchLoader
    from vitx.data.pipeline import device_prefetch, make_preprocess
    from vitx.data.shards import ShardDataset
    from vitx.train.loop import Trainer, TrainerConfig

    jpeg_dir, raw_dir = _e2e_dataset_dirs()
    out = {"config": "11:e2e-input-pipeline", "host_cpus": os.cpu_count()}

    # --- true H2D bandwidth probe (forced-dependency methodology: a
    # device-put batch is not actually resident on this backend until a
    # computation consumes it — sum + scalar fetch forces the transfer) ---
    arrs = [np.random.default_rng(i).integers(0, 255, (128, 224, 224, 3))
            .astype(np.uint8) for i in range(3)]
    x = jax.device_put(arrs[0])
    float(jnp.sum(x.astype(jnp.float32)))          # warm
    best = float("inf")
    for a in arrs:
        t0 = time.perf_counter()
        x = jax.device_put(a)
        float(jnp.sum(x.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    out["h2d_mb_s"] = round(arrs[0].nbytes / best / 1e6, 1)
    out["h2d_img_s_cap_b128_224"] = round(128 / best, 1)

    ds_jpeg = FolderDataset(jpeg_dir, test_size=None, image_size=224)
    ds_raw = ShardDataset(raw_dir, test_size=None)
    n = len(ds_jpeg)

    # --- host-only loader throughput (decode ceiling, no device) ---
    for tag, ds in (("jpeg", ds_jpeg), ("raw", ds_raw)):
        loader = BatchLoader(ds, 128, shuffle=True, drop_last=True,
                             num_threads=8)
        for b in loader:          # first epoch touches the page cache
            pass
        t0 = time.perf_counter()
        cnt = 0
        for b in loader:
            cnt += b["image"].shape[0]
        dt = time.perf_counter() - t0
        out[f"loader_{tag}_img_s"] = round(cnt / dt, 1)

    # --- end-to-end train: the real Trainer epoch (epoch 0 = compile+warm,
    # epoch 1 = measured), device-side normalize/flip preprocess ---
    cfg = get_config("base16", num_classes=4)
    pre = make_preprocess(out_size=None, random_flip=True)
    for tag, ds in (("raw", ds_raw), ("jpeg", ds_jpeg)):
        loader = BatchLoader(ds, 128, shuffle=True, drop_last=True,
                             num_threads=8)
        tr = Trainer(cfg, TrainerConfig(epochs=2, log_every=10**9),
                     preprocess=pre)
        tr._train_epoch(loader, 0, None)
        stats = tr._train_epoch(loader, 1, None)
        out[f"train_e2e_{tag}_img_s"] = round(stats["images_per_sec"], 1)
        del tr

    # --- end-to-end batched inference b256 through device_prefetch ---
    params = init_params(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(partial(forward, cfg=cfg))

    def run_infer(ds):
        loader = BatchLoader(ds, 256, drop_last=True, num_threads=8)
        acc = None
        t0 = time.perf_counter()
        cnt = 0
        for b in device_prefetch(iter(loader), size=2):
            x = pre(b["image"], None, train=False).astype(cfg.cdtype())
            acc = fwd(params, x)
            cnt += 256
        acc.block_until_ready()
        _sync(acc)
        return cnt / (time.perf_counter() - t0)

    for tag, ds in (("raw", ds_raw), ("jpeg", ds_jpeg)):
        run_infer(ds)                        # compile + warm
        out[f"infer_e2e_{tag}_img_s"] = round(run_infer(ds), 1)

    out["n_images"] = n
    return out


def bench_12():
    """ViT-B/16 @224 batch-128 TRAIN with training-time ToMe
    (cfg.tome_train, Bolya 2023 §4) vs bench_4's 1161 img/s full-token step
    and bench_9's patch-dropout operating points (1509 / 2253 img/s at
    p=0.25/0.5). Same single-device scan methodology as the root bench.py
    train number. Two operating points mirroring bench_6:

    - r=13 constant (the paper's ViT-B rate; last block runs 54 tokens),
    - schedule (35, 34) -> 128 tokens by block 2, lane-exact after.

    Unlike patch dropout (random subset, inference unchanged), ToMe-train
    merges by similarity with deterministic semantics shared with the
    eval-time ToMe path — train with it, serve with it, no distribution
    shift between the two. Compile note: unrolled per-block shapes ->
    first compile is minutes through the remote-compile tunnel; cached.

    Chip-measured (v5e-1, round 4): r13 111.1 ms / 1152 img/s — a WASH vs
    full-token (the bwd runs the composed VJP and the odd token counts pad
    to 128 lanes; same physics as round 3's inference story) — while the
    lane-aligned schedule measures 90.6 ms / 1413 img/s, +22% over
    bench_4. Patch dropout stays faster (2253 at p=0.5) but trains a
    different distribution than it serves; ToMe-train at `to128` keeps
    train == serve."""
    opt = make_optimizer(lr=1e-4)
    B = 128
    batch = {"image": _images(jax.random.PRNGKey(1), B, 224),
             "label": jnp.zeros((B,), jnp.int32)}
    out = {"config": "12:vit-b16-train-128-tome-train"}
    for tag, r in (("r13", 13), ("sched_35_34", (35, 34))):
        cfg = get_config("base16", tome_r=r, tome_train=True)
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        dt = _train_scan_seconds(cfg, opt, state, batch,
                                 rng=jax.random.PRNGKey(7))
        out[f"{tag}_step_ms"] = round(dt * 1e3, 2)
        out[f"{tag}_images_per_sec"] = round(B / dt, 1)
    return out


def bench_13():
    """ViT-Huge/14 (`huge14` preset, 642M params — E=1280/depth=32 with
    the TPU-native 10xD=128 head partition; the paper's 16xD=80 is not
    32-aligned): single-chip inference b32 + train b8.

    Chip record (round 4): infer 70.7 ms / 452.9 img/s = 151.5 TF/s (77%
    of the 197 TF/s peak — the D=128 lane-fill efficiency holding at 7x
    ViT-B's params); train b8 117.5 ms (single-chip 642M train is
    AdamW-HBM- and batch-limited — scale out with dp x (zero3 | pp),
    which dryrun_multichip exercises)."""
    cfg = get_config("huge14")
    params = init_params(jax.random.PRNGKey(0), cfg)
    out = {"config": "13:vit-h14", "params_millions": 642.3}
    B = 32
    x = _images(jax.random.PRNGKey(1), B, 224)

    def body(acc, params, x):
        return acc + jnp.mean(forward(params, x * _scl(acc), cfg))

    dt = _fwd_loop_seconds(body, 10, params, x)
    out["infer_b32_ms"] = round(dt * 1e3, 2)
    out["infer_images_per_sec"] = round(B / dt, 1)
    del params

    Bt = 8
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(2), cfg, opt)
    batch = {"image": _images(jax.random.PRNGKey(3), Bt, 224),
             "label": jnp.zeros((Bt,), jnp.int32)}
    dt_t = _train_scan_seconds(cfg, opt, state, batch, iters=5)
    out["train_b8_step_ms"] = round(dt_t * 1e3, 2)
    out["train_images_per_sec"] = round(Bt / dt_t, 1)
    return out


def bench_14():
    """Itemize the config-4 train step's REMAINDER (VERDICT r4 item 5):
    the ~10 ms of the 110.9 ms ViT-B/16 b128 D=64 step that the round-4
    roofline table left as one "patchify + head + LN seams" row. Each row
    here is an isolated fwd+bwd devloop next to its own roofline:

    - LN seams: the 2x add_layer_norm per block (fused residual+LN custom
      VJP) — HBM-bound; roofline from (B, T, E) bf16 pass counts at
      800 GB/s (fwd reads x+pending, writes sum+normed ~4 passes; bwd ~5).
    - patchify/embed: space-to-depth matmul + CLS/pos fwd+bwd.
    - head+loss: reference head (E->4E->LN->C) + softmax CE fwd+bwd.
    AdamW carries its round-3 isolated measurement (3.57 ms, 1.12x of the
    2.55 GB / 800 GB/s roofline; the in-step 4.78 ms includes anti-hoist
    buffering of the schedule constants)."""
    from vitx.nn.layers import add_layer_norm
    from vitx.nn.vit import embed_tokens
    from vitx.train.step import cross_entropy_loss

    cfg = get_config("base16")
    B, T, E = 128, cfg.seq_len, cfg.embed_dim
    out = {"config": "14:train-step-remainder-itemization"}
    HBM = 800e9

    # --- LN seam: one fused add_layer_norm fwd+bwd at step shapes
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, E), jnp.bfloat16)
    pend = jax.random.normal(jax.random.PRNGKey(1), (B, T, E), jnp.bfloat16)
    g = jnp.ones((E,), jnp.float32)
    bb = jnp.zeros((E,), jnp.float32)

    def ln_body(acc, x, pend, g, bb):
        def f(x, pend, g, bb):
            s, y = add_layer_norm(x, pend, g, bb, eps=1e-6)
            return jnp.sum(y.astype(jnp.float32)) + \
                jnp.sum(s.astype(jnp.float32))
        v, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
            x * _scl(acc), pend, g, bb)
        return acc + v * 0 + sum(jnp.sum(gr).astype(jnp.float32)
                                 for gr in grads) * 1e-20
    dt_ln = _fwd_loop_seconds(ln_body, 50, x, pend, g, bb)
    bytes_ln = (B * T * E * 2) * (4 + 5)   # fwd ~4 passes + bwd ~5 passes
    out["ln_seam_fwdbwd_ms"] = round(dt_ln * 1e3, 3)
    out["ln_seam_roofline_ms"] = round(bytes_ln / HBM * 1e3, 3)
    out["ln_seam_per_step_ms"] = round(dt_ln * 1e3 * 2 * cfg.depth, 2)

    # --- patchify/embed fwd+bwd
    params = init_params(jax.random.PRNGKey(2), cfg)
    imgs = _images(jax.random.PRNGKey(3), B, 224)

    def emb_body(acc, params, imgs):
        def f(p):
            t = embed_tokens(p, imgs * _scl(acc), cfg)
            return jnp.sum(t.astype(jnp.float32))
        v, gr = jax.value_and_grad(f)(params)
        return acc + v * 0 + sum(
            jnp.sum(le).astype(jnp.float32)
            for le in jax.tree.leaves(gr)) * 1e-20
    dt_emb = _fwd_loop_seconds(emb_body, 50, params, imgs)
    # 3x the fwd patch-matmul FLOPs (dgrad+wgrad) at the measured
    # (B*N, 768)-class ceiling ~150 TF/s
    fl_emb = 3 * 2 * B * cfg.num_patches * E * (cfg.patch_size ** 2 * 3)
    out["patchify_fwdbwd_ms"] = round(dt_emb * 1e3, 3)
    out["patchify_roofline_ms"] = round(fl_emb / 150e12 * 1e3, 3)

    # --- head + loss fwd+bwd (tokens held constant)
    toks = jax.random.normal(jax.random.PRNGKey(4), (B, T, E), jnp.bfloat16)
    labels = jnp.zeros((B,), jnp.int32)

    def head_body(acc, params, toks, labels):
        from vitx.nn.vit import classify

        def f(p):
            logits = classify(p, toks * _scl(acc), cfg)
            return cross_entropy_loss(logits, labels)
        v, gr = jax.value_and_grad(f)(params)
        return acc + v * 0 + sum(
            jnp.sum(le).astype(jnp.float32)
            for le in jax.tree.leaves(gr)) * 1e-20
    dt_head = _fwd_loop_seconds(head_body, 50, params, toks, labels)
    out["head_loss_fwdbwd_ms"] = round(dt_head * 1e3, 3)

    # --- the full step, measured here so the accounting is self-contained
    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(5), cfg, opt)
    batch = {"image": imgs, "label": labels}
    dt_step = _train_scan_seconds(cfg, opt, state, batch, iters=10)
    out["full_step_ms"] = round(dt_step * 1e3, 1)

    # --- the accounting. The ISOLATED LN number above is ~2x its roofline
    # because isolation un-fuses it (in the step, the residual add fuses
    # into the next LN read and the LN-bwd into matmul epilogues). The
    # honest in-step seam cost is the closure of the budget:
    #   step - (round-4 matmul/flash/AdamW table) - patchify - head
    # and its roofline is 24 LN-pair passes at 800 GB/s.
    comp = 12 * (1.591 + 2.280 + 4.012) + 4.78      # round-4 table, ms
    seam = dt_step * 1e3 - comp - out["patchify_fwdbwd_ms"] \
        - out["head_loss_fwdbwd_ms"]
    out["component_table_ms"] = round(comp, 1)
    out["ln_seams_in_step_ms"] = round(seam, 2)
    out["ln_seams_in_step_per_pair_ms"] = round(seam / (2 * cfg.depth), 3)
    out["ln_seams_roofline_ratio"] = round(
        seam / (2 * cfg.depth) / out["ln_seam_roofline_ms"], 2)
    return out


BENCHES = {1: bench_1, 2: bench_2, 3: bench_3, 4: bench_4, 5: bench_5,
           6: bench_6, 7: bench_7, 8: bench_8, 9: bench_9, 10: bench_10,
           11: bench_11, 12: bench_12, 13: bench_13, 14: bench_14}


def main(argv=None):
    p = argparse.ArgumentParser(prog="vitx.bench")
    p.add_argument("--config", default="all",
                   help="benchmark number 1-9 or 'all'")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="also capture a jax.profiler trace of each bench "
                        "into DIR (open with xprof/tensorboard-profile)")
    args = p.parse_args(argv)
    enable_persistent_cache()
    which = (sorted(BENCHES) if args.config == "all"
             else [int(args.config)])
    for i in which:
        if args.profile:
            with jax.profiler.trace(f"{args.profile}/bench_{i}"):
                res = BENCHES[i]()
            res["trace_dir"] = f"{args.profile}/bench_{i}"
        else:
            res = BENCHES[i]()
        print(json.dumps(res))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
