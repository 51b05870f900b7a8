"""Benchmark: ViT-B/16 @224 images/sec/chip (BASELINE.json headline metric).

Measures batched inference (batch 256, bf16, fused patch-embed + Pallas flash
attention — BASELINE.json config 3) and the full training step
(fwd+bwd+AdamW, batch 128). Prints ONE JSON line.

``--components`` instead runs the per-component microbench (kernels,
patchify, MLP, train-step remat variants) and writes BENCH_components.json
next to this file — diff it across rounds to catch perf regressions
mechanically.

vs_baseline is against the reference's only empirical record: ~372.5
images/sec on its author's CUDA GPU (src/vit.ipynb cell 28; BASELINE.md).
"""

import json
import pathlib
import sys
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
    best = float("inf")
    for _ in range(3):               # min-of-3: per-dispatch tunnel jitter
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _flops_per_image(cfg):
    """Analytic forward FLOPs/image (2*MACs) for MFU accounting.

    Counts the matmul terms only (patchify, QKV/proj, QK^T+PV, MLP, head) —
    elementwise work is noise at these shapes. ViT-B/16 @224 evaluates to
    ~36.6 GFLOPs fwd (the widely quoted 17.6 G is MACs, see ROADMAP.md)."""
    T, E, L = cfg.seq_len, cfg.embed_dim, cfg.depth
    M = cfg.mlp_ratio * E
    patch = 2 * cfg.num_patches * E * (cfg.patch_size ** 2 * 3)
    qkvproj = 2 * T * E * 3 * E + 2 * T * E * E
    attn = 2 * 2 * T * T * E
    mlp = 2 * 2 * T * E * M
    if cfg.head_type == "reference":
        # Linear(E,4E) -> GELU -> LN -> Linear(4E,C) (reference vit.py:69-74)
        head = 2 * E * 4 * E + 2 * 4 * E * cfg.num_classes
    elif cfg.head_type == "map":
        # probe cross-attention (k/v over T tokens, q/o on the 1-token
        # probe) + MLP residual + LN->Linear
        head = (2 * T * E * E * 2 + 2 * E * E * 2 + 2 * 2 * T * E
                + 2 * 2 * E * M + 2 * E * cfg.num_classes)
    else:
        # "standard": LN -> Linear(E, C) (the default presets)
        head = 2 * E * cfg.num_classes
    return patch + L * (qkvproj + attn + mlp) + head


PEAK_TFLOPS = 197.0          # v5e bf16 peak per chip (2 MXUs)


def _train_step_ms(cfg, B=128, iters=10):
    """Steady-state train-step time via a scanned, donated 10-step dispatch."""
    from functools import partial as _partial

    from vitx.train import create_train_state
    from vitx.train.step import make_optimizer, train_step as _train_step

    opt = make_optimizer(lr=1e-4)
    state = create_train_state(jax.random.PRNGKey(2), cfg, opt)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3),
                                   (B, cfg.image_size, cfg.image_size, 3),
                                   jnp.bfloat16),
        "label": jax.random.randint(jax.random.PRNGKey(4), (B,), 0,
                                    cfg.num_classes),
    }
    raw_step = _partial(_train_step, cfg=cfg, optimizer=opt)

    def scan_steps(state, batch, srng):
        def body(st, _):
            st, metrics = raw_step(st, batch, srng)
            return st, metrics["loss"]
        return jax.lax.scan(body, state, None, length=iters)

    scan_jit = jax.jit(scan_steps, donate_argnums=(0,))
    state, losses = scan_jit(state, batch, jax.random.PRNGKey(5))
    _sync(losses)
    t0 = time.perf_counter()
    state, losses = scan_jit(state, batch, jax.random.PRNGKey(5))
    _sync(losses)
    return (time.perf_counter() - t0) / iters * 1e3


def components():
    """Per-component microbench at ViT-B/16 b128 shapes -> JSON file.

    iters=50 on the sub-5ms kernel bodies (round-3 timing rule: at
    iters=10 the per-dispatch tunnel jitter inflates them ~3x — the
    round-3/early-round-4 BENCH_components kernel rows carry exactly
    that inflation; train_step rows were always fine)."""
    enable_persistent_cache()
    import numpy as np

    from vitx import get_config
    from vitx.kernels.flash_attention import flash_attention

    B, H, T, D, E = 128, 12, 197, 64, 768
    M = 4 * E
    res = {}
    k0 = jax.random.PRNGKey(0)
    ks = jax.random.split(k0, 8)

    def fold(acc, x):
        return (jnp.bfloat16(1)
                + jnp.bfloat16(1e-9) * acc.astype(jnp.bfloat16)) * x

    # --- attention kernels (q,k,v in the kernel-native (B,H,T,D) planes) ---
    q = jax.random.normal(ks[0], (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, T, D), jnp.bfloat16)

    def attn_fwd(acc, q, k, v):
        return acc + jnp.mean(flash_attention(fold(acc, q), k, v))\
            .astype(jnp.float32)

    res["attn_fwd_ms"] = _devloop_seconds(attn_fwd, 50, q, k, v) * 1e3

    def attn_fwdbwd(acc, q, k, v):
        g = jax.grad(lambda qq: jnp.sum(
            flash_attention(qq, k, v).astype(jnp.float32)))(fold(acc, q))
        return acc + jnp.mean(g).astype(jnp.float32)

    res["attn_fwdbwd_ms"] = _devloop_seconds(attn_fwdbwd, 50, q, k, v) * 1e3

    def xla_attn(acc, q, k, v):
        from vitx.nn.attention import reference_attention
        o, _ = reference_attention(fold(acc, q), k, v)
        return acc + jnp.mean(o).astype(jnp.float32)

    res["attn_fwd_xla_ms"] = _devloop_seconds(xla_attn, 50, q, k, v) * 1e3

    # --- projection / MLP matmuls at encoder shapes ---
    x = jax.random.normal(ks[3], (B, T, E), jnp.bfloat16)
    wqkv = jax.random.normal(ks[4], (E, 3, H, D), jnp.bfloat16)
    w1 = jax.random.normal(ks[5], (E, M), jnp.bfloat16)
    w2 = jax.random.normal(ks[6], (M, E), jnp.bfloat16)

    def qkv_proj(acc, x, wqkv):
        o = jnp.einsum("bte,eshd->sbhtd", fold(acc, x), wqkv,
                       preferred_element_type=jnp.float32)
        return acc + jnp.mean(o.astype(jnp.float32))

    res["qkv_proj_ms"] = _devloop_seconds(qkv_proj, 50, x, wqkv) * 1e3

    def mlp_body(acc, x, w1, w2):
        h = jnp.einsum("bte,em->btm", fold(acc, x), w1,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        h = jax.nn.gelu(h)
        o = jnp.einsum("btm,me->bte", h, w2,
                       preferred_element_type=jnp.float32)
        return acc + jnp.mean(o.astype(jnp.float32))

    res["mlp_ms"] = _devloop_seconds(mlp_body, 50, x, w1, w2) * 1e3

    # --- patchify at batch 128 ---
    from vitx import init_params
    cfg = get_config("base16")
    params = init_params(jax.random.PRNGKey(7), cfg)
    images = jax.random.normal(ks[7], (B, 224, 224, 3), jnp.bfloat16)

    def patch_body(acc, params, images):
        from vitx.nn.vit import patch_embed
        t = patch_embed(params, fold(acc, images), cfg)
        return acc + jnp.mean(t.astype(jnp.float32))

    res["patchify_ms"] = _devloop_seconds(patch_body, 50, params, images) * 1e3

    # --- train-step variants ---
    for remat in ("block", "dots", "none"):
        try:
            res[f"train_step_remat_{remat}_ms"] = round(
                _train_step_ms(get_config("base16", remat=remat)), 2)
        except Exception as e:   # OOM etc: record, don't die
            res[f"train_step_remat_{remat}_ms"] = f"failed: {type(e).__name__}"

    res = {kk: (round(vv, 3) if isinstance(vv, float) else vv)
           for kk, vv in res.items()}
    out = pathlib.Path(__file__).parent / "BENCH_components.json"
    out.write_text(json.dumps(res, indent=2) + "\n")
    print(json.dumps(res))


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
    best = float("inf")
    for _ in range(3):               # min-of-3: per-dispatch tunnel jitter
        t0 = time.perf_counter()
        state, losses = scan_jit(state, batch, srng)
        _sync(losses)
        best = min(best, time.perf_counter() - t0)
    train_ips = B_tr * 10 / best
    del step

    # --- MFU: achieved matmul TF/s over the chip's 197 TF/s bf16 peak ---
    fl = _flops_per_image(cfg_train)
    mfu_infer = fl * infer_ips / (PEAK_TFLOPS * 1e12)
    mfu_train = 3 * fl * train_ips / (PEAK_TFLOPS * 1e12)  # fwd+bwd ~ 3x fwd

    baseline_ips = 372.5               # reference GPU record, BASELINE.md
    result = {
        "metric": "ViT-B/16 @224 images/sec/chip (batch-256 bf16 inference, "
                  "flash-attn; train fwd+bwd+AdamW batch 128)",
        "value": round(infer_ips, 1),
        "unit": "images/sec",
        # Comparison basis (VERDICT r3 item 7): the reference's ONLY record
        # is ~372.5 img/s *training* an E=8/8-head/8-block toy on its
        # author's CUDA GPU (BASELINE.md). Nothing it published matches our
        # configs, so both ratios are labeled for what they are: vitx
        # ViT-B/16 (86M params) inference and train vs that toy-train rate.
        "vs_baseline": round(infer_ips / baseline_ips, 2),
        "vs_baseline_basis": "vitx ViT-B/16 b256 bf16 INFERENCE vs "
                             "reference E=8-toy GPU TRAIN (372.5 img/s, its "
                             "only published number)",
        "train_vs_baseline": round(train_ips / baseline_ips, 2),
        "train_images_per_sec": round(train_ips, 1),
        "infer_step_ms": round(dt_inf * 1e3, 2),
        "mfu_train": round(mfu_train, 3),
        "mfu_train_flop_basis": "3x analytic fwd FLOPs (fwd+bwd "
                                "convention), not counted bwd FLOPs",
        "mfu_infer": round(mfu_infer, 3),
        "peak_tflops_basis": PEAK_TFLOPS,
    }

    # --- driver-corroborated per-config rows (VERDICT r3 item 8): fold the
    # small-body configs 1/2/5/6 into the driver-run artifact so BENCH_r*
    # pins them, not just the builder-side BENCH_configs.jsonl. Each is
    # guarded: a failure records the error instead of killing the headline.
    if "--headline-only" not in sys.argv:
        from vitx.cli import bench as cfg_bench

        for i in (1, 2, 5, 6):
            try:
                row = cfg_bench.BENCHES[i]()
                row.pop("config", None)
                result[f"config_{i}"] = row
            except Exception as e:   # noqa: BLE001 — record, don't die
                result[f"config_{i}"] = f"failed: {type(e).__name__}: {e}"

        # base16_hd128 (H=6, D=128 — same params/FLOPs): the lane-fill
        # geometry variant; filled MXU lanes in every per-head attention
        # matmul buy ~+12% train / +6% infer over D=64 (ROADMAP round 4)
        try:
            cfg_hd = get_config("base16_hd128")
            params_hd = init_params(jax.random.PRNGKey(0), cfg_hd)
            dt_hd = _devloop_seconds(
                lambda acc, p, im: acc + jnp.mean(forward(
                    p, im * (jnp.bfloat16(1) + jnp.bfloat16(1e-9)
                             * acc.astype(jnp.bfloat16)), cfg_hd)),
                10, params_hd, images)
            result["config_hd128"] = {
                "infer_images_per_sec": round(B_inf / dt_hd, 1),
                "train_step_ms": round(_train_step_ms(cfg_hd), 2),
            }
            result["config_hd128"]["train_images_per_sec"] = round(
                128e3 / result["config_hd128"]["train_step_ms"], 1)
        except Exception as e:   # noqa: BLE001
            result["config_hd128"] = f"failed: {type(e).__name__}: {e}"

    print(json.dumps(result))


if __name__ == "__main__":
    if "--components" in sys.argv:
        components()
    else:
        main()
