"""ToMe token merging (vitx/nn/tome.py, Bolya et al. 2023)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.nn.tome import encode_tome, merge_tokens
from vitx.nn.vit import forward, init_params

CFG = ViTConfig(image_size=32, patch_size=4, num_classes=4, embed_dim=32,
                depth=3, num_heads=2, compute_dtype="float32")   # 64 patches


def test_merge_tokens_conserves_token_mass():
    """sizes track how many originals each token stands for — the total
    must be conserved, protected rows untouched, T shrinks by exactly r."""
    B, T, E, r = 2, 13, 8, 3          # 1 prefix + 10 patches + 2 registers
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, E))
    metric = jax.random.normal(jax.random.PRNGKey(1), (B, T, 4))
    sizes = jnp.ones((B, T))

    x2, s2 = merge_tokens(x, sizes, metric, r, n_prefix=1, n_reg=2)
    assert x2.shape == (B, T - r, E)
    assert s2.shape == (B, T - r)
    np.testing.assert_allclose(np.asarray(s2).sum(-1), T, rtol=1e-6)
    # prefix row and register tail pass through bit-exactly
    np.testing.assert_array_equal(np.asarray(x2[:, 0]), np.asarray(x[:, 0]))
    np.testing.assert_array_equal(np.asarray(x2[:, -2:]),
                                  np.asarray(x[:, -2:]))
    np.testing.assert_array_equal(np.asarray(s2[:, -2:]), 1.0)


def test_tome_is_lossless_on_identical_tokens():
    """With zeroed positional embeddings and a constant image every patch
    token is identical, so (a) merging loses nothing and (b) proportional
    attention must weight merged tokens exactly by their size — ToMe logits
    equal full-model logits."""
    cfg = CFG.replace(tome_r=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = dict(params)
    params["pos_embed"] = jnp.zeros_like(params["pos_embed"])
    x = jnp.ones((2, cfg.image_size, cfg.image_size, 3)) * 0.3

    full = forward(params, x, cfg.replace(tome_r=0))
    merged = forward(params, x, cfg)          # deterministic -> ToMe path
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_tome_keeps_trained_predictions():
    """Merging r=4/block on an overfit model keeps the argmax predictions
    (the accuracy-throughput tradeoff must be mild at small r)."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (8, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 4)}
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1

    full = forward(state.params, batch["image"], CFG)
    merged = forward(state.params, batch["image"], CFG.replace(tome_r=4))
    assert merged.shape == full.shape
    np.testing.assert_array_equal(np.argmax(np.asarray(merged), -1),
                                  np.argmax(np.asarray(full), -1))
    # the aligned-schedule variant (merge early, then constant tokens)
    # must also keep the predictions
    sched = forward(state.params, batch["image"],
                    CFG.replace(tome_r=(8, 4)))
    np.testing.assert_array_equal(np.argmax(np.asarray(sched), -1),
                                  np.argmax(np.asarray(full), -1))


def test_tome_with_registers_and_distill():
    """Layout invariant holds with a distill token and registers: both
    heads read their tokens, registers survive at the tail."""
    cfg = CFG.replace(tome_r=4, distill_token=True, num_registers=3)
    params = init_params(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    toks = encode_tome(params, x, cfg)
    assert toks.shape == (2, cfg.seq_len - cfg.depth * cfg.tome_r,
                          cfg.embed_dim)
    logits = forward(params, x, cfg)
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_tome_r_validation():
    with pytest.raises(ValueError, match="tome_r"):
        CFG.replace(tome_r=17)        # 64 patches, depth 3 -> max r = 16
    CFG.replace(tome_r=16)            # boundary is legal
    with pytest.raises(ValueError, match="tome_r"):
        ViTConfig(image_size=16, patch_size=4, tome_r=1, parity="bug_exact")


def test_cli_eval_tome(tmp_path, capsys):
    """--tome-r on the eval CLI routes the restored checkpoint through the
    merged encoder and still produces a well-formed report."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32",
                    "--tome-r", "4"])
    assert rc == 0
    import json
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["accuracy"] <= 1.0
    assert out["num_examples"] == 512


def test_tome_encoder_matches_production_path_at_r0():
    """With r=0 (no merging, sizes all 1, log-size bias 0) the unrolled
    ToMe encoder is mathematically the standard encoder — pin exact
    agreement with the scan-based production path so the two block
    implementations can't drift apart."""
    from vitx.nn.vit import encode

    cfg = CFG.replace(tome_r=0)
    params = init_params(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    ref, _ = encode(params, x, cfg, deterministic=True)
    got = encode_tome(params, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_tome_source_tracking_is_a_partition():
    """Source map invariants: every original token belongs to exactly ONE
    final token (columns are a partition), row sums equal sizes, protected
    rows keep their identity, and the grid assignment is well-formed."""
    from vitx.nn.tome import tome_patch_assignment

    cfg = CFG.replace(tome_r=8, num_registers=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))

    toks, src = encode_tome(params, x, cfg, return_sources=True)
    T0 = cfg.seq_len
    Tf = T0 - cfg.depth * cfg.tome_r
    assert toks.shape[1] == Tf and src.shape == (2, Tf, T0)
    s = np.asarray(src)
    # partition: each original token owned by exactly one final token
    np.testing.assert_array_equal(s.sum(axis=1), 1.0)
    assert set(np.unique(s)) <= {0.0, 1.0}
    # CLS (row 0) and the register tail never merge
    np.testing.assert_array_equal(s[:, 0, 0], 1.0)
    assert s[:, 0].sum() == 2.0
    np.testing.assert_array_equal(s[:, -2:, -2:].sum((1, 2)), 2.0)

    grid = np.asarray(tome_patch_assignment(src, cfg))
    g = cfg.image_size // cfg.patch_size
    assert grid.shape == (2, g, g)
    # merged map has exactly npatch - depth*r distinct owners... at most;
    # every owner index points at a real final token
    assert grid.max() < Tf and grid.min() >= 0
    n_owner = len(np.unique(grid[0]))
    assert n_owner == cfg.num_patches - cfg.depth * cfg.tome_r


def test_tome_dp_mesh_matches_single_device():
    """The ToMe encoder is plain jnp ops — under a dp mesh the merged
    forward must partition batch-parallel and reproduce the single-device
    confusion matrix exactly."""
    from vitx.parallel import make_mesh, make_parallel_eval_step, shard_batch
    from vitx.parallel.sharded import place_state
    from vitx.train.step import (create_train_state, make_eval_step,
                                 make_optimizer)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = CFG.replace(tome_r=4)
    mesh = make_mesh(dp=8, tp=1)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(7),
                                        (32, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(8), (32,), 0, 4)}

    cm_ref, loss_ref = make_eval_step(cfg)(state.params, batch)
    state_p = place_state(state, cfg, mesh)
    cm_par, loss_par = make_parallel_eval_step(cfg, mesh)(
        state_p.params, shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(cm_ref), np.asarray(cm_par))
    np.testing.assert_allclose(float(loss_ref), float(loss_par), rtol=1e-5)


def test_tome_training_uses_full_tokens():
    """tome_r is inference-only: the train step (deterministic=False) runs
    the full token set, so training a tome_r config matches training the
    plain config exactly."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (4, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (4,), 0, 4)}

    losses = []
    for cfg in (CFG, CFG.replace(tome_r=4)):
        opt = make_optimizer(lr=1e-3)
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = make_train_step(cfg, opt)
        for _ in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert losses[0] == losses[1]


def test_chunk_plan_skips_mosaic_illegal_head_chunks(monkeypatch):
    """On a real TPU backend _chunk_plan must never hand the kernel a
    PARTIAL head-chunk block whose minor dim (3*hc*D) is not
    128-divisible — Mosaic rejects such blocks at lowering (chip-caught,
    round 4: hc=1 at D=64 -> an (E, 192) block). hc == num_heads (block
    == array) is always legal."""
    import vitx.kernels.mha_block as mb

    monkeypatch.setattr(mb, "_use_interpret", lambda: False)
    # D=64, H=16 (ViT-L geometry), generous VMEM: candidates 16, 8, 4, 2
    # are legal (3*hc*64 % 128 == 0 for even hc); hc=1 must be skipped
    # even when it is the only one that fits the budget
    B, T, E, H = 1, 2048, 1024, 16
    hc, _ = mb._chunk_plan((B, T, E), H, jnp.bfloat16)
    assert hc != 1
    if hc:
        assert (3 * hc * (E // H)) % 128 == 0 or hc == H
    # tiny geometry (D=16): every partial chunk is lane-illegal -> the
    # plan may only return full-array hc or "no fit" (composed fallback)
    hc2, _ = mb._chunk_plan((2, 16, 64), 4, jnp.float32)
    assert hc2 in (0, 4)


def test_tome_train_merges_and_learns():
    """cfg.tome_train (Bolya 2023 §4): the train step runs the MERGING
    encoder — its loss differs from full-token training — gradients flow
    through the merges (the batch overfits), and eval-time semantics are
    untouched (deterministic forward == the plain eval-ToMe path)."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (4, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (4,), 0, 4)}
    cfg_t = CFG.replace(tome_r=4, tome_train=True, dropout=0.0)
    cfg_f = CFG.replace(tome_r=4, dropout=0.0)

    losses = {}
    for name, cfg in (("tome", cfg_t), ("full", cfg_f)):
        opt = make_optimizer(lr=1e-3)
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = make_train_step(cfg, opt)
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses[name] = float(m["loss"])
    # the merging encoder is a different computation from full tokens
    assert losses["tome"] != losses["full"]

    # learns: overfits the batch through the merges
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg_t, opt)
    step = make_train_step(cfg_t, opt)
    for _ in range(150):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1

    # eval path identical to a plain tome_r config at the same params
    a = forward(state.params, batch["image"], cfg_t)
    b = forward(state.params, batch["image"], cfg_f)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tome_train_stochastic_pieces_compose():
    """dropout + stochastic depth run inside the merging encoder: the
    train-mode forward is rng-dependent, the deterministic forward is not
    (and drop_path keeps expectation semantics at rate 0)."""
    cfg = CFG.replace(tome_r=4, tome_train=True, dropout=0.1,
                      drop_path=0.2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    from vitx.nn.tome import encode_tome as et

    t1 = et(params, x, cfg, rng=jax.random.PRNGKey(5), deterministic=False)
    t2 = et(params, x, cfg, rng=jax.random.PRNGKey(6), deterministic=False)
    t3 = et(params, x, cfg, rng=jax.random.PRNGKey(5), deterministic=False)
    assert float(jnp.max(jnp.abs(t1 - t2))) > 1e-6     # rng is live
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t3))
    d1 = et(params, x, cfg)
    d2 = et(params, x, cfg, rng=jax.random.PRNGKey(7), deterministic=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_tome_train_validation():
    with pytest.raises(ValueError, match="tome_train requires tome_r"):
        CFG.replace(tome_train=True)
    with pytest.raises(ValueError, match="patch_drop"):
        CFG.replace(tome_r=4, tome_train=True, patch_drop=0.5)
    with pytest.raises(ValueError, match="distill_token"):
        CFG.replace(tome_r=4, tome_train=True, distill_token=True)


def test_fused_tome_attention_matches_composed():
    """The fused ToMe attention kernel (per-key log-size score bias + QKV
    bias + head-mean-key output in one pallas_call) must match the composed
    reference math in both outputs, and its VJP (saliency through a ToMe
    model) must match composed gradients."""
    from vitx.kernels.mha_block import _composed_tome, fused_mha_block_tome

    B, T, E, H = 2, 13, 32, 2
    D = E // H
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    x = jax.random.normal(ks[0], (B, T, E), jnp.float32)
    wqkv = jax.random.normal(ks[1], (E, 3, H, D), jnp.float32) * 0.1
    bqkv = jax.random.normal(ks[2], (3, H, D), jnp.float32) * 0.1
    wo = jax.random.normal(ks[3], (E, E), jnp.float32) * 0.1
    bo = jax.random.normal(ks[4], (E,), jnp.float32) * 0.1
    g = 1.0 + 0.1 * jax.random.normal(ks[5], (E,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[6], (E,), jnp.float32)
    sizes = 1.0 + jax.random.uniform(ks[7], (B, T), jnp.float32) * 5
    ls = jnp.log(sizes)

    args = (x, wqkv, bqkv, wo, bo, g, b, ls)
    out_f, km_f = fused_mha_block_tome(*args, eps=1e-5)
    out_c, km_c = _composed_tome(*args, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(km_f), np.asarray(km_c),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(*a):
        o, km = fused_mha_block_tome(*a, eps=1e-5)
        return jnp.sum(o ** 2) + jnp.sum(km ** 2)

    def loss_comp(*a):
        o, km = _composed_tome(*a, eps=1e-5)
        return jnp.sum(o ** 2) + jnp.sum(km ** 2)

    ga = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    gb = jax.grad(loss_comp, argnums=tuple(range(8)))(*args)
    for la, lb in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-4)


def test_encode_tome_fused_attn_path_matches_composed():
    """End-to-end: forcing the fused ToMe attention (fuse_mha="on") must
    reproduce the composed path's logits — same merges, same proportional
    attention, with and without QKV bias."""
    for qkv_bias in (False, True):
        cfg_off = CFG.replace(tome_r=8, fuse_mha="off", fuse_mlp="off",
                              qkv_bias=qkv_bias)
        cfg_on = cfg_off.replace(fuse_mha="on")
        params = init_params(jax.random.PRNGKey(3), cfg_on)
        if qkv_bias:
            params = dict(params)
            blocks = dict(params["blocks"])
            blocks["bqkv"] = 0.1 * jax.random.normal(
                jax.random.PRNGKey(4), blocks["bqkv"].shape)
            params["blocks"] = blocks
        x = jax.random.normal(jax.random.PRNGKey(5),
                              (2, cfg_on.image_size, cfg_on.image_size, 3))
        out_on = forward(params, x, cfg_on)
        out_off = forward(params, x, cfg_off)
        np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                                   rtol=2e-5, atol=2e-5)


def test_tome_r_schedule():
    """Per-block r schedules (the paper's decreasing-schedule variant):
    token counts follow the schedule, short schedules zero-pad, JSON
    round-trips, infeasible and overlong schedules are rejected, and an
    all-zero schedule normalizes to off."""
    from vitx.nn.tome import encode_tome

    cfg = CFG.replace(tome_r=(16, 8))        # depth 3 -> pads to (16, 8, 0)
    assert cfg.tome_r == (16, 8, 0)
    assert cfg.tome_schedule == (16, 8, 0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    toks = encode_tome(params, x, cfg)
    assert toks.shape[1] == cfg.seq_len - 24

    # logits well-formed through forward()
    out = forward(params, x, cfg)
    assert out.shape == (2, cfg.num_classes)

    # JSON round-trip (tuple -> list -> tuple)
    cfg2 = type(cfg).from_json(cfg.to_json())
    assert cfg2.tome_r == (16, 8, 0)

    assert CFG.replace(tome_r=(0, 0, 0)).tome_r == 0          # normalizes
    with pytest.raises(ValueError):                            # too long
        CFG.replace(tome_r=(1, 1, 1, 1))
    with pytest.raises(ValueError):  # infeasible: block 2 has 16 left, r>8
        CFG.replace(tome_r=(32, 16, 9))
    with pytest.raises(ValueError):                            # negative
        CFG.replace(tome_r=(4, -1))

    from vitx.nn.tome import parse_tome_r
    assert parse_tome_r("13") == 13
    assert parse_tome_r("23,23,22") == (23, 23, 22)


def test_fused_tome_attn_dp_mesh_matches_single_device():
    """The fused ToMe attention's custom_partitioning rule must shard
    batch-parallel under a dp mesh (x and log_size on the data axis,
    weights replicated) and reproduce single-device logits exactly."""
    from vitx.parallel import make_mesh, make_parallel_eval_step, shard_batch
    from vitx.parallel.sharded import place_state
    from vitx.train.step import (create_train_state, make_eval_step,
                                 make_optimizer)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = CFG.replace(tome_r=4, fuse_mha="on")
    mesh = make_mesh(dp=8, tp=1)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(7),
                                        (32, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(8), (32,), 0, 4)}

    cm_ref, loss_ref = make_eval_step(cfg)(state.params, batch)
    state_p = place_state(state, cfg, mesh)
    cm_par, loss_par = make_parallel_eval_step(cfg, mesh)(
        state_p.params, shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(cm_ref), np.asarray(cm_par))
    np.testing.assert_allclose(float(loss_ref), float(loss_par), rtol=1e-5)


def test_chunked_tome_kernel_matches_composed(monkeypatch):
    """The head-chunked ToMe kernel (ViT-L-class fallback) must accumulate
    the out-projection and the head-mean key correctly across chunks.
    Interpret-mode: force hc=1 so every head is its own chunk (the
    revisited-scratch accumulation is the part worth pinning)."""
    import vitx.kernels.mha_block as mb

    monkeypatch.setattr(mb, "_chunk_plan",
                        lambda *a, **k: (1, 0))   # hc=1 -> nh=H chunks
    # interpret everywhere, including on a real TPU: the forced hc=1 block
    # at this tiny D=16 geometry is not Mosaic-lane-legal (that's what
    # _chunk_plan's lane guard exists for); this test pins the
    # revisited-scratch ACCUMULATION math, which interpret runs faithfully
    monkeypatch.setattr(mb, "_use_interpret", lambda: True)
    B, T, E, H = 2, 16, 64, 4
    D = E // H
    ks = jax.random.split(jax.random.PRNGKey(1), 9)
    x = jax.random.normal(ks[0], (B, T, E), jnp.float32)
    wqkv = jax.random.normal(ks[1], (E, 3, H, D), jnp.float32) * 0.1
    bqkv = jax.random.normal(ks[2], (3, H, D), jnp.float32) * 0.1
    wo = jax.random.normal(ks[3], (E, E), jnp.float32) * 0.1
    bo = jax.random.normal(ks[4], (E,), jnp.float32) * 0.1
    g = 1.0 + 0.1 * jax.random.normal(ks[5], (E,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[6], (E,), jnp.float32)
    ls = jnp.log(1.0 + 5 * jax.random.uniform(ks[7], (B, T), jnp.float32))

    args = (x, wqkv, bqkv, wo, bo, g, b, ls)
    out_f, km_f = mb._chunked_tome_fwd(*args, eps=1e-5)
    out_c, km_c = mb._composed_tome(*args, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(km_f), np.asarray(km_c),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-kernel parity needs the real chip "
                           "(tiny CPU shapes fall back to the composed "
                           "path; interpret parity is covered above)")
def test_fused_tome_kernel_compiled_parity_vit_b_shapes():
    """On hardware, pin the COMPILED ToMe kernels against the composed math
    at real ViT-B/ViT-L block shapes (bf16 — the serving dtype): the full
    kernel at T=197, the relaxed small-T path at T=41, and the chunked
    variant at T=577/E=1024."""
    from vitx.kernels.mha_block import (_composed_tome, fused_mha_block_tome,
                                        supports_chunked_mha,
                                        supports_fused_mha)

    for (T, E, H) in ((197, 768, 12), (41, 768, 12), (577, 1024, 16)):
        B, D = 2, E // H
        if E == 1024:
            assert supports_chunked_mha((B, T, E), H, jnp.bfloat16,
                                        mean_metric=True)
        else:
            assert supports_fused_mha((B, T, E), H, jnp.bfloat16)
        ks = jax.random.split(jax.random.PRNGKey(T), 9)
        x = jax.random.normal(ks[0], (B, T, E), jnp.bfloat16)
        wqkv = (0.03 * jax.random.normal(ks[1], (E, 3, H, D))
                ).astype(jnp.bfloat16)
        bqkv = 0.03 * jax.random.normal(ks[2], (3, H, D))
        wo = (0.03 * jax.random.normal(ks[3], (E, E))).astype(jnp.bfloat16)
        bo = 0.03 * jax.random.normal(ks[4], (E,))
        g = 1.0 + 0.1 * jax.random.normal(ks[5], (E,))
        b = 0.1 * jax.random.normal(ks[6], (E,))
        ls = jnp.log(1.0 + 5 * jax.random.uniform(ks[7], (B, T)))
        args = (x, wqkv, bqkv, wo, bo, g, b, ls)
        out_f, km_f = jax.jit(
            lambda *a: fused_mha_block_tome(*a, eps=1e-5))(*args)
        out_c, km_c = jax.jit(
            lambda *a: _composed_tome(*a, eps=1e-5))(*args)
        of = np.asarray(out_f, np.float32)
        oc = np.asarray(out_c, np.float32)
        kf = np.asarray(km_f, np.float32)
        kc = np.asarray(km_c, np.float32)
        assert np.abs(of - oc).max() < 0.02 * np.abs(oc).max() + 1e-2, T
        assert np.abs(kf - kc).max() < 0.02 * np.abs(kc).max() + 1e-2, T


def test_aligned_schedule_and_toN_cli(tmp_path, capsys):
    """aligned_schedule merges to the target as fast as feasibility allows
    (the chip-measured to128 schedules), and --tome-r toN resolves against
    the model geometry on both the eval and serve config paths."""
    from vitx.core.config import get_config
    from vitx.nn.tome import aligned_schedule, parse_tome_r

    # ViT-B to128 reproduces the chip-measured (35, 34); ViT-L spreads the
    # 449 merges evenly under the 1/3-of-patches-per-block gentleness cap
    assert aligned_schedule(get_config("base16"), 128) == (35, 34)
    L = aligned_schedule(get_config("large16_384"), 128)
    assert sum(L) == 449 and max(L) == 57 and len(L) == 8
    with pytest.raises(ValueError):
        aligned_schedule(get_config("base16"), 512)   # >= total tokens
    with pytest.raises(ValueError):
        aligned_schedule(get_config("base16"), 1)     # <= protected tokens
    with pytest.raises(ValueError):                   # cap unreachable
        aligned_schedule(get_config("tiny"), 9)

    assert parse_tome_r("to128") == "to128"
    from vitx.train.checkpoint import resolve_artifact_config
    cfg = resolve_artifact_config(None, preset="base16", tome_r="to128")
    assert cfg.tome_r[:2] == (35, 34) and sum(cfg.tome_schedule) == 69

    # eval CLI end-to-end with toN on a tiny trained checkpoint
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32",
                    "--tome-r", "to33"])   # tiny: 64 patches + CLS = 65
    assert rc == 0
    import json
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_examples"] == 512 and 0.0 <= out["accuracy"] <= 1.0


def test_tome_train_checkpoint_serves_full_token(tmp_path, capsys):
    """A --tome-train checkpoint is full-token-servable (the train CLI's
    documented promise): ToMe merging is parameter-free, so
    resolve_artifact_config strips the persisted train-time tome knobs and
    eval/serve default to the full-token encoder; merged inference stays an
    explicit --tome-r at the consuming CLI (ADVICE r4)."""
    from vitx.cli.train import main as train_main
    from vitx.train.checkpoint import resolve_artifact_config

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3",
        "--tome-r", "4", "--tome-train",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    cfg = resolve_artifact_config(str(tmp_path / "c"), None, "tiny")
    assert cfg.tome_r == 0 and not cfg.tome_train
    # explicit --tome-r still opts back into merging on the same artifact
    cfg_m = resolve_artifact_config(str(tmp_path / "c"), None, "tiny",
                                    tome_r=4)
    assert cfg_m.tome_r == 4 and not cfg_m.tome_train
