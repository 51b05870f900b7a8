"""Model-level unit tests: shapes, determinism, attention-probs API, training
signal on the ViT-Tiny preset (BASELINE.json config 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx import ViTConfig, attention_rollout, forward, forward_with_attn, init_params
from vitx.core.config import get_config
from vitx.nn.vit import param_count
from vitx.train import create_train_state, make_train_step
from vitx.train.step import make_optimizer


TINY = get_config("tiny", compute_dtype="float32")


def _batch(rng, cfg, batch=2):
    kx, ky = jax.random.split(jax.random.PRNGKey(rng))
    x = jax.random.normal(kx, (batch, cfg.image_size, cfg.image_size,
                               cfg.num_channels), jnp.float32)
    y = jax.random.randint(ky, (batch,), 0, cfg.num_classes)
    return {"image": x, "label": y}


def test_forward_shapes():
    params = init_params(jax.random.PRNGKey(0), TINY)
    batch = _batch(1, TINY, batch=3)
    logits = forward(params, batch["image"], TINY)
    assert logits.shape == (3, TINY.num_classes)
    assert logits.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(logits)))


def test_forward_deterministic():
    params = init_params(jax.random.PRNGKey(0), TINY)
    batch = _batch(2, TINY)
    l1 = forward(params, batch["image"], TINY)
    l2 = forward(params, batch["image"], TINY)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_cls_token_batch_independent():
    """CLS must be one broadcast vector: per-sample logits cannot depend on
    batch size (the reference's per-batch-slot CLS param broke this,
    vit.py:31-33)."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    batch = _batch(3, TINY, batch=4)
    full = forward(params, batch["image"], TINY)
    first = forward(params, batch["image"][:1], TINY)
    np.testing.assert_allclose(np.asarray(full[:1]), np.asarray(first),
                               rtol=1e-5, atol=1e-5)


def test_attention_probs_shape_and_rows_sum_to_one():
    params = init_params(jax.random.PRNGKey(0), TINY)
    batch = _batch(4, TINY)
    logits, probs = forward_with_attn(params, batch["image"], TINY)
    T = TINY.seq_len
    assert probs.shape == (TINY.depth, 2, TINY.num_heads, T, T)
    rows = np.asarray(jnp.sum(probs, axis=-1))
    np.testing.assert_allclose(rows, np.ones_like(rows), rtol=1e-5, atol=1e-5)
    # instrumented path must produce the same logits as the fast path
    plain = forward(params, batch["image"], TINY)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_attention_rollout():
    params = init_params(jax.random.PRNGKey(0), TINY)
    batch = _batch(5, TINY)
    _, probs = forward_with_attn(params, batch["image"], TINY)
    roll = attention_rollout(probs)
    assert roll.shape == (2, TINY.num_patches)
    np.testing.assert_allclose(np.asarray(jnp.sum(roll, axis=-1)),
                               np.ones(2), rtol=1e-5)
    assert np.all(np.asarray(roll) >= 0)


def test_dropout_active_in_train_mode():
    cfg = TINY.replace(dropout=0.5)
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(6, cfg)
    rng = jax.random.PRNGKey(7)
    a = forward(params, batch["image"], cfg, rng=rng, deterministic=False)
    b = forward(params, batch["image"], cfg,
                rng=jax.random.PRNGKey(8), deterministic=False)
    det = forward(params, batch["image"], cfg)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    det2 = forward(params, batch["image"], cfg)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))


def test_param_count_reasonable():
    params = init_params(jax.random.PRNGKey(0), TINY)
    n = param_count(params)
    assert 100_000 < n < 5_000_000


@pytest.mark.parametrize("head_type,final_norm,mlp_act",
                         [("standard", True, "gelu"), ("reference", False, "relu")])
def test_config_variants_run(head_type, final_norm, mlp_act):
    cfg = TINY.replace(head_type=head_type, final_norm=final_norm,
                       mlp_act=mlp_act, qkv_bias=(head_type == "standard"))
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(9, cfg)
    logits = forward(params, batch["image"], cfg)
    assert logits.shape == (2, cfg.num_classes)


def test_train_step_reduces_loss():
    """E2E slice: loss falls when overfitting one batch (SURVEY.md §4)."""
    cfg = TINY
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = _batch(10, cfg, batch=8)
    rng = jax.random.PRNGKey(1)
    first_loss = None
    for _ in range(30):
        state, metrics = step(state, batch, rng)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert int(state.step) == 30
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)


def test_dump_params_summary():
    from vitx.utils import param_summary

    params = init_params(jax.random.PRNGKey(0), TINY)
    s = param_summary(params)
    assert "patch_embed/kernel" in s and "blocks/wqkv" in s
    assert "TOTAL" in s and "parameters" in s


def test_warmup_cosine_schedule_trains():
    from vitx.train.step import warmup_cosine

    sched = warmup_cosine(lr=1e-3, total_steps=100, warmup_steps=10)
    assert float(sched(0)) < 1e-4
    assert abs(float(sched(10)) - 1e-3) < 1e-5
    assert float(sched(99)) < 1e-3
    opt = make_optimizer(schedule=sched)
    state = create_train_state(jax.random.PRNGKey(0), TINY, opt)
    step = make_train_step(TINY, opt)
    state, m = step(state, _batch(0, TINY), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_gradient_accumulation():
    """accum_steps=2: params update only every 2nd step, matching the mean
    of the micro-batch gradients."""
    opt = make_optimizer(lr=1e-2, accum_steps=2)
    state = create_train_state(jax.random.PRNGKey(0), TINY, opt)
    step = make_train_step(TINY, opt)
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, _ = step(state, _batch(0, TINY), None)
    p1 = jax.tree.leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, _batch(1, TINY), None)
    p2 = jax.tree.leaves(state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p2))


def test_head_mean_probs_match_full():
    params = init_params(jax.random.PRNGKey(0), TINY)
    batch = _batch(11, TINY)
    logits_f, probs_f = forward_with_attn(params, batch["image"], TINY)
    logits_m, probs_m = forward_with_attn(params, batch["image"], TINY,
                                          probs_mode="mean")
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs_m),
                               np.asarray(jnp.mean(probs_f, axis=2)),
                               rtol=1e-5, atol=1e-6)
    # rollout accepts both forms and agrees
    r_f = attention_rollout(probs_f)
    r_m = attention_rollout(probs_m)
    np.testing.assert_allclose(np.asarray(r_m), np.asarray(r_f),
                               rtol=1e-5, atol=1e-6)


def test_proj_bias_knob_is_live():
    """proj_bias=False must drop the output-projection bias from the params
    and from the compute (no dead config knobs — the standard SURVEY §2.1
    applies to the reference's unused dropout)."""
    cfg = TINY.replace(proj_bias=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "bo" not in params["blocks"]
    with_bias = init_params(jax.random.PRNGKey(0), TINY)
    assert "bo" in with_bias["blocks"]
    batch = _batch(3, cfg)
    logits = forward(params, batch["image"], cfg)
    assert np.all(np.isfinite(np.asarray(logits)))
    # sharding specs track the param structure for both settings
    from vitx.parallel.sharded import param_pspecs
    for c, p in ((cfg, params), (TINY, with_bias)):
        assert (jax.tree_util.tree_structure(param_pspecs(c))
                == jax.tree_util.tree_structure(
                    jax.tree.map(lambda _: 0, p)))
    # and it trains
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_fused_rollout_matches_materialized():
    """forward_with_rollout (in-scan accumulation, O(T) probs memory) must
    match attention_rollout over the materialized (depth,B,T,T) stack."""
    from vitx import forward_with_rollout

    params = init_params(jax.random.PRNGKey(0), TINY)
    batch = _batch(13, TINY, batch=3)
    logits_m, probs = forward_with_attn(params, batch["image"], TINY,
                                        probs_mode="mean")
    roll_m = attention_rollout(probs)
    logits_f, roll_f = forward_with_rollout(params, batch["image"], TINY)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(roll_f), np.asarray(roll_m),
                               rtol=1e-5, atol=1e-7)
    # weights are a distribution over the N patch tokens
    np.testing.assert_allclose(np.asarray(roll_f.sum(-1)), 1.0, rtol=1e-5)


def test_label_smoothing_loss():
    """cross_entropy_loss(label_smoothing=s) matches the torch formula:
    (1-s)*NLL + s*mean(-logp)."""
    from vitx.train.step import cross_entropy_loss

    logits = jnp.asarray([[2.0, 0.5, -1.0, 0.1], [0.0, 1.0, 2.0, 3.0]])
    labels = jnp.asarray([0, 2])
    s = 0.1
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -logp[jnp.arange(2), labels]
    expected = jnp.mean((1 - s) * nll + s * (-logp.mean(-1)))
    got = cross_entropy_loss(logits, labels, label_smoothing=s)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-6)
    # torch parity
    import torch
    tref = torch.nn.functional.cross_entropy(
        torch.asarray(np.asarray(logits)),
        torch.asarray(np.asarray(labels).astype(np.int64)),
        label_smoothing=s)
    # cross-backend (TPU log_softmax vs torch CPU): fp32 accumulation order
    np.testing.assert_allclose(float(got), float(tref), rtol=1e-4)


def test_mixup_and_recipe_train_step():
    """Training with mixup + label smoothing + stochastic depth runs,
    produces finite decreasing loss, and stays deterministic in the rng."""
    cfg = TINY.replace(drop_path=0.1, dropout=0.1)
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, label_smoothing=0.1, mixup_alpha=0.2)
    rng = jax.random.PRNGKey(1)
    batch = _batch(0, TINY, batch=8)
    losses = []
    for _ in range(30):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # reproducibility: same rng stream -> identical trajectory
    state2 = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    for _ in range(3):
        state2, m2 = step(state2, batch, rng)
    state3 = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    for _ in range(3):
        state3, m3 = step(state3, batch, rng)
    np.testing.assert_array_equal(np.asarray(m2["loss"]),
                                  np.asarray(m3["loss"]))


def test_cutmix_weight_map_properties():
    """CutMix map is binary (patch REPLACEMENT, not blending), the zero
    region is one contiguous rectangle, and the mixup-only map is constant —
    so mean(map) is the exact target mixing coefficient for both modes."""
    from vitx.train.step import _mix_weight_map

    shape = (8, 32, 48, 3)
    w = np.asarray(_mix_weight_map(jax.random.PRNGKey(3), shape, None, 1.0))
    assert w.shape == (1, 32, 48, 1)
    assert set(np.unique(w)) <= {0.0, 1.0}
    # zero region is a rectangle: row/col projections of the cut are
    # contiguous runs and the cut count factorizes
    cut = 1.0 - w[0, :, :, 0]
    rows, cols = np.flatnonzero(cut.sum(1)), np.flatnonzero(cut.sum(0))
    if rows.size:                       # lam≈1 can produce an empty box
        assert np.array_equal(rows, np.arange(rows[0], rows[-1] + 1))
        assert np.array_equal(cols, np.arange(cols[0], cols[-1] + 1))
        assert cut.sum() == rows.size * cols.size
    # mixup-only: constant map with a Beta sample
    w_mix = np.asarray(
        _mix_weight_map(jax.random.PRNGKey(4), shape, 0.2, None))
    assert np.unique(w_mix).size == 1 and 0.0 <= float(w_mix[0, 0, 0, 0]) <= 1.0
    # both enabled: the 50/50 switch picks one of the two forms
    w_both = np.asarray(
        _mix_weight_map(jax.random.PRNGKey(5), shape, 0.2, 1.0))
    assert (np.unique(w_both).size == 1
            or set(np.unique(w_both)) <= {0.0, 1.0})


def test_cutmix_train_step():
    """Training with cutmix (and the mixup+cutmix switch) runs, decreases
    loss, and is rng-deterministic."""
    cfg = TINY
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, mixup_alpha=0.2, cutmix_alpha=1.0)
    rng = jax.random.PRNGKey(1)
    batch = _batch(0, TINY, batch=8)
    losses = []
    for _ in range(30):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    state2 = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    for _ in range(3):
        state2, m2 = step(state2, batch, rng)
    state3 = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    for _ in range(3):
        state3, m3 = step(state3, batch, rng)
    np.testing.assert_array_equal(np.asarray(m2["loss"]),
                                  np.asarray(m3["loss"]))


def test_drop_path_identity_in_eval_and_active_in_train():
    from vitx.nn.layers import drop_path

    cfg = TINY.replace(drop_path=0.5)
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(5, cfg, batch=4)
    # eval: deterministic regardless of drop_path
    a = forward(params, batch["image"], cfg)
    b = forward(params, batch["image"], TINY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # train mode: some residual branches actually drop (outputs differ)
    out_dp = forward(params, batch["image"], cfg,
                     rng=jax.random.PRNGKey(3), deterministic=False)
    assert not np.allclose(np.asarray(out_dp), np.asarray(a))
    # unit: rate=0 identity, per-sample masking shape
    x = jnp.ones((4, 3, 2))
    y = drop_path(x, 0.9, jax.random.PRNGKey(0), deterministic=False)
    row_vals = np.asarray(y).reshape(4, -1)
    assert set(np.unique(row_vals.round(3))) <= {0.0, 10.0}


def test_remat_modes_trajectory_identical():
    """remat='save_stash' (keep the fused-MHA stash, skip its recompute) and
    remat='none' must produce the SAME training trajectory as the default
    remat='block' — remat is a memory/speed knob, never a numerics knob."""
    def run(remat):
        cfg = TINY.replace(remat=remat, fuse_mha="on")
        opt = make_optimizer(lr=3e-3)
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = make_train_step(cfg, opt)
        batch = _batch(11, cfg, batch=4)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(3):
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        return losses

    base = run("block")
    for mode in ("save_stash", "none"):
        np.testing.assert_allclose(run(mode), base, rtol=1e-6,
                                   err_msg=mode)
