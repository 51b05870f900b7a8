"""DINO self-distillation pretraining tests (vitx/nn/dino.py).

The reference has no self-supervised path (src/train.py is supervised only)
— beyond-reference capability, tested to the same standard: exact EMA /
centering / loss math, collapse monitoring, pretrain -> fine-tune transfer,
CLI e2e.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import get_config
from vitx.nn.dino import (DINOConfig, _resized_pos_embed, _teacher_momentum,
                          create_dino_train_state, dino_encode, dino_forward,
                          dino_head, dino_loss, dino_to_vit_params,
                          init_dino_params, make_dino_train_step, multi_crop)
from vitx.train.step import make_optimizer

ENC = get_config("tiny", compute_dtype="float32", final_norm=True,
                 dropout=0.0)
DCFG = DINOConfig(encoder=ENC, local_size=32, n_local=2, out_dim=32,
                  head_hidden=24, head_bottleneck=12)


def _images(seed, batch=4, size=None):
    return jax.random.uniform(
        jax.random.PRNGKey(seed),
        (batch, size or ENC.image_size, size or ENC.image_size, 3))


def test_dino_config_validation():
    with pytest.raises(ValueError):           # local not a patch multiple
        DINOConfig(encoder=ENC, local_size=30)
    with pytest.raises(ValueError):           # local >= global
        DINOConfig(encoder=ENC, local_size=ENC.image_size)
    with pytest.raises(ValueError):
        DINOConfig(encoder=ENC.replace(parity="bug_exact"), local_size=32)
    with pytest.raises(ValueError):
        DINOConfig(encoder=ENC.replace(num_registers=2), local_size=32)
    with pytest.raises(ValueError):
        DINOConfig(encoder=ENC.replace(distill_token=True,
                                       head_type="standard"), local_size=32)
    with pytest.raises(ValueError):
        DINOConfig(encoder=ENC, local_size=32, teacher_temp=0.0)


def test_multi_crop_shapes_and_views_differ():
    imgs = _images(0, batch=3)
    g, l = multi_crop(imgs, jax.random.PRNGKey(1), DCFG)
    S, s, B = ENC.image_size, DCFG.local_size, 3
    assert g.shape == (2 * B, S, S, 3)
    assert l.shape == (DCFG.n_local * B, s, s, 3)
    # the two global views of the same sample are different augmentations
    assert not np.allclose(np.asarray(g[0]), np.asarray(g[B]))
    assert not np.allclose(np.asarray(l[0]), np.asarray(l[B]))
    # n_local=0 returns None locals
    g2, l2 = multi_crop(imgs, jax.random.PRNGKey(1),
                        DINOConfig(encoder=ENC, local_size=32, n_local=0,
                                   out_dim=32))
    assert l2 is None and g2.shape == (2 * B, S, S, 3)


def test_resized_pos_embed_identity_and_cls_row():
    pos = jax.random.normal(jax.random.PRNGKey(0),
                            (1, ENC.grid_size ** 2 + 1, ENC.embed_dim))
    same = _resized_pos_embed(pos, ENC.grid_size, ENC.grid_size)
    assert same is pos
    g_to = DCFG.local_size // ENC.patch_size
    small = _resized_pos_embed(pos, ENC.grid_size, g_to)
    assert small.shape == (1, g_to * g_to + 1, ENC.embed_dim)
    # CLS row passes through untouched
    np.testing.assert_array_equal(np.asarray(small[:, 0]),
                                  np.asarray(pos[:, 0]))


def test_head_weight_norm_scale_invariance():
    """With norm_last_layer=True (weight-norm, g frozen at 1), scaling a
    prototype column must not change its logit; without it, it must."""
    params = init_dino_params(jax.random.PRNGKey(0), DCFG)
    feats = jax.random.normal(jax.random.PRNGKey(1), (5, ENC.embed_dim))
    base = dino_head(params, feats, DCFG)

    scaled = jax.tree.map(lambda x: x, params)
    scaled["head"] = dict(scaled["head"],
                          last=scaled["head"]["last"]
                          .at[:, 3].mul(10.0))
    out = dino_head(scaled, feats, DCFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-5, atol=1e-6)

    raw_cfg = DINOConfig(encoder=ENC, local_size=32, n_local=2, out_dim=32,
                         head_hidden=24, head_bottleneck=12,
                         norm_last_layer=False)
    base_r = dino_head(params, feats, raw_cfg)
    out_r = dino_head(scaled, feats, raw_cfg)
    assert not np.allclose(np.asarray(out_r[:, 3]), np.asarray(base_r[:, 3]))


def test_dino_loss_manual_parity():
    """Loss == mean over (teacher view iq, student view v != iq) of the
    cross-entropy between centered/sharpened teacher softmax and the
    student log-softmax — checked against a numpy reimplementation."""
    V, B, K = 4, 3, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    s = jax.random.normal(ks[0], (V, B, K))
    t = jax.random.normal(ks[1], (2, B, K))
    center = jax.random.normal(ks[2], (K,))
    dcfg = DINOConfig(encoder=ENC, local_size=32, n_local=V - 2, out_dim=K,
                      student_temp=0.2, teacher_temp=0.05)

    loss, t_probs = dino_loss(s, t, center, dcfg)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    tn = softmax((np.asarray(t) - np.asarray(center)) / 0.05)
    sn = np.asarray(s) / 0.2
    s_logp = sn - sn.max(-1, keepdims=True)
    s_logp = s_logp - np.log(np.exp(s_logp).sum(-1, keepdims=True))
    terms = [np.mean(-(tn[iq] * s_logp[v]).sum(-1))
             for iq in range(2) for v in range(V) if v != iq]
    np.testing.assert_allclose(float(loss), np.mean(terms), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_probs), tn, rtol=1e-4, atol=1e-6)


def test_teacher_ema_and_center_update_exact():
    """One real train step: the new teacher must be EXACTLY
    m * teacher + (1-m) * new_student, and the center EXACTLY
    cm * center + (1-cm) * mean(teacher global logits) — recomputed here
    from the same rng stream the step folds."""
    opt = make_optimizer(lr=1e-3, weight_decay=0.0)
    state = create_dino_train_state(jax.random.PRNGKey(0), DCFG, opt)
    step = make_dino_train_step(DCFG, opt, total_steps=50)
    batch = {"image": _images(2, batch=4)}
    rng = jax.random.PRNGKey(7)

    teacher0 = jax.tree.map(np.asarray, state.teacher)
    center0 = np.asarray(state.center)
    new_state, metrics = step(state, batch, rng)

    m = float(_teacher_momentum(jnp.zeros((), jnp.int32), 50, DCFG))
    assert m == pytest.approx(DCFG.momentum)
    for path, t_new in jax.tree_util.tree_flatten_with_path(
            new_state.teacher)[0]:
        t_old = teacher0
        s_new = new_state.params
        for k in path:
            t_old = t_old[k.key]
            s_new = s_new[k.key]
        expect = m * t_old + (1 - m) * np.asarray(s_new, np.float32)
        # atol 1e-5: TPU fp32 transcendental/matmul drift is ~4e-6 on
        # these magnitudes (chip round 4); CPU passes at 1e-6
        np.testing.assert_allclose(np.asarray(t_new), expect,
                                   rtol=1e-5, atol=1e-5)

    # recompute the teacher's global-view logits from the same fold
    step_rng = jax.random.fold_in(rng, 0)
    k_crop, _ = jax.random.split(step_rng)
    g_crops, _ = multi_crop(batch["image"], k_crop, DCFG)
    t_logits = dino_forward(jax.tree.map(jnp.asarray, teacher0),
                            g_crops, DCFG)
    cm = DCFG.center_momentum
    expect_center = cm * center0 + (1 - cm) * np.asarray(
        jnp.mean(t_logits, 0))
    np.testing.assert_allclose(np.asarray(new_state.center), expect_center,
                               rtol=5e-4, atol=1e-5)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_freeze_last_steps_pins_prototypes():
    opt = make_optimizer(lr=1e-2, weight_decay=1e-2)
    batch = {"image": _images(3, batch=4)}
    rng = jax.random.PRNGKey(1)

    state = create_dino_train_state(jax.random.PRNGKey(0), DCFG, opt)
    last0 = np.asarray(state.params["head"]["last"])
    frozen = make_dino_train_step(DCFG, opt, total_steps=10,
                                  freeze_last_steps=5)
    state, _ = frozen(state, batch, rng)
    np.testing.assert_array_equal(np.asarray(state.params["head"]["last"]),
                                  last0)
    # encoder DID move
    assert not np.allclose(
        np.asarray(state.params["encoder"]["blocks"]["wqkv"])[0, :4, :4],
        np.asarray(state.teacher["encoder"]["blocks"]["wqkv"])[0, :4, :4])

    state2 = create_dino_train_state(jax.random.PRNGKey(0), DCFG, opt)
    live = make_dino_train_step(DCFG, opt, total_steps=10,
                                freeze_last_steps=0)
    state2, _ = live(state2, batch, rng)
    assert not np.array_equal(np.asarray(state2.params["head"]["last"]),
                              last0)


def test_dino_student_converges_to_fixed_teacher():
    """With the teacher and center FROZEN (momentum=1, center_momentum=1)
    the target distribution is fixed, so the student's cross-entropy MUST
    decrease — the convergence test of the gradient path. (Under real EMA
    dynamics the target moves with the student and the loss is not
    monotone, so that is checked separately for non-collapse only.)"""
    import dataclasses

    dcfg = dataclasses.replace(DCFG, momentum=1.0, center_momentum=1.0)
    opt = make_optimizer(lr=2e-3, weight_decay=0.0, grad_clip=3.0)
    state = create_dino_train_state(jax.random.PRNGKey(0), dcfg, opt)
    step = make_dino_train_step(dcfg, opt, total_steps=30)
    batch = {"image": _images(4, batch=8)}
    rng = jax.random.PRNGKey(2)             # fixed -> fixed crops every step

    teacher0 = jax.tree.map(np.asarray, state.teacher)
    losses = []
    for _ in range(30):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:5]), losses
    assert all(np.isfinite(losses))
    # momentum=1.0 really froze the teacher
    np.testing.assert_array_equal(
        np.asarray(state.teacher["head"]["last"]), teacher0["head"]["last"])


def test_dino_dynamics_stay_finite_without_collapse():
    """Real EMA + centering dynamics: teacher targets keep nonzero entropy
    (centering prevents one-prototype collapse) and nothing diverges."""
    opt = make_optimizer(lr=2e-3, weight_decay=1e-4, grad_clip=3.0)
    state = create_dino_train_state(jax.random.PRNGKey(0), DCFG, opt)
    step = make_dino_train_step(DCFG, opt, total_steps=20)
    batch = {"image": _images(4, batch=8)}
    rng = jax.random.PRNGKey(2)

    ents, losses = [], []
    for _ in range(20):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
        ents.append(float(m["teacher_entropy"]))
    assert all(np.isfinite(losses)), losses
    assert 0.1 < ents[-1] <= np.log(DCFG.out_dim) + 1e-3, ents[-5:]


def test_local_and_global_features_same_params():
    """The SAME weights encode both resolutions (shared-trunk multi-crop):
    local crops run through the resized pos-embed path and produce
    finite, size-(B, E) features distinct from the global features."""
    params = init_dino_params(jax.random.PRNGKey(0), DCFG)
    g = _images(5, batch=2)
    l = _images(6, batch=2, size=DCFG.local_size)
    fg = dino_encode(params, g, DCFG)
    fl = dino_encode(params, l, DCFG)
    assert fg.shape == (2, ENC.embed_dim) and fl.shape == (2, ENC.embed_dim)
    assert np.all(np.isfinite(np.asarray(fg)))
    assert np.all(np.isfinite(np.asarray(fl)))


def test_dino_to_vit_transfer():
    from vitx.nn.vit import forward

    opt = make_optimizer(lr=1e-3)
    state = create_dino_train_state(jax.random.PRNGKey(0), DCFG, opt)
    vit_params = dino_to_vit_params(state.teacher, ENC, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(
        np.asarray(vit_params["blocks"]["wqkv"]),
        np.asarray(state.teacher["encoder"]["blocks"]["wqkv"]))
    logits = forward(vit_params, _images(7, batch=2), ENC)
    assert logits.shape == (2, ENC.num_classes)
    with pytest.raises(ValueError):
        dino_to_vit_params(state.teacher, ENC.replace(final_norm=False),
                           jax.random.PRNGKey(5))


def test_pretrain_cli_dino_e2e(tmp_path, capsys):
    """pretrain --method dino -> export-vit -> train --init-from."""
    from vitx.cli.pretrain import main as pretrain_main
    from vitx.cli.train import main as train_main

    export = tmp_path / "dino_init.npz"
    args = ["--preset", "tiny", "--data", "synthetic", "--epochs", "2",
            "--batch-size", "64", "--method", "dino",
            "--local-size", "32", "--n-local", "1", "--dino-dim", "32",
            "--dino-hidden", "24", "--dino-bottleneck", "12",
            "--freeze-last-epochs", "1",
            "--checkpoint-dir", str(tmp_path / "dino"),
            "--export-vit", str(export)]
    assert pretrain_main(args) == 0
    out = capsys.readouterr().out
    assert "dino_loss" in out and "teacher_H" in out
    assert export.exists()

    # resume path: re-run with more epochs picks up at epoch 2
    args[args.index("--epochs") + 1] = "3"
    assert pretrain_main(args) == 0
    assert "resumed DINO pretraining at epoch 2" in capsys.readouterr().out

    rc = train_main(["--preset", "tiny", "--data", "synthetic",
                     "--epochs", "1", "--batch-size", "64",
                     "--init-from", str(export)])
    assert rc == 0
