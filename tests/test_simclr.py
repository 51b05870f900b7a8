"""SimCLR contrastive pretraining tests (vitx/nn/simclr.py).

The reference has no self-supervised path (src/train.py is supervised only)
— beyond-reference capability, tested to the same standard: exact NT-Xent
math vs a naive per-pair reference, global-negative dp invariance, pretrain
-> fine-tune transfer, CLI e2e.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import get_config
from vitx.nn.simclr import (SimCLRConfig, create_simclr_train_state,
                            init_simclr_params, make_simclr_train_step,
                            nt_xent_loss, simclr_forward, simclr_project,
                            simclr_to_vit_params, simclr_views)
from vitx.train.step import make_optimizer

ENC = get_config("tiny", compute_dtype="float32", final_norm=True,
                 dropout=0.0)
SCFG = SimCLRConfig(encoder=ENC, proj_hidden=24, proj_dim=12)


def _images(seed, batch=4):
    return jax.random.uniform(
        jax.random.PRNGKey(seed),
        (batch, ENC.image_size, ENC.image_size, 3))


def test_simclr_config_validation():
    with pytest.raises(ValueError):
        SimCLRConfig(encoder=ENC, temperature=0.0)
    with pytest.raises(ValueError):
        SimCLRConfig(encoder=ENC, proj_dim=0)
    with pytest.raises(ValueError):
        SimCLRConfig(encoder=ENC.replace(parity="bug_exact"))
    with pytest.raises(ValueError):
        SimCLRConfig(encoder=ENC.replace(num_registers=2))
    with pytest.raises(ValueError):
        SimCLRConfig(encoder=ENC.replace(distill_token=True,
                                         head_type="standard"))
    with pytest.raises(ValueError):
        SimCLRConfig(encoder=ENC.replace(moe_experts=2))


def test_simclr_views_fused_layout():
    imgs = _images(0, batch=3)
    v = simclr_views(imgs, jax.random.PRNGKey(1), SCFG)
    S = ENC.image_size
    assert v.shape == (6, S, S, 3)
    # the two views of the same sample are different augmentations ...
    assert not np.allclose(np.asarray(v[0]), np.asarray(v[3]))
    # ... and the builder is deterministic given the key
    v2 = simclr_views(imgs, jax.random.PRNGKey(1), SCFG)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


def test_nt_xent_manual_parity():
    """nt_xent_loss == a naive per-row softmax-CE over non-self rows."""
    B, D, tau = 5, 7, 0.3
    z = jax.random.normal(jax.random.PRNGKey(0), (2 * B, D))
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    loss, acc = nt_xent_loss(z, tau)

    zn = np.asarray(z, np.float64)
    sim = zn @ zn.T / tau
    total, hits = 0.0, 0
    for i in range(2 * B):
        pos = (i + B) % (2 * B)
        others = [j for j in range(2 * B) if j != i]
        logits = sim[i, others]
        logits -= logits.max()
        p = np.exp(logits) / np.exp(logits).sum()
        total += -np.log(p[others.index(pos)])
        hits += int(others[int(np.argmax(logits))] == pos)
    np.testing.assert_allclose(float(loss), total / (2 * B), rtol=1e-5)
    np.testing.assert_allclose(float(acc), hits / (2 * B), rtol=1e-6)


def test_nt_xent_identical_positives_are_easy():
    """Exact-duplicate views + near-orthogonal negatives -> accuracy 1 and a
    loss far below the uniform-similarity baseline log(2B - 1)."""
    B, D = 4, 64
    base = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    base = base / jnp.linalg.norm(base, axis=-1, keepdims=True)
    z = jnp.concatenate([base, base], axis=0)
    loss, acc = nt_xent_loss(z, 0.1)
    assert float(acc) == 1.0
    assert float(loss) < np.log(2 * B - 1) / 2


def test_projection_is_l2_normalized():
    params = init_simclr_params(jax.random.PRNGKey(0), SCFG)
    z = simclr_forward(params, _images(2, batch=3), SCFG)
    assert z.shape == (3, SCFG.proj_dim)
    assert z.dtype == jnp.float32
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                               np.ones(3), rtol=1e-5)


def test_simclr_training_learns():
    """NT-Xent drops well below the random-init level and contrastive
    accuracy rises when training on a small fixed image set.

    The images are smooth (coarse random grids bilinearly upsampled), not
    iid noise: random-crop views of white noise share no scale-invariant
    structure, so no encoder could match them. Augmentation is cropping
    only for the same reason — this pins the optimization path, not the
    full-recipe difficulty."""
    ez = SimCLRConfig(encoder=ENC, proj_hidden=24, proj_dim=12,
                      crop_scale=(0.85, 1.0), color_jitter=0.0,
                      blur_prob=0.0)
    S = ENC.image_size
    coarse = jax.random.uniform(jax.random.PRNGKey(3), (8, 4, 4, 3))
    batch = {"image": jax.image.resize(coarse, (8, S, S, 3), "bilinear")}

    opt = make_optimizer(lr=3e-3, weight_decay=0.0)
    state = create_simclr_train_state(jax.random.PRNGKey(0), ez, opt)
    step = make_simclr_train_step(ez, opt)
    rng = jax.random.PRNGKey(7)

    _, m0 = step(jax.tree.map(jnp.copy, state), batch, rng)
    first = float(m0["loss"])
    for _ in range(100):
        state, metrics = step(state, batch, rng)
    assert float(metrics["loss"]) < first * 0.6
    assert float(metrics["contrast_acc"]) >= 0.7
    assert np.isfinite(float(metrics["grad_norm"]))


def test_simclr_dp_trajectory_matches_single_device():
    """One SimCLR train step under a dp=8 mesh (batch sharded, state
    replicated) matches the single-device trajectory — the global-negative
    property: NT-Xent couples every sample, and the sharded z @ z.T gathers
    the full batch, so the dp loss IS the global loss."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitx.parallel import make_mesh, shard_batch

    opt = make_optimizer(lr=1e-3)
    rng = jax.random.PRNGKey(2)
    batch = {"image": _images(6, batch=8)}
    step = make_simclr_train_step(SCFG, opt)

    ref = create_simclr_train_state(jax.random.PRNGKey(0), SCFG, opt)
    ref, m_ref = step(ref, batch, rng)

    mesh = make_mesh(dp=8, tp=1)
    st = create_simclr_train_state(jax.random.PRNGKey(0), SCFG, opt)
    st = jax.device_put(st, NamedSharding(mesh, P()))
    st, m_sh = step(st, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_sh["contrast_acc"]),
                               float(m_ref["contrast_acc"]), rtol=1e-6)
    # same tolerance class as the MAE dp trajectory test: cross-shard
    # reduction order + Adam normalization amplify ulp-level grad noise
    np.testing.assert_allclose(
        np.asarray(st.params["encoder"]["blocks"]["wqkv"]),
        np.asarray(ref.params["encoder"]["blocks"]["wqkv"]),
        rtol=5e-4, atol=2e-5)


def test_simclr_to_vit_transfer():
    from vitx.nn.vit import forward

    opt = make_optimizer(lr=1e-3)
    state = create_simclr_train_state(jax.random.PRNGKey(0), SCFG, opt)
    vit_params = simclr_to_vit_params(state.params, ENC,
                                      jax.random.PRNGKey(5))
    np.testing.assert_array_equal(
        np.asarray(vit_params["blocks"]["wqkv"]),
        np.asarray(state.params["encoder"]["blocks"]["wqkv"]))
    logits = forward(vit_params, _images(7, batch=2), ENC)
    assert logits.shape == (2, ENC.num_classes)
    with pytest.raises(ValueError):
        simclr_to_vit_params(state.params, ENC.replace(final_norm=False),
                             jax.random.PRNGKey(5))


def test_simclr_project_uses_head_only():
    """The projection consumes features through the head params alone (a
    guard on the pytree contract the CLI checkpoint/restore relies on)."""
    params = init_simclr_params(jax.random.PRNGKey(0), SCFG)
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, ENC.embed_dim))
    z1 = simclr_project(params, feats, SCFG)
    mutated = dict(params, encoder=jax.tree.map(jnp.zeros_like,
                                                params["encoder"]))
    z2 = simclr_project(mutated, feats, SCFG)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_pretrain_cli_simclr_e2e(tmp_path, capsys):
    """pretrain --method simclr -> export-vit -> train --init-from."""
    from vitx.cli.pretrain import main as pretrain_main
    from vitx.cli.train import main as train_main

    export = tmp_path / "simclr_init.npz"
    args = ["--preset", "tiny", "--data", "synthetic", "--epochs", "2",
            "--batch-size", "64", "--method", "simclr",
            "--simclr-dim", "16", "--simclr-hidden", "24",
            "--checkpoint-dir", str(tmp_path / "simclr"),
            "--export-vit", str(export)]
    assert pretrain_main(args) == 0
    out = capsys.readouterr().out
    assert "simclr_loss" in out and "contrast_acc" in out
    assert export.exists()

    # resume path: re-run with more epochs picks up at epoch 2
    args[args.index("--epochs") + 1] = "3"
    assert pretrain_main(args) == 0
    assert "resumed SIMCLR pretraining at epoch 2" in capsys.readouterr().out

    rc = train_main(["--preset", "tiny", "--data", "synthetic",
                     "--epochs", "1", "--batch-size", "64",
                     "--init-from", str(export)])
    assert rc == 0
