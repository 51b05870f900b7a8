"""Sharpness-aware minimization (vitx/train/step.py sam_rho, Foret 2021)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vitx.core.config import ViTConfig
from vitx.train.step import (
    create_train_state,
    loss_fn,
    make_optimizer,
    make_train_step,
)

CFG = ViTConfig(image_size=32, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")
RHO = 0.05


def _batch(seed, n=8):
    return {"image": jax.random.normal(jax.random.PRNGKey(seed),
                                       (n, 32, 32, 3)),
            "label": jax.random.randint(jax.random.PRNGKey(seed + 1),
                                        (n,), 0, 4)}


def test_sam_step_matches_manual_two_pass():
    """The SAM step must equal a hand-rolled ascend-then-update: grads at
    params + rho * g/||g|| fed to the SAME optimizer."""
    opt = make_optimizer(lr=1e-3)
    state0 = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    batch = _batch(2)

    # manual reference FIRST (the jitted step donates/consumes state0):
    # clean grads -> ascent point -> adversarial grads -> update
    g_fn = jax.grad(lambda p: loss_fn(p, batch, CFG, None)[0])
    g1 = g_fn(state0.params)
    gn = optax.global_norm(g1)
    scale = RHO / (gn + 1e-12)
    p_adv = jax.tree.map(lambda p, g: p + (scale * g).astype(p.dtype),
                         state0.params, g1)
    g2 = g_fn(p_adv)
    updates, _ = opt.update(g2, state0.opt_state, state0.params)
    p_ref = optax.apply_updates(state0.params, updates)
    l_ref = loss_fn(state0.params, batch, CFG, None)[0]

    step = make_train_step(CFG, opt, sam_rho=RHO)
    new_state, metrics = step(state0, batch, None)

    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(p_ref)):
        # AdamW's g/(sqrt(v)+eps) amplifies jit-vs-eager float noise on
        # near-zero gradient elements; 1e-5 on lr=1e-3 updates is ~1% of a
        # step, far below the rho=0.05 perturbation being verified
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)
    # metrics come from the CLEAN pass
    np.testing.assert_allclose(float(metrics["loss"]), float(l_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(float(metrics["grad_norm"]), float(gn),
                               rtol=1e-6)


def test_sam_changes_trajectory_and_still_overfits():
    batch = _batch(5)
    finals = {}
    for rho in (None, RHO):
        opt = make_optimizer(lr=3e-3)
        state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
        step = make_train_step(CFG, opt, sam_rho=rho)
        for _ in range(40):
            state, m = step(state, batch, jax.random.PRNGKey(1))
        finals[rho] = float(m["loss"])
    assert finals[RHO] < 0.2          # SAM still overfits the batch
    assert finals[RHO] != finals[None]  # and takes a different trajectory


def test_sam_dp_mesh_matches_single_device():
    """SAM's perturbation uses the global gradient norm, so the dp-sharded
    trajectory must be bit-comparable to single-device."""
    from vitx.parallel import (
        make_mesh,
        make_parallel_train_step,
        shard_batch,
    )
    from vitx.parallel.sharded import place_state, state_sharding

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    batch = _batch(7, n=32)

    step1 = make_train_step(CFG, opt, sam_rho=RHO)
    sd, _ = step1(state, batch, None)

    state2 = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    mesh = make_mesh(dp=8, tp=1)
    state2 = place_state(state2, CFG, mesh)
    shardings = state_sharding(state2, CFG, mesh, False, False, False)
    stepn = make_parallel_train_step(CFG, opt, mesh,
                                     state_shardings=shardings, sam_rho=RHO)
    sp, _ = stepn(state2, shard_batch(batch, mesh), None)

    for a, b in zip(jax.tree.leaves(sd.params), jax.tree.leaves(sp.params)):
        # reduction-order noise through two grad passes + AdamW (see the
        # manual-two-pass test comment)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-6)


def test_cli_sam_flag(tmp_path, capsys):
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--sam-rho", "0.05",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    out = capsys.readouterr().out
    assert "epoch 0" in out or (tmp_path / "c").exists()
