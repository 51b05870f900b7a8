"""Optimizer choices (make_optimizer optimizer=, vitx/train/step.py)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.train.step import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

CFG = ViTConfig(image_size=32, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")


@pytest.mark.parametrize("name,lr,steps", [("sgd", 0.02, 150),
                                           ("lion", 3e-4, 60)])
def test_optimizer_overfits_and_differs_from_adamw(name, lr, steps):
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (8, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 4)}
    finals = {}
    for opt_name, opt_lr in (("adamw", 3e-3), (name, lr)):
        opt = make_optimizer(lr=opt_lr, optimizer=opt_name)
        state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
        step = make_train_step(CFG, opt)
        for _ in range(steps):
            state, m = step(state, batch, jax.random.PRNGKey(1))
        finals[opt_name] = float(m["loss"])
    assert finals[name] < 0.5, finals          # converges on one batch
    assert finals[name] != finals["adamw"]     # distinct trajectory


def test_unknown_optimizer_rejected():
    with pytest.raises(ValueError, match="unknown optimizer"):
        make_optimizer(optimizer="adam")


def test_cli_optimizer_roundtrip_with_ema(tmp_path, capsys):
    """A lion + EMA run must checkpoint its chain and restore in eval (the
    meta-driven optimizer-template rebuild, now keyed on meta['optimizer'])."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-4", "--optimizer", "lion",
        "--ema-decay", "0.99",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    train_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # eval restores the EMA shadow and must reproduce the trainer's own
    # val_accuracy exactly (the template-alignment pin, as for adamw)
    assert out["accuracy"] == pytest.approx(train_out["val_accuracy"])


def test_adafactor_overfits():
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (8, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 4)}
    opt = make_optimizer(lr=3e-3, optimizer="adafactor")
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    for _ in range(80):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1


def test_adafactor_memory_is_factored():
    """The point of adafactor: second-moment statistics are ROW+COL factored
    for big matrices (>=128 per dim), so optimizer memory is sublinear in
    params — vs adamw's 2x fp32."""
    cfg = CFG.replace(embed_dim=256, num_heads=4)   # mlp 256x1024: factored
    opt = make_optimizer(lr=1e-3, optimizer="adafactor")
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    n_opt = sum(x.size for x in jax.tree.leaves(state.opt_state))
    n_par = sum(x.size for x in jax.tree.leaves(state.params))
    adamw_state = create_train_state(jax.random.PRNGKey(0), cfg,
                                     make_optimizer(lr=1e-3))
    n_adamw = sum(x.size for x in jax.tree.leaves(adamw_state.opt_state))
    assert n_adamw >= 2 * n_par            # adamw: mu + nu
    assert n_opt < 0.25 * n_adamw          # factored stats, no mu


def test_mu_dtype_bf16_halves_first_moment():
    opt = make_optimizer(lr=3e-3, mu_dtype="bfloat16")
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    bf16 = [x for x in jax.tree.leaves(state.opt_state)
            if x.dtype == jnp.bfloat16]
    n_par = len(jax.tree.leaves(state.params))
    assert len(bf16) == n_par              # every mu leaf, nothing else
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (8, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 4)}
    step = make_train_step(CFG, opt)
    for _ in range(60):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1
    with pytest.raises(ValueError, match="adamw moments only"):
        make_optimizer(optimizer="lion", mu_dtype="bfloat16")


def test_mu_dtype_wins_over_fused_kernel():
    """fused=True + mu_dtype falls back to the unfused chain (the Pallas
    AdamW kernel keeps fp32 moments): the dtype request is honored, same
    silent-fallback convention as fused+ema/llrd."""
    opt = make_optimizer(lr=3e-3, fused=True, mu_dtype="bfloat16")
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    bf16 = [x for x in jax.tree.leaves(state.opt_state)
            if x.dtype == jnp.bfloat16]
    assert len(bf16) == len(jax.tree.leaves(state.params))


def test_cli_adafactor_roundtrip(tmp_path, capsys):
    """adafactor checkpoints restore through the meta-driven optimizer
    template in eval (meta['optimizer'] = 'adafactor')."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--optimizer", "adafactor",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    train_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["accuracy"] == pytest.approx(train_out["val_accuracy"])


@pytest.mark.parametrize("name", ["adamw", "sgd", "lion", "adafactor"])
def test_wd_exclude_decays_matrix_weights_only(name):
    """With wd_exclude, a zero-gradient update must move ONLY the matrix
    weights (pure decay term); biases, LN scales/biases, cls/pos embeddings
    stay bit-identical. Without it, adamw decays everything (the reference
    train.py:66 semantics the default preserves)."""
    from vitx.train.step import weight_decay_mask

    opt = make_optimizer(lr=0.1, weight_decay=0.5, optimizer=name,
                         wd_exclude=True)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    zero_g = jax.tree.map(jnp.zeros_like, state.params)
    updates, _ = opt.update(zero_g, state.opt_state, state.params)
    mask = weight_decay_mask(state.params)

    def check(path, u, m):
        moved = bool(jnp.any(u != 0))
        name_ = str(path[-1].key)
        if m:
            assert moved, f"decayed leaf did not move: {name_}"
        else:
            assert not moved, f"excluded leaf moved under wd_exclude: {name_}"
    jax.tree_util.tree_map_with_path(check, updates, mask)

    # mask sanity on this tree: matrix weights in, everything else out
    flat = {str(p[-1].key): v for p, v in
            jax.tree_util.tree_flatten_with_path(mask)[0]}
    assert flat["wqkv"] and flat["w1"] and flat["kernel"] and flat["w2"]
    assert not (flat["pos_embed"] or flat["cls_token"] or flat["bo"]
                or flat["ln1_scale"] or flat["ln_bias"] or flat["b1"])


def test_wd_exclude_default_off_decays_everything():
    opt = make_optimizer(lr=0.1, weight_decay=0.5)   # default: no mask
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    zero_g = jax.tree.map(jnp.zeros_like, state.params)
    updates, _ = opt.update(zero_g, state.opt_state, state.params)
    # every nonzero param decays (zero-init leaves like biases stay zero)
    moved = jax.tree.map(
        lambda u, p: bool(jnp.any(u != 0)) or not bool(jnp.any(p != 0)),
        updates, state.params)
    assert all(jax.tree.leaves(moved))


def test_cli_wd_exclude_roundtrip(tmp_path, capsys):
    """--wd-exclude trains, checkpoints and restores through eval (the
    mask is state-shape-neutral, so the default optimizer template fits)."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--wd-exclude",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    train_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["accuracy"] == pytest.approx(train_out["val_accuracy"])
