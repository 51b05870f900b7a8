"""Positional-embedding families (cfg.pos_embed: learned / sincos2d / rope).

The reference has only the learned table (vit.py:35-38); sincos2d (MAE,
He et al. 2022 Appendix A) and 2D axial RoPE (EVA-02 / Heo et al. 2024) are
beyond-reference extensions. Both are parameter-free: tables regenerate from
the grid geometry at trace time (vitx/nn/vit.py::sincos_pos_embed /
rope_tables).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.nn.vit import (apply_rope, forward, forward_with_rollout,
                         init_params, rope_tables, sincos_pos_embed)
from vitx.train.step import (create_train_state, make_optimizer,
                             make_train_step)

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")


def _img(seed, n=4, s=16):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, s, s, 3))


# ---------------------------------------------------------------------------
# sincos2d
# ---------------------------------------------------------------------------

def _numpy_sincos2d(E, g):
    """Independent numpy re-derivation of the MAE 2D sin-cos table."""
    q = E // 4
    omega = 1.0 / 10000.0 ** (np.arange(q, dtype=np.float64) / q)
    pos = np.arange(g, dtype=np.float64)
    a = np.outer(pos, omega)                              # (g, E/4)
    axis = np.concatenate([np.sin(a), np.cos(a)], -1)     # (g, E/2)
    out = np.zeros((g * g, E))
    for r in range(g):
        for c in range(g):
            out[r * g + c] = np.concatenate([axis[r], axis[c]])
    return out


def test_sincos_table_matches_numpy_reference():
    cfg = CFG.replace(pos_embed="sincos2d")
    table = np.asarray(sincos_pos_embed(cfg))             # (1, pos_len, E)
    assert table.shape == (1, cfg.pos_len, cfg.embed_dim)
    np.testing.assert_allclose(table[0, :cfg.num_prefix_tokens], 0.0)
    want = _numpy_sincos2d(cfg.embed_dim, cfg.grid_size)
    # atol 1e-5: TPU sin/cos differ from numpy by ~2.5e-6 (chip round 4)
    np.testing.assert_allclose(table[0, cfg.num_prefix_tokens:], want,
                               rtol=0, atol=1e-5)


def test_sincos2d_has_no_pos_leaf_and_trains():
    cfg = CFG.replace(pos_embed="sincos2d")
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "pos_embed" not in params
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = {"image": _img(2, 8), "label": jax.random.randint(
        jax.random.PRNGKey(3), (8,), 0, 4)}
    for _ in range(150):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1


# ---------------------------------------------------------------------------
# rope
# ---------------------------------------------------------------------------

def test_rope_attention_depends_on_relative_offset_only():
    """The rotated q.k dot product must be identical for any two (query,
    key) patch pairs with the same 2D grid offset — RoPE's defining
    property — and differ across offsets."""
    cfg = CFG.replace(pos_embed="rope")
    g, D = cfg.grid_size, cfg.head_dim
    cos, sin = rope_tables(cfg)
    u = jax.random.normal(jax.random.PRNGKey(0), (D,))
    v = jax.random.normal(jax.random.PRNGKey(1), (D,))

    def score(q_rc, k_rc):
        qi = cfg.num_prefix_tokens + q_rc[0] * g + q_rc[1]
        ki = cfg.num_prefix_tokens + k_rc[0] * g + k_rc[1]
        t = jnp.stack([u, v])[None, None]                  # (1,1,2,D)
        r = apply_rope(t, cos[jnp.array([qi, ki])],
                       sin[jnp.array([qi, ki])])
        return float(jnp.dot(r[0, 0, 0], r[0, 0, 1]))

    # same (dr, dc) = (1, 2) offset, three absolute placements
    s1 = score((0, 0), (1, 2))
    s2 = score((1, 1), (2, 3))
    s3 = score((2, 0), (3, 2))
    assert s1 == pytest.approx(s2, rel=1e-5)
    assert s1 == pytest.approx(s3, rel=1e-5)
    # a different offset must score differently
    assert abs(s1 - score((0, 0), (2, 1))) > 1e-4
    # rotation is an isometry: norms preserved
    r = apply_rope(u[None, None, None], cos[5:6], sin[5:6])
    assert float(jnp.linalg.norm(r)) == pytest.approx(
        float(jnp.linalg.norm(u)), rel=1e-6)


def test_rope_zero_angles_on_prefix_and_registers():
    cfg = CFG.replace(pos_embed="rope", num_registers=2)
    cos, sin = rope_tables(cfg)
    assert cos.shape == (cfg.seq_len, cfg.head_dim)
    np.testing.assert_allclose(np.asarray(cos[0]), 1.0)    # CLS: identity
    np.testing.assert_allclose(np.asarray(sin[0]), 0.0)
    np.testing.assert_allclose(np.asarray(cos[-2:]), 1.0)  # registers
    np.testing.assert_allclose(np.asarray(sin[-2:]), 0.0)


@pytest.mark.parametrize("mode", ["sincos2d", "rope"])
def test_position_information_reaches_the_logits(mode):
    """Spatially shuffling the input patches must change the logits (a
    position-free encoder would be permutation-invariant through the CLS
    readout); parameter-free modes carry no pos_embed leaf."""
    cfg = CFG.replace(pos_embed=mode)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "pos_embed" not in params
    img = _img(0, 2)
    P, g = cfg.patch_size, cfg.grid_size
    # roll the patch grid by one row + one column
    shuf = jnp.roll(img.reshape(2, g, P, g, P, 3), (1, 1), axis=(1, 3))
    shuf = shuf.reshape(2, 16, 16, 3)
    a = forward(params, img, cfg)
    b = forward(params, shuf, cfg)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-5


def test_rope_trains_and_rollout_runs():
    cfg = CFG.replace(pos_embed="rope")
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = {"image": _img(2, 8), "label": jax.random.randint(
        jax.random.PRNGKey(3), (8,), 0, 4)}
    for _ in range(150):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1
    logits, roll = forward_with_rollout(state.params, batch["image"], cfg)
    assert roll.shape == (8, cfg.num_patches)
    # rollout rows are CLS-row slices of a row-stochastic matrix over
    # prefix+patches; patch mass is positive and bounded by 1
    s = float(jnp.max(jnp.sum(roll, -1)))
    assert 0.0 < s <= 1.0 + 1e-5


def test_rope_disables_fused_mha_but_not_flash():
    from vitx.nn.vit import _use_fused_mha

    cfg = CFG.replace(pos_embed="rope")
    assert not _use_fused_mha(cfg, {}, False)
    # flash stays reachable: multi_head_attention applies rotation BEFORE
    # the kernel; parity of the two impls on rotated q/k:
    from vitx.nn.attention import multi_head_attention

    E, H = cfg.embed_dim, cfg.num_heads
    x = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.seq_len, E))
    wqkv = jax.random.normal(jax.random.PRNGKey(1),
                             (E, 3, H, E // H)) * 0.05
    wo = jax.random.normal(jax.random.PRNGKey(2), (E, E)) * 0.05
    rope = rope_tables(cfg)
    out_ref, _ = multi_head_attention(x, wqkv, None, wo, None,
                                      num_heads=H, impl="reference",
                                      rope=rope)
    out_none, _ = multi_head_attention(x, wqkv, None, wo, None,
                                       num_heads=H, impl="reference")
    assert float(jnp.max(jnp.abs(out_ref - out_none))) > 1e-5
    # ...and the COMPOSED path is checked for parity, not just difference:
    # the flash kernel (interpret-mode on CPU) consuming the same rotated
    # q/k must reproduce the reference attention output (ADVICE r3)
    out_flash, _ = multi_head_attention(x, wqkv, None, wo, None,
                                        num_heads=H, impl="flash",
                                        rope=rope)
    assert float(jnp.max(jnp.abs(out_flash - out_ref))) < 1e-4


def test_posembed_validation():
    with pytest.raises(ValueError, match="unknown pos_embed"):
        CFG.replace(pos_embed="fourier")
    with pytest.raises(ValueError, match="bug_exact"):
        CFG.replace(pos_embed="sincos2d", parity="bug_exact")
    with pytest.raises(ValueError, match="divisible by 4"):
        CFG.replace(pos_embed="rope", embed_dim=36, num_heads=2)
    with pytest.raises(ValueError, match="tome_r"):
        CFG.replace(pos_embed="rope", tome_r=1)
    with pytest.raises(ValueError, match="patch_drop"):
        CFG.replace(pos_embed="rope", patch_drop=0.5)
    with pytest.raises(ValueError, match="fuse_mha"):
        CFG.replace(pos_embed="rope", fuse_mha="on")
    with pytest.raises(ValueError, match="rope_base"):
        CFG.replace(rope_base=1.0)
    # sincos2d embed_dim quarters
    with pytest.raises(ValueError, match="divisible by 4"):
        ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=30,
                  depth=1, num_heads=2, pos_embed="sincos2d")


def test_pretraining_requires_learned_pos():
    from vitx.nn.mae import MAEConfig, init_mae_params

    mcfg = MAEConfig(encoder=CFG.replace(pos_embed="rope"),
                     decoder_dim=16, decoder_depth=1, decoder_heads=2)
    with pytest.raises(ValueError, match="learned"):
        init_mae_params(jax.random.PRNGKey(0), mcfg)


@pytest.mark.parametrize("mode", ["sincos2d", "rope"])
def test_cli_posembed_roundtrip(tmp_path, capsys, mode):
    """--pos-embed trains, self-describes in the checkpoint meta, and eval
    rebuilds the exact geometry (accuracy reproduced)."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--pos-embed", mode,
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    train_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["accuracy"] == pytest.approx(train_out["val_accuracy"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_rope_dp_trajectory_matches_single_device():
    from vitx.parallel import (make_mesh, make_parallel_train_step,
                               shard_batch)
    from vitx.parallel.sharded import place_state

    cfg = CFG.replace(pos_embed="rope")

    def batch(i):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        return {"image": jax.random.normal(k1, (16, 16, 16, 3)),
                "label": jax.random.randint(k2, (16,), 0, 4)}

    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    ref = []
    for i in range(3):
        state, m = step(state, batch(i), None)
        ref.append(float(m["loss"]))

    mesh = make_mesh(dp=8)
    pstep = make_parallel_train_step(cfg, opt, mesh)
    pstate = place_state(
        create_train_state(jax.random.PRNGKey(0), cfg, opt), cfg, mesh)
    for i in range(3):
        pstate, m = pstep(pstate, shard_batch(batch(i), mesh), None)
        assert float(m["loss"]) == pytest.approx(ref[i], abs=1e-5)
