"""MAE pretraining tests (vitx/nn/mae.py).

The reference has no self-supervised path (src/train.py is supervised only)
— this is beyond-reference capability, tested to the same standard: exact
masking semantics, loss-decreases e2e, pretrain -> fine-tune transfer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx import MAEConfig, get_config, init_mae_params, mae_forward, forward
from vitx.nn.mae import (create_mae_train_state, mae_to_vit_params,
                         make_mae_train_step, patchify_pixels,
                         random_masking, unpatchify_pixels)
from vitx.train.step import make_optimizer, make_train_step, create_train_state

ENC = get_config("tiny", compute_dtype="float32", final_norm=True)
MCFG = MAEConfig(encoder=ENC, decoder_dim=96, decoder_depth=2,
                 decoder_heads=3, mask_ratio=0.75)


def _images(seed, batch=4):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (batch, ENC.image_size, ENC.image_size, 3),
                             jnp.float32)


def test_random_masking_counts_and_roundtrip():
    ids_keep, ids_restore, mask = random_masking(jax.random.PRNGKey(0), 8,
                                                 MCFG)
    N, K = MCFG.num_patches, MCFG.num_visible
    assert ids_keep.shape == (8, K)
    assert mask.shape == (8, N)
    # exactly num_masked ones per row
    np.testing.assert_array_equal(np.asarray(jnp.sum(mask, axis=1)),
                                  np.full(8, MCFG.num_masked, np.float32))
    # the kept positions are exactly the zeros of the mask
    m = np.asarray(mask)
    for b in range(8):
        kept = set(np.asarray(ids_keep[b]).tolist())
        assert kept == set(np.where(m[b] == 0.0)[0].tolist())
    # different samples get different masks (w.h.p.)
    assert not np.array_equal(m[0], m[1])


def test_patchify_roundtrip_matches_patch_embed_layout():
    imgs = _images(1, batch=2)
    patches = patchify_pixels(imgs, ENC)
    assert patches.shape == (2, MCFG.num_patches, MCFG.patch_dim)
    back = unpatchify_pixels(patches, ENC)
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), rtol=1e-6)


def test_mae_forward_shapes_and_loss():
    params = init_mae_params(jax.random.PRNGKey(0), MCFG)
    loss, pred, mask = mae_forward(params, _images(2), MCFG,
                                   jax.random.PRNGKey(1))
    assert pred.shape == (4, MCFG.num_patches, MCFG.patch_dim)
    assert mask.shape == (4, MCFG.num_patches)
    assert np.isfinite(float(loss))


def test_mae_pretrain_loss_decreases():
    """E2E: MAE loss falls when overfitting one batch under a FIXED mask
    (the MAE twin of test_train_step_reduces_loss). The mask must be held
    fixed: with per-step random masks over pure-noise images the target is
    irreducibly unpredictable and the loss floor is ~1.0 by construction."""
    import optax

    opt = make_optimizer(lr=3e-3)
    state = create_mae_train_state(jax.random.PRNGKey(0), MCFG, opt)
    imgs = _images(3, batch=2)
    rng = jax.random.PRNGKey(1)           # fixed -> fixed mask every step

    @jax.jit
    def step(state, imgs):
        loss, grads = jax.value_and_grad(
            lambda p: mae_forward(p, imgs, MCFG, rng,
                                  deterministic=True)[0])(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state), loss

    first = None
    for _ in range(150):
        state, loss = step(state, imgs)
        if first is None:
            first = float(loss)
    last = float(loss)
    # measured: 1.03 -> 0.011 by step 150 at lr 3e-3 (converges to ~1e-4)
    assert last < first * 0.2, (first, last)

    # the real (per-step-random-mask) train step runs and stays finite
    tstep = make_mae_train_step(MCFG, opt)
    tstate = create_mae_train_state(jax.random.PRNGKey(0), MCFG, opt)
    tstate, m = tstep(tstate, {"image": imgs}, rng)
    assert np.isfinite(float(m["loss"]))
    assert int(tstate.step) == 1


def test_mae_to_vit_transfer_and_finetune():
    """Pretrained encoder transfers into a classifier pytree; a fine-tune
    step runs and the transferred weights are actually used."""
    opt = make_optimizer(lr=1e-3)
    state = create_mae_train_state(jax.random.PRNGKey(0), MCFG, opt)

    vit_params = mae_to_vit_params(state.params, ENC, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(
        np.asarray(vit_params["blocks"]["wqkv"]),
        np.asarray(state.params["encoder"]["blocks"]["wqkv"]))

    imgs = _images(4, batch=2)
    logits = forward(vit_params, imgs, ENC)
    assert logits.shape == (2, ENC.num_classes)

    ft_state = create_train_state(jax.random.PRNGKey(6), ENC, opt)
    ft_state = ft_state._replace(params=vit_params,
                                 opt_state=opt.init(vit_params))
    ft_step = make_train_step(ENC, opt)
    batch = {"image": imgs,
             "label": jnp.array([0, 1], jnp.int32)}
    ft_state, m = ft_step(ft_state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["loss"]))


def test_mae_finetune_cfg_must_have_final_norm():
    import pytest

    opt = make_optimizer(lr=1e-3)
    state = create_mae_train_state(jax.random.PRNGKey(0), MCFG, opt)
    bad = ENC.replace(final_norm=False)
    with pytest.raises(ValueError):
        mae_to_vit_params(state.params, bad, jax.random.PRNGKey(0))


def test_mae_export_init_roundtrip(tmp_path):
    """CLI export path: MAE encoder -> npz -> classifier init. Encoder
    weights survive verbatim; a head with a different class count keeps its
    fresh init (warned, not fatal)."""
    import warnings

    from vitx.cli.pretrain import _flatten_strs, load_vit_init

    opt = make_optimizer(lr=1e-3)
    state = create_mae_train_state(jax.random.PRNGKey(0), MCFG, opt)
    vit_params = mae_to_vit_params(state.params, ENC, jax.random.PRNGKey(1))
    path = tmp_path / "init.npz"
    np.savez(path, **{"/".join(p): np.asarray(leaf)
                      for p, leaf in _flatten_strs(vit_params)})

    loaded = load_vit_init(path, ENC, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(
        np.asarray(loaded["blocks"]["wqkv"]),
        np.asarray(state.params["encoder"]["blocks"]["wqkv"]))

    # different class count: head stays fresh, encoder still transfers
    cfg10 = ENC.replace(num_classes=ENC.num_classes + 3)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loaded10 = load_vit_init(path, cfg10, jax.random.PRNGKey(2))
    assert any("fresh init" in str(x.message) for x in w)
    np.testing.assert_array_equal(
        np.asarray(loaded10["blocks"]["wqkv"]),
        np.asarray(state.params["encoder"]["blocks"]["wqkv"]))


def test_init_from_resizes_pos_embed_for_new_resolution(tmp_path):
    """--init-from at a different image size bilinearly resizes the saved
    positional grid (the standard higher-resolution fine-tune trick) instead
    of dropping it to fresh init; CLS row passes through exactly and the
    model runs at the new resolution."""
    import warnings

    from vitx.cli.pretrain import _flatten_strs, load_vit_init

    opt = make_optimizer(lr=1e-3)
    state = create_mae_train_state(jax.random.PRNGKey(0), MCFG, opt)
    vit_params = mae_to_vit_params(state.params, ENC, jax.random.PRNGKey(1))
    path = tmp_path / "init.npz"
    np.savez(path, **{"/".join(p): np.asarray(leaf)
                      for p, leaf in _flatten_strs(vit_params)})

    hi = ENC.replace(image_size=ENC.image_size * 2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loaded = load_vit_init(path, hi, jax.random.PRNGKey(2))
    assert any("pos_embed resized" in str(x.message) for x in w)
    # pos_embed must NOT be in any "fresh init" warning
    assert not any("fresh init" in str(x.message)
                   and "pos_embed" in str(x.message) for x in w)

    pe = np.asarray(loaded["pos_embed"])
    assert pe.shape == (1, hi.pos_len, hi.embed_dim)
    # CLS slot passes through the resize untouched
    np.testing.assert_array_equal(
        pe[:, 0], np.asarray(vit_params["pos_embed"][:, 0]))
    # encoder weights still transfer verbatim
    np.testing.assert_array_equal(
        np.asarray(loaded["blocks"]["wqkv"]),
        np.asarray(state.params["encoder"]["blocks"]["wqkv"]))
    # grid corners map to grid corners under bilinear resize
    g_from, g_to, E = ENC.grid_size, hi.grid_size, ENC.embed_dim
    src = np.asarray(vit_params["pos_embed"][0, 1:]).reshape(g_from, g_from, E)
    dst = pe[0, 1:].reshape(g_to, g_to, E)
    np.testing.assert_allclose(dst[0, 0], src[0, 0], rtol=0, atol=1e-5)

    # and the model runs at the new resolution with the resized embedding
    imgs = jax.random.normal(jax.random.PRNGKey(3),
                             (2, hi.image_size, hi.image_size, 3),
                             jnp.float32)
    logits = forward(loaded, imgs, hi)
    assert logits.shape == (2, hi.num_classes)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_mae_batch_sharded_matches_unsharded():
    """MAE forward under a dp=8 mesh (batch-sharded) matches the unsharded
    loss — all gathers/scans shard cleanly over the batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitx.parallel import make_mesh

    params = init_mae_params(jax.random.PRNGKey(0), MCFG)
    imgs = _images(5, batch=8)
    rng = jax.random.PRNGKey(2)
    ref_loss, _, _ = jax.jit(
        lambda p, x: mae_forward(p, x, MCFG, rng, deterministic=True))(
            params, imgs)

    mesh = make_mesh(dp=8, tp=1)
    xs = jax.device_put(imgs, NamedSharding(mesh, P("data", None, None,
                                                    None)))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    loss, _, _ = jax.jit(
        lambda p, x: mae_forward(p, x, MCFG, rng, deterministic=True))(
            ps, xs)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_mae_train_step_dp_sharded_trajectory_matches():
    """One MAE train step under a dp=8 mesh (batch sharded, state
    replicated) matches the single-device trajectory."""
    import pytest

    if len(jax.device_count() * [0]) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitx.parallel import make_mesh, shard_batch

    opt = make_optimizer(lr=1e-3)
    rng = jax.random.PRNGKey(2)
    imgs = _images(6, batch=8)
    step = make_mae_train_step(MCFG, opt)

    ref = create_mae_train_state(jax.random.PRNGKey(0), MCFG, opt)
    ref, m_ref = step(ref, {"image": imgs}, rng)

    mesh = make_mesh(dp=8, tp=1)
    st = create_mae_train_state(jax.random.PRNGKey(0), MCFG, opt)
    st = jax.device_put(st, NamedSharding(mesh, P()))
    sharded_imgs = shard_batch({"image": imgs}, mesh)["image"]
    st, m_sh = step(st, {"image": sharded_imgs}, rng)

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    # cross-shard grad reduction order differs from the single-device sum;
    # Adam's normalization amplifies ulp-level grad noise into ~1e-5-scale
    # param deltas after one step — same tolerance class as the padded-batch
    # trajectory test in test_trainer.py
    np.testing.assert_allclose(
        np.asarray(st.params["encoder"]["blocks"]["wqkv"]),
        np.asarray(ref.params["encoder"]["blocks"]["wqkv"]),
        rtol=5e-4, atol=2e-5)


def test_pretrain_cli_resumes(tmp_path, capsys):
    from vitx.cli.pretrain import main as pretrain_main

    args = ["--preset", "tiny", "--data", "synthetic", "--epochs", "1",
            "--batch-size", "64", "--decoder-dim", "96",
            "--decoder-depth", "2", "--decoder-heads", "3",
            "--checkpoint-dir", str(tmp_path / "mae")]
    assert pretrain_main(args) == 0
    out1 = capsys.readouterr().out
    assert "epoch 0" in out1
    # re-run with more epochs: must resume at epoch 1, not redo epoch 0
    args[args.index("--epochs") + 1] = "2"
    assert pretrain_main(args) == 0
    out2 = capsys.readouterr().out
    assert "resumed MAE pretraining at epoch 1" in out2
    assert "epoch 0:" not in out2 and "epoch 1:" in out2
