"""Conv-stem ViT tests (cfg.stem="conv" — Xiao et al. 2021 hybrid family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx import forward, get_config, init_params
from vitx.core.config import ViTConfig
from vitx.train import create_train_state, make_train_step
from vitx.train.step import make_optimizer

CFG = ViTConfig(image_size=64, patch_size=8, num_classes=4, embed_dim=64,
                depth=2, num_heads=4, stem="conv", compute_dtype="float32")


def test_conv_stem_shapes_and_params():
    params = init_params(jax.random.PRNGKey(0), CFG)
    # log2(8) = 3 convs + proj
    assert set(params["patch_embed"]) == {"conv0", "conv1", "conv2", "proj"}
    assert params["patch_embed"]["conv0"]["kernel"].shape == (3, 3, 3, 16)
    assert params["patch_embed"]["conv2"]["kernel"].shape == (3, 3, 32, 64)
    assert params["patch_embed"]["proj"]["kernel"].shape == (1, 1, 64, 64)

    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    logits = forward(params, imgs, CFG)
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_conv_stem_trains_and_stem_gets_gradients():
    opt = make_optimizer(lr=1e-3, grad_clip=1.0)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    batch = {"image": jax.random.normal(k1, (8, 64, 64, 3)),
             "label": jax.random.randint(k2, (8,), 0, 4)}
    before = np.asarray(state.params["patch_embed"]["conv0"]["kernel"])
    first = None
    for _ in range(120):
        state, m = step(state, batch, jax.random.PRNGKey(3))
        if first is None:
            first = float(m["loss"])
    # measured (CPU f32): 1.36 -> 0.0006 by step 120 at lr 1e-3+clip
    assert float(m["loss"]) < first * 0.2
    after = np.asarray(state.params["patch_embed"]["conv0"]["kernel"])
    assert not np.array_equal(before, after)   # stem actually learns


def test_conv_stem_validation():
    with pytest.raises(ValueError):
        ViTConfig(image_size=60, patch_size=12, num_classes=4, embed_dim=64,
                  depth=2, num_heads=4, stem="conv")
    with pytest.raises(ValueError):
        get_config("tiny", stem="nope")


def test_conv_stem_mae_pretrains():
    """The MAE family composes with the conv stem (patch_embed is the only
    stem-aware seam)."""
    from vitx import MAEConfig
    from vitx.nn.mae import create_mae_train_state, make_mae_train_step

    enc = CFG.replace(final_norm=True)
    mcfg = MAEConfig(encoder=enc, decoder_dim=64, decoder_depth=1,
                     decoder_heads=2, mask_ratio=0.75)
    opt = make_optimizer(lr=1e-3)
    state = create_mae_train_state(jax.random.PRNGKey(0), mcfg, opt)
    step = make_mae_train_step(mcfg, opt)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3),
                             jnp.float32)
    state, m = step(state, {"image": imgs}, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_conv_stem_sharded_trajectory_matches():
    """Conv-stem params shard cleanly (param_pspecs builds the stem
    structure); one dp/tp/zero3 step each matches single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from vitx.parallel import make_mesh, make_parallel_train_step, shard_batch
    from vitx.parallel.sharded import place_state, state_sharding
    from vitx.train.step import make_train_step

    small = CFG.replace(image_size=16, patch_size=4, embed_dim=32, depth=2,
                        num_heads=4)
    opt = make_optimizer(lr=1e-3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    host_batch = {"image": jax.random.normal(k1, (16, 16, 16, 3)),
                  "label": jax.random.randint(k2, (16,), 0, 4)}
    ref = create_train_state(jax.random.PRNGKey(0), small, opt)
    ref, m_ref = make_train_step(small, opt)(ref, host_batch,
                                             jax.random.PRNGKey(3))

    for mode in ("dp", "tp", "zero3"):
        mesh = make_mesh(dp=4 if mode == "tp" else 8,
                         tp=2 if mode == "tp" else 1)
        st = create_train_state(jax.random.PRNGKey(0), small, opt)
        kw = dict(tp=mode == "tp", zero3=mode == "zero3")
        st = place_state(st, small, mesh, **kw)
        sh = (state_sharding(st, small, mesh, tp=False, zero1=True,
                             zero3=True) if mode == "zero3" else None)
        step = make_parallel_train_step(small, opt, mesh,
                                        state_shardings=sh, **kw)
        st, m = step(st, shard_batch(host_batch, mesh),
                     jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                                   rtol=1e-5, err_msg=mode)
