"""LayerScale (CaiT, Touvron et al. 2021): learned per-channel diagonal
gains on both residual branches — ``x + ls1*MHA(LN1 x); x + ls2*MLP(LN2 x)``
— initialized to a small constant so deep encoders start near-identity.

Beyond-reference extension (the reference has no LayerScale); applied
outside the fused kernels so every attention/MLP path is unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.nn.vit import forward, forward_with_rollout, init_params

CFG_OFF = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=3, num_heads=2, compute_dtype="float32")
CFG_LS = CFG_OFF.replace(layerscale_init=1e-1)


def _images(B=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (B, CFG_OFF.image_size, CFG_OFF.image_size, 3))


def _with_unit_ls(params, cfg):
    """Attach ls=1 leaves to a layerscale-off param tree (the ls leaves are
    constant-initialized and consume no rng keys, so everything else is
    bit-identical between the two configs)."""
    b = dict(params["blocks"])
    b["ls1"] = jnp.ones((cfg.depth, cfg.embed_dim), jnp.float32)
    b["ls2"] = jnp.ones((cfg.depth, cfg.embed_dim), jnp.float32)
    return {**params, "blocks": b}


def test_params_and_validation():
    params = init_params(jax.random.PRNGKey(0), CFG_LS)
    L, E = CFG_LS.depth, CFG_LS.embed_dim
    assert params["blocks"]["ls1"].shape == (L, E)
    np.testing.assert_allclose(np.asarray(params["blocks"]["ls2"]), 1e-1)
    with pytest.raises(ValueError, match="layerscale_init"):
        CFG_OFF.replace(layerscale_init=-1.0)
    with pytest.raises(ValueError, match="layerscale"):
        ViTConfig(image_size=16, patch_size=4, layerscale_init=1e-5,
                  parity="bug_exact")


def test_unit_gain_is_identity():
    """ls=1 must reproduce the layerscale-off forward bit-exactly — the
    scaling is a pure diagonal gain on the branch output."""
    params = init_params(jax.random.PRNGKey(1), CFG_OFF)
    x = _images()
    base = np.asarray(forward(params, x, CFG_OFF))
    unit = np.asarray(forward(_with_unit_ls(params, CFG_OFF), x, CFG_LS))
    np.testing.assert_array_equal(base, unit)


def test_small_init_starts_near_identity():
    """With a tiny init the encoder's residual branches barely perturb the
    stream: logits shrink toward the zero-head output, and the gap to the
    ls-free model is large."""
    p_ls = init_params(jax.random.PRNGKey(2), CFG_LS.replace(
        layerscale_init=1e-6))
    x = _images()
    cfg6 = CFG_LS.replace(layerscale_init=1e-6)
    out = np.asarray(forward(p_ls, x, cfg6))
    # zero out the gains entirely -> pure skip-connection encoder
    b = dict(p_ls["blocks"])
    b["ls1"] = jnp.zeros_like(b["ls1"])
    b["ls2"] = jnp.zeros_like(b["ls2"])
    skip = np.asarray(forward({**p_ls, "blocks": b}, x, cfg6))
    np.testing.assert_allclose(out, skip, rtol=1e-3, atol=1e-4)


def test_gains_receive_gradients_and_model_trains():
    import optax

    cfg = CFG_LS
    params = init_params(jax.random.PRNGKey(3), cfg)
    x = _images(B=8, seed=4)
    y = jnp.arange(8) % cfg.num_classes

    def loss_fn(p):
        logits = forward(p, x, cfg)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["blocks"]["ls1"]).sum()) > 0
    assert float(jnp.abs(g["blocks"]["ls2"]).sum()) > 0

    opt = optax.adamw(3e-3)
    state = opt.init(params)
    l0 = float(loss_fn(params))
    for _ in range(30):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < 0.5 * l0


def _with_const_ls(params, cfg, value):
    b = dict(params["blocks"])
    b["ls1"] = jnp.full((cfg.depth, cfg.embed_dim), value, jnp.float32)
    b["ls2"] = jnp.full((cfg.depth, cfg.embed_dim), value, jnp.float32)
    return {**params, "blocks": b}


def test_rollout_and_tome_paths_apply_gains():
    """The instrumented paths (rollout, ToMe) must see the same gains as the
    plain forward: unit gains == off-model on each path, AND a non-unit gain
    must change the output (unit-only checks can't detect a dropped gain
    application — both sides would be the identity)."""
    params = init_params(jax.random.PRNGKey(5), CFG_OFF)
    x = _images()
    pl = _with_unit_ls(params, CFG_OFF)
    ph = _with_const_ls(params, CFG_OFF, 0.5)

    lo, wo = forward_with_rollout(params, x, CFG_OFF)
    ll, wl = forward_with_rollout(pl, x, CFG_LS)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(ll))
    np.testing.assert_array_equal(np.asarray(wo), np.asarray(wl))
    lh, _ = forward_with_rollout(ph, x, CFG_LS)
    assert np.max(np.abs(np.asarray(lh) - np.asarray(lo))) > 1e-3

    cfg_t_off = CFG_OFF.replace(tome_r=1)
    cfg_t_ls = CFG_LS.replace(tome_r=1)
    to = np.asarray(forward(params, x, cfg_t_off))
    tl = np.asarray(forward(pl, x, cfg_t_ls))
    np.testing.assert_array_equal(to, tl)
    th = np.asarray(forward(ph, x, cfg_t_ls))
    assert np.max(np.abs(th - to)) > 1e-3


def test_pt_export_rejects_layerscale_params():
    from vitx.interop.torch_ref import export_reference_state_dict

    cfg = CFG_LS.replace(head_type="reference")
    params = init_params(jax.random.PRNGKey(7), cfg)
    with pytest.raises(ValueError, match="LayerScale"):
        export_reference_state_dict(params, cfg)


def test_dp_mesh_trajectory_matches_single_device():
    """LayerScale training under a dp mesh is trajectory-identical to the
    single-device step (the ls leaves are replicated)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from vitx.parallel import make_mesh
    from vitx.parallel.sharded import (make_parallel_train_step, place_state,
                                       state_sharding)
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    cfg = CFG_LS
    opt = make_optimizer(lr=1e-3)
    batch = {"image": _images(B=8, seed=9),
             "label": jax.random.randint(jax.random.PRNGKey(10), (8,), 0,
                                         cfg.num_classes)}
    state = create_train_state(jax.random.PRNGKey(8), cfg, opt)
    ref_state, ref_m = make_train_step(cfg, opt)(state, batch,
                                                 jax.random.PRNGKey(1))

    mesh = make_mesh(dp=2)
    pstate = place_state(create_train_state(jax.random.PRNGKey(8), cfg, opt),
                         cfg, mesh)
    shardings = state_sharding(pstate, cfg, mesh, False, False, False)
    pstep = make_parallel_train_step(cfg, opt, mesh,
                                     state_shardings=shardings)
    pstate, pm = pstep(pstate, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(pm["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pstate.params["blocks"]["ls1"]),
        np.asarray(ref_state.params["blocks"]["ls1"]), rtol=1e-5, atol=1e-7)
