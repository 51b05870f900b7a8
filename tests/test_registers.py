"""Register tokens (Darcet et al. 2023, "Vision Transformers Need
Registers"): learned tokens that participate in attention but are never
read by a head. vitx appends them AFTER the patch tokens with no positional
rows (attention is permutation-equivariant, so tail placement is equivalent
to the paper's prepended form and keeps every prefix/pos-embed index
unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.nn.rollout import attention_rollout
from vitx.nn.vit import (forward, forward_with_attn, forward_with_rollout,
                         init_params)

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32",
                num_registers=4)


def _images(B=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (B, CFG.image_size, CFG.image_size, 3))


def test_register_params_and_shapes():
    params = init_params(jax.random.PRNGKey(0), CFG)
    assert params["reg_tokens"].shape == (1, 4, CFG.embed_dim)
    # registers carry NO positional rows: pos_embed covers prefix + patches
    assert params["pos_embed"].shape == (1, CFG.pos_len, CFG.embed_dim)
    assert CFG.seq_len == CFG.pos_len + 4

    logits = forward(params, _images(), CFG)
    assert logits.shape == (3, CFG.num_classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_registers_participate_in_attention():
    """The register tokens must change the computation (they are attended
    to by every other token) — and gradients must flow into them."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    x = _images()

    base = np.asarray(forward(params, x, CFG))
    shifted = dict(params)
    # non-uniform perturbation: a constant shift is LayerNorm-invariant
    # and would (correctly) not propagate to other tokens
    shifted["reg_tokens"] = params["reg_tokens"] + jax.random.normal(
        jax.random.PRNGKey(9), params["reg_tokens"].shape)
    assert np.abs(np.asarray(forward(shifted, x, CFG)) - base).max() > 1e-6

    def loss(p):
        return jnp.sum(forward(p, x, CFG) ** 2)
    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["reg_tokens"])).max() > 0


def test_rollout_drops_register_columns():
    """forward_with_rollout returns weights over the PATCH tokens only,
    matching the materialized probs + attention_rollout path."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    x = _images(B=2, seed=3)

    logits_f, w_fused = forward_with_rollout(params, x, CFG)
    assert w_fused.shape == (2, CFG.num_patches)
    np.testing.assert_allclose(np.asarray(w_fused).sum(-1), 1.0, rtol=1e-5)

    logits_m, probs = forward_with_attn(params, x, CFG, probs_mode="mean")
    assert probs.shape == (CFG.depth, 2, CFG.seq_len, CFG.seq_len)
    w_mat = attention_rollout(probs,
                              num_prefix_tokens=CFG.num_prefix_tokens,
                              num_registers=CFG.num_registers)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_m),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_fused), np.asarray(w_mat),
                               rtol=2e-4, atol=1e-7)


def test_registers_train():
    """A register-token model overfits a batch like a plain one; the
    register tokens actually move."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    reg0 = np.asarray(state.params["reg_tokens"]).copy()
    step = make_train_step(CFG, opt)
    batch = {"image": _images(B=8, seed=5),
             "label": jax.random.randint(jax.random.PRNGKey(6), (8,), 0, 4)}
    first = None
    for _ in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        first = float(m["loss"]) if first is None else first
    assert float(m["loss"]) < first * 0.2
    assert np.abs(np.asarray(state.params["reg_tokens"]) - reg0).max() > 1e-5


def test_registers_reject_bug_exact():
    with pytest.raises(ValueError, match="register"):
        ViTConfig(image_size=16, patch_size=4, num_registers=4,
                  parity="bug_exact")


def test_resize_pos_embed_with_registers():
    """Higher-resolution fine-tune: the positional grid resizes, the
    register tokens and prefix rows pass through untouched."""
    from vitx.interop.pretrained import resize_pos_embed

    params = init_params(jax.random.PRNGKey(2), CFG)
    cfg_hi = CFG.replace(image_size=32)
    hi = resize_pos_embed(params, CFG, cfg_hi)
    assert hi["pos_embed"].shape == (1, cfg_hi.pos_len, CFG.embed_dim)
    np.testing.assert_allclose(hi["pos_embed"][0, 0],
                               np.asarray(params["pos_embed"][0, 0]),
                               rtol=1e-6)
    np.testing.assert_allclose(hi["reg_tokens"],
                               np.asarray(params["reg_tokens"]), rtol=1e-6)
    logits = forward(jax.tree.map(jnp.asarray, hi),
                     jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32, 3)),
                     cfg_hi)
    assert logits.shape == (2, 4)


def test_registers_under_dp_mesh():
    """reg_tokens get a replicated PartitionSpec: the sharded train step
    runs and matches the single-device trajectory."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from vitx.parallel import make_mesh
    from vitx.parallel.sharded import (make_parallel_train_step, place_state,
                                       state_sharding)
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    opt = make_optimizer(lr=1e-3)
    batch = {"image": _images(B=8, seed=5),
             "label": jax.random.randint(jax.random.PRNGKey(6), (8,), 0, 4)}

    # the single-device step donates its input state — build each run its
    # own (deterministic) init
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    ref_state, ref_m = make_train_step(CFG, opt)(state, batch,
                                                 jax.random.PRNGKey(1))

    mesh = make_mesh(dp=2)
    pstate = place_state(create_train_state(jax.random.PRNGKey(0), CFG, opt),
                         CFG, mesh)
    shardings = state_sharding(pstate, CFG, mesh, False, False, False)
    pstep = make_parallel_train_step(CFG, opt, mesh,
                                     state_shardings=shardings)
    pstate, pm = pstep(pstate, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(pm["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pstate.params["reg_tokens"]),
        np.asarray(ref_state.params["reg_tokens"]), rtol=1e-5, atol=1e-7)
