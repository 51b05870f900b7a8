"""Soft-MoE blocks (vitx/nn/moe.py) and expert parallelism.

A beyond-reference model family: Soft Mixture-of-Experts MLPs (Puigcerver
et al. 2023) in the trailing encoder blocks, sharded over a mesh ``expert``
axis. The math is pinned against a naive per-expert Python-loop reference,
the capability surface (probs, rollout, grad-cam) against shapes/finiteness,
and the ep/tp sharded trajectory against single-device — exactly the test
strategy of the dense paths (SURVEY.md §4).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx import ViTConfig
from vitx.nn.moe import init_moe_blocks, soft_moe_mlp
from vitx.nn.vit import (forward, forward_with_attn, forward_with_rollout,
                         init_params, param_count)
from vitx.parallel import (make_mesh, make_parallel_eval_step,
                           make_parallel_train_step, shard_batch)
from vitx.parallel.sharded import place_state
from vitx.train import create_train_state, make_eval_step, make_train_step
from vitx.train.step import make_optimizer

MOE_CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=3, num_heads=4, compute_dtype="float32",
                    moe_experts=4, moe_blocks=2, moe_slots=4)


def _batch(seed, n=16):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {"image": jax.random.normal(k1, (n, 16, 16, 3)),
            "label": jax.random.randint(k2, (n,), 0, 4)}


# ---------------------------------------------------------------------------
# Config surface
# ---------------------------------------------------------------------------

def test_moe_config_defaults():
    cfg = ViTConfig(image_size=16, patch_size=4, embed_dim=32, depth=4,
                    num_heads=4, moe_experts=2)
    assert cfg.moe_block_count == 2          # depth // 2
    assert cfg.dense_block_count == 2
    # total slots ~= seq_len: 17 tokens / 2 experts
    assert cfg.moe_slot_count == 8
    # off -> all zero
    dense = cfg.replace(moe_experts=0)
    assert dense.moe_block_count == 0 and dense.moe_slot_count == 0
    assert dense.dense_block_count == dense.depth
    # JSON round-trip carries the MoE fields
    rt = ViTConfig.from_json(cfg.to_json())
    assert rt == cfg


def test_moe_config_validation():
    kw = dict(image_size=16, patch_size=4, embed_dim=32, depth=2,
              num_heads=4)
    with pytest.raises(ValueError, match="moe_blocks > 0 needs"):
        ViTConfig(moe_blocks=1, **kw)
    with pytest.raises(ValueError, match="exceeds depth"):
        ViTConfig(moe_experts=2, moe_blocks=3, **kw)
    with pytest.raises(ValueError, match="bug_exact"):
        ViTConfig(moe_experts=2, parity="bug_exact", **kw)
    with pytest.raises(ValueError, match="lora_rank"):
        ViTConfig(moe_experts=2, lora_rank=4, **kw)
    with pytest.raises(ValueError, match="tome_r"):
        ViTConfig(moe_experts=2, tome_r=1, **kw)


# ---------------------------------------------------------------------------
# Math: the einsum layer vs a naive per-expert loop
# ---------------------------------------------------------------------------

def test_soft_moe_matches_loop_reference():
    cfg = MOE_CFG
    bp_stack = init_moe_blocks(jax.random.PRNGKey(3), cfg)
    bp = jax.tree.map(lambda a: a[0], bp_stack)
    h = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.seq_len,
                                                  cfg.embed_dim))

    got = np.asarray(soft_moe_mlp(h, bp, cfg))

    # naive reference: explicit l2-norms, softmaxes, per-expert loop
    x = np.asarray(h, np.float64)
    phi = np.asarray(bp["phi"], np.float64)            # (E, n, s)
    xn = x / np.sqrt((x ** 2).sum(-1, keepdims=True) + 1e-6)
    phin = phi / np.sqrt((phi ** 2).sum(0, keepdims=True) + 1e-6)
    logits = float(bp["router_scale"]) * np.einsum("bte,ens->btns", xn, phin)
    B, T, n, s = logits.shape
    ex = np.exp(logits - logits.max(axis=1, keepdims=True))
    disp = ex / ex.sum(axis=1, keepdims=True)          # softmax over tokens
    flat = logits.reshape(B, T, n * s)
    ex2 = np.exp(flat - flat.max(axis=-1, keepdims=True))
    comb = (ex2 / ex2.sum(axis=-1, keepdims=True)).reshape(B, T, n, s)

    y = np.zeros_like(x)
    for e in range(n):
        slots = np.einsum("bte,bts->bse", x, disp[:, :, e, :])
        h1 = slots @ np.asarray(bp["ew1"][e], np.float64) \
            + np.asarray(bp["eb1"][e], np.float64)
        h1 = 0.5 * h1 * (1.0 + np.vectorize(math.erf)(h1 / np.sqrt(2.0)))
        ys = h1 @ np.asarray(bp["ew2"][e], np.float64) \
            + np.asarray(bp["eb2"][e], np.float64)
        y += np.einsum("bse,bts->bte", ys, comb[:, :, e, :])
    np.testing.assert_allclose(got, y, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Model surface
# ---------------------------------------------------------------------------

def test_moe_param_count_scales_with_experts():
    p1 = init_params(jax.random.PRNGKey(0), MOE_CFG)
    p2 = init_params(jax.random.PRNGKey(0),
                     MOE_CFG.replace(moe_experts=8, moe_slots=4))
    E, M, k = MOE_CFG.embed_dim, MOE_CFG.mlp_dim, MOE_CFG.moe_block_count
    s = MOE_CFG.moe_slot_count
    per_expert = k * (E * M + M + M * E + E + E * s)  # expert MLP + phi cols
    assert param_count(p2) - param_count(p1) == 4 * per_expert
    assert "moe_blocks" in p1 and "w1" not in p1["moe_blocks"]
    # the dense stack holds only the leading blocks
    assert p1["blocks"]["wqkv"].shape[0] == MOE_CFG.dense_block_count


def test_moe_forward_probs_rollout_gradcam():
    cfg = MOE_CFG
    p = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    lg = forward(p, x, cfg)
    assert lg.shape == (2, 4) and bool(jnp.isfinite(lg).all())
    # probs span dense + MoE segments
    lg2, probs = forward_with_attn(p, x, cfg)
    assert probs.shape == (cfg.depth, 2, cfg.num_heads, cfg.seq_len,
                           cfg.seq_len)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg), rtol=1e-5)
    # fused rollout runs through both scans, rows normalized
    lg3, w = forward_with_rollout(p, x, cfg)
    assert w.shape == (2, cfg.num_patches)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    # grad-cam differentiates through the LAST (MoE) block
    from vitx.nn.saliency import grad_cam

    heat, lg4 = grad_cam(p, x, cfg, class_idx=1)
    assert heat.shape == (2, cfg.num_patches)
    assert bool(jnp.isfinite(heat).all())
    np.testing.assert_allclose(np.asarray(lg4), np.asarray(lg), rtol=1e-5)


def test_moe_overfits_one_batch():
    cfg = MOE_CFG
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = _batch(0, n=8)
    first = None
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < 0.25 * first, (first, last)
    # experts actually moved (gradients reach the MoE weights)
    p0 = init_params(jax.random.PRNGKey(0), cfg)
    delta = float(jnp.linalg.norm(state.params["moe_blocks"]["ew1"]
                                  - p0["moe_blocks"]["ew1"]))
    assert delta > 0


# ---------------------------------------------------------------------------
# Expert parallelism (needs the 8-device CPU mesh)
# ---------------------------------------------------------------------------

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _single_device_moe(n_steps=3):
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), MOE_CFG, opt)
    step = make_train_step(MOE_CFG, opt)
    losses = []
    for i in range(n_steps):
        state, m = step(state, _batch(i), None)
        losses.append(float(m["loss"]))
    return losses, state


@needs_mesh
@pytest.mark.parametrize("dp,tp,ep", [(4, 1, 2), (2, 2, 2)])
def test_moe_ep_matches_single_device(dp, tp, ep):
    """dp x tp x ep training: trajectory-exact vs single device, with the
    expert weights genuinely sharded over the expert axis."""
    ref_losses, ref_state = _single_device_moe()

    mesh = make_mesh(dp=dp, tp=tp, ep=ep)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), MOE_CFG, opt)
    state = place_state(state, MOE_CFG, mesh, tp=tp > 1, ep=True)
    ew1 = state.params["moe_blocks"]["ew1"]
    assert ew1.sharding.spec[1] == "expert"
    k, n, E, M = ew1.shape
    shapes = {s.data.shape for s in ew1.addressable_shards}
    exp_m = M // tp
    assert shapes == {(k, n // ep, E, exp_m)}

    step = make_parallel_train_step(MOE_CFG, opt, mesh, tp=tp > 1, ep=True)
    losses = []
    for i in range(3):
        state, m = step(state, shard_batch(_batch(i), mesh), None)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(ref_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    eval_single = make_eval_step(MOE_CFG)
    batch = _batch(42, n=32)
    cm_ref, loss_ref = eval_single(ref_state.params, batch)
    eval_ep = make_parallel_eval_step(MOE_CFG, mesh, tp=tp > 1, ep=True)
    cm_ep, loss_ep = eval_ep(state.params, shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(cm_ref), np.asarray(cm_ep))
    np.testing.assert_allclose(float(loss_ref), float(loss_ep), rtol=1e-4)


@needs_mesh
def test_ep_requires_expert_axis_and_moe():
    from vitx.parallel.sharded import ep_cfg

    mesh2 = make_mesh(dp=4, tp=2)
    with pytest.raises(ValueError, match="expert mesh axis"):
        ep_cfg(MOE_CFG, mesh2, ep=True)
    mesh3 = make_mesh(dp=2, tp=1, ep=4)
    dense = MOE_CFG.replace(moe_experts=0, moe_blocks=0, moe_slots=0)
    with pytest.raises(ValueError, match="requires a MoE config"):
        ep_cfg(dense, mesh3, ep=True)
    with pytest.raises(ValueError, match="not divisible"):
        ep_cfg(MOE_CFG.replace(moe_experts=6), mesh3, ep=True)
    assert ep_cfg(MOE_CFG, mesh3, ep=False) is MOE_CFG
    assert ep_cfg(MOE_CFG, mesh3, ep=True).ep is True
