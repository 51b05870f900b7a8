"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

Kernel-vs-jnp-reference parity in fp32, including the instrumented
attention-probs output and the custom-VJP backward (SURVEY.md §4 test plan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.kernels.flash_attention import (
    flash_attention,
    flash_attention_with_probs,
)
from vitx.nn.attention import reference_attention


def _qkv(seed, B=2, H=3, T=65, D=16, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, H, T, D)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("T", [8, 65, 130, 197])
def test_flash_forward_matches_reference(T):
    q, k, v = _qkv(0, T=T)
    out = flash_attention(q, k, v)
    ref, _ = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flash_probs_match_reference():
    q, k, v = _qkv(1, T=65)
    out, probs = flash_attention_with_probs(q, k, v)
    ref, ref_probs = reference_attention(q, k, v, return_probs=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               rtol=1e-5, atol=1e-6)
    rows = np.asarray(jnp.sum(probs, axis=-1))
    np.testing.assert_allclose(rows, np.ones_like(rows), rtol=1e-5)


@pytest.mark.parametrize("T", [8, 65, 130])
def test_flash_backward_matches_reference(T):
    q, k, v = _qkv(2, B=1, H=2, T=T, D=16)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(reference_attention(q, k, v)[0]))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_flash_softmax_stability():
    """Huge logits must not overflow (C softmax did, vit.c:215-229)."""
    q, k, v = _qkv(3, T=16, D=8)
    q = q * 1e4
    out = flash_attention(q, k, v)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flash_bf16_io():
    q, k, v = _qkv(4, T=65, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref, _ = reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_model_forced_flash_matches_reference_impl():
    """Whole-model parity with attn_impl pinned to the Pallas kernel."""
    from vitx import ViTConfig, forward, init_params

    cfg = ViTConfig(image_size=32, patch_size=8, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    a = forward(params, x, cfg.replace(attn_impl="reference"))
    b = forward(params, x, cfg.replace(attn_impl="flash"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_fused_layer_norm_matches_jnp():
    from vitx.kernels.layer_norm import fused_add_layer_norm, fused_layer_norm
    from vitx.nn.layers import _jnp_layer_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32) * 3
    r = jax.random.normal(jax.random.PRNGKey(1), (64, 128), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(3), (128,), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(fused_layer_norm(x, s, b)),
        np.asarray(_jnp_layer_norm(x, s, b)), rtol=1e-5, atol=1e-5)

    summed, y = fused_add_layer_norm(x, r, s, b)
    np.testing.assert_allclose(np.asarray(summed), np.asarray(x + r),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_jnp_layer_norm(x + r, s, b)),
                               rtol=1e-5, atol=1e-5)

    # gradients (custom VJP with Pallas backward)
    def f_fused(x, s, b):
        return jnp.sum(jnp.sin(fused_layer_norm(x, s, b)))

    def f_ref(x, s, b):
        return jnp.sum(jnp.sin(_jnp_layer_norm(x, s, b)))

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, s, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, s, b)
    for a, c, name in zip(gf, gr, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_probs_paths_are_differentiable():
    """Training with probs instrumentation enabled must work: the
    instrumented kernels carry a VJP that differentiates the XLA reference
    attention (VERDICT r1 weak #4 — previously a hard error)."""
    from vitx.kernels.flash_attention import flash_attention_with_mean_probs

    q, k, v = _qkv(3, T=65)

    def loss_full(q, k, v):
        o, p = flash_attention_with_probs(q, k, v)
        return jnp.sum(o.astype(jnp.float32)) + jnp.sum(p * p)

    def loss_ref(q, k, v):
        o, p = reference_attention(q, k, v, return_probs=True)
        return jnp.sum(o.astype(jnp.float32)) + jnp.sum(p * p)

    g = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def loss_mean(q, k, v):
        o, p = flash_attention_with_mean_probs(q, k, v)
        return jnp.sum(o.astype(jnp.float32)) + jnp.sum(p * p)

    def loss_mean_ref(q, k, v):
        o, p = reference_attention(q, k, v, return_probs=True)
        return jnp.sum(o.astype(jnp.float32)) + jnp.sum(
            jnp.mean(p, axis=1) ** 2)

    g = jax.grad(loss_mean, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_mean_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_forward_with_attn_is_differentiable_end_to_end():
    """jax.grad through forward_with_attn (the reference's attention_probs
    sit in its autograd graph — parity of capability)."""
    from vitx import ViTConfig, forward_with_attn, init_params

    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=64,
                    depth=2, num_heads=2, compute_dtype="float32",
                    attn_impl="flash")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))

    def loss(params):
        logits, probs = forward_with_attn(params, x, cfg)
        return jnp.mean(logits ** 2) + jnp.mean(probs)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)
    assert any(float(jnp.max(jnp.abs(a))) > 0 for a in flat)


def test_fused_mha_block_matches_composed():
    """The fused LN->QKV->attn->proj kernel (fuse_mha='on') must match the
    composed path (fuse_mha='off') in both values and gradients."""
    from vitx import ViTConfig, forward, init_params
    from vitx.train.step import cross_entropy_loss

    cfg_on = ViTConfig(image_size=16, patch_size=4, num_classes=4,
                       embed_dim=64, depth=2, num_heads=2,
                       compute_dtype="float32", fuse_mha="on")
    cfg_off = cfg_on.replace(fuse_mha="off")
    params = init_params(jax.random.PRNGKey(0), cfg_on)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (3,), 0, 4)

    a = forward(params, x, cfg_on)
    b = forward(params, x, cfg_off)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    def loss(params, cfg):
        return cross_entropy_loss(forward(params, x, cfg), labels)

    ga = jax.grad(loss)(params, cfg_on)
    gb = jax.grad(loss)(params, cfg_off)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-6)


def test_fused_mha_block_no_proj_bias():
    from vitx import ViTConfig, forward, init_params

    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4,
                    embed_dim=64, depth=2, num_heads=2,
                    compute_dtype="float32", fuse_mha="on", proj_bias=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    a = forward(params, x, cfg)
    b = forward(params, x, cfg.replace(fuse_mha="off"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_block_matches_composed():
    """fuse_mlp='on' must match the composed LN+MLP path in values and
    gradients (both activations)."""
    from vitx import ViTConfig, forward, init_params
    from vitx.train.step import cross_entropy_loss

    # gelu_tanh included: the kernel computes the TRUE tanh form (via exp),
    # not an erf-poly stand-in, so fused inference matches the composed
    # training path (ADVICE r2)
    for act in ("gelu", "gelu_tanh", "relu"):
        cfg_on = ViTConfig(image_size=16, patch_size=4, num_classes=4,
                           embed_dim=64, depth=2, num_heads=2, mlp_act=act,
                           compute_dtype="float32", fuse_mha="off",
                           fuse_mlp="on")
        cfg_off = cfg_on.replace(fuse_mlp="off")
        params = init_params(jax.random.PRNGKey(0), cfg_on)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 3))
        labels = jax.random.randint(jax.random.PRNGKey(2), (3,), 0, 4)

        a = forward(params, x, cfg_on)
        b = forward(params, x, cfg_off)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

        def loss(params, cfg):
            return cross_entropy_loss(forward(params, x, cfg), labels)

        ga = jax.grad(loss)(params, cfg_on)
        gb = jax.grad(loss)(params, cfg_off)
        for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-4, atol=1e-6)


def test_fused_adamw_matches_optax():
    """The single-pass Pallas AdamW must reproduce optax.adamw exactly
    (same trajectory over several steps, incl. bias correction + decay)."""
    import optax
    from vitx.kernels.adamw import fused_adamw

    key = jax.random.PRNGKey(0)
    # one leaf large enough for the kernel path (128K elems), one tiny
    params = {"w": jax.random.normal(key, (128, 1024), jnp.float32),
              "b": jnp.zeros((7,), jnp.float32)}
    ref_opt = optax.adamw(1e-3, weight_decay=1e-4)
    fus_opt = fused_adamw(1e-3, weight_decay=1e-4)
    ref_state = ref_opt.init(params)
    fus_state = fus_opt.init(params)
    ref_p = params
    fus_p = params
    for i in range(4):
        grads = jax.tree.map(
            lambda p: 0.01 * jax.random.normal(
                jax.random.fold_in(key, i), p.shape), ref_p)
        upd, ref_state = ref_opt.update(grads, ref_state, ref_p)
        ref_p = optax.apply_updates(ref_p, upd)
        fus_p, fus_state = fus_opt.update(grads, fus_state, fus_p)
    for a, b in zip(jax.tree.leaves(ref_p), jax.tree.leaves(fus_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # moments identical too
    np.testing.assert_allclose(
        np.asarray(fus_state.mu["w"]),
        np.asarray(ref_state[0].mu["w"]), rtol=1e-6, atol=1e-8)
    assert int(fus_state.count) == 4


def test_fused_adamw_with_schedule_and_clip():
    """fused path composes with grad clipping and an lr schedule through
    make_optimizer(fused=True)."""
    import optax
    from vitx.train.step import make_optimizer

    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    params = {"w": jnp.ones((256, 1024), jnp.float32)}
    opt_f = make_optimizer(schedule=sched, grad_clip=1.0, fused=True)
    opt_r = make_optimizer(schedule=sched, grad_clip=1.0, fused=False)
    sf, sr = opt_f.init(params), opt_r.init(params)
    pf, pr = params, params
    for i in range(3):
        g = {"w": jnp.full((256, 1024), 5.0)}   # triggers clipping
        uf, sf = opt_f.update(g, sf, pf)
        pf = uf                                  # returns new params
        ur, sr = opt_r.update(g, sr, pr)
        pr = optax.apply_updates(pr, ur)
    np.testing.assert_allclose(np.asarray(pf["w"]), np.asarray(pr["w"]),
                               rtol=1e-6, atol=1e-7)


def test_ln_bwd_kernel_matches_autodiff():
    """The batched LN-backward kernel (vitx/kernels/layer_norm.py::ln_bwd)
    that layer_norm/add_layer_norm route their VJPs through on TPU."""
    from vitx.kernels.layer_norm import ln_bwd
    from vitx.nn.layers import _jnp_layer_norm, _ln_bwd_math

    x = jax.random.normal(jax.random.PRNGKey(0), (6, 37, 256), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (256,)) * 0.5 + 1.0
    dy = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)

    dx_k, dg_k, db_k = ln_bwd(x, s, dy)
    dx_m, dg_m, db_m = _ln_bwd_math(x, s, dy, eps=1e-5)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg_k), np.asarray(dg_m),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db_k), np.asarray(db_m),
                               rtol=1e-4, atol=1e-4)

    # against plain-jnp autodiff through layer_norm's public surface
    b = jnp.zeros((256,))
    def ref(x, s, b):
        return jnp.sum(jnp.sin(_jnp_layer_norm(x, s, b)))
    from vitx.nn.layers import layer_norm
    def viavjp(x, s, b):
        return jnp.sum(jnp.sin(layer_norm(x, s, b)))
    ga = jax.grad(ref, argnums=(0, 1, 2))(x, s, b)
    gb = jax.grad(viavjp, argnums=(0, 1, 2))(x, s, b)
    for a, c, name in zip(ga, gb, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_layer_norm_vjp_2d_input():
    """The head LayerNorm takes a 2-D (B, F) input — the custom VJP must
    handle the rank-2 reshape path."""
    from vitx.nn.layers import _jnp_layer_norm, layer_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 128), jnp.float32)
    s = jnp.ones((128,)) * 1.1
    b = jnp.zeros((128,)) + 0.2
    ga = jax.grad(lambda x: jnp.sum(jnp.tanh(layer_norm(x, s, b))))(x)
    gr = jax.grad(lambda x: jnp.sum(jnp.tanh(_jnp_layer_norm(x, s, b))))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_chunked_mha_matches_composed_interpret():
    """Head-chunked fused MHA (the ViT-L@384 inference path) matches the
    composed path in interpret mode."""
    import vitx.kernels.mha_block as mb

    B, T, E, H = 2, 160, 256, 8
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k[0], (B, T, E), jnp.float32)
    wqkv = jax.random.normal(k[1], (E, 3, H, E // H), jnp.float32) * 0.02
    wo = jax.random.normal(k[2], (E, E), jnp.float32) * 0.02
    bo = jax.random.normal(k[3], (E,), jnp.float32) * 0.01
    g = jnp.ones((E,), jnp.float32)
    b = jnp.zeros((E,), jnp.float32)

    ref = mb._composed(x, wqkv, wo, bo, g, b, eps=1e-5)
    got = mb._chunked_fwd(x, wqkv, wo, bo, g, b, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_chunked_mha_mean_probs_matches_composed_interpret():
    """Chunked kernel's head-mean probs output (the rollout path) matches
    the composed reference in interpret mode."""
    import vitx.kernels.mha_block as mb

    B, T, E, H = 2, 160, 256, 8
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(k[0], (B, T, E), jnp.float32)
    wqkv = jax.random.normal(k[1], (E, 3, H, E // H), jnp.float32) * 0.02
    wo = jax.random.normal(k[2], (E, E), jnp.float32) * 0.02
    bo = jax.random.normal(k[3], (E,), jnp.float32) * 0.01
    g = jnp.ones((E,), jnp.float32)
    b = jnp.zeros((E,), jnp.float32)

    out_r, probs_r = mb._composed_with_mean_probs(x, wqkv, wo, bo, g, b,
                                                  eps=1e-5)
    out_c, probs_c = mb._chunked_fwd(x, wqkv, wo, bo, g, b, eps=1e-5,
                                     mean_probs=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs_c), np.asarray(probs_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs_c, axis=-1)),
                               np.ones((B, T)), rtol=1e-5)
