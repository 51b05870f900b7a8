"""QK-Norm (ViT-22B, Dehghani et al. 2023): per-head LayerNorm (learned
scale, no bias) on queries and keys before the attention logits — the
standard fix for attention-logit growth when scaling ViTs. Composes with
the flash kernel (q/k are normalized before the kernel call); the fused
MHA block kernel auto-falls back to the composed path."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.nn.vit import _use_fused_mha, forward, init_params

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32", qk_norm=True)


def _images(B=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (B, CFG.image_size, CFG.image_size, 3))


def test_params_and_validation():
    params = init_params(jax.random.PRNGKey(0), CFG)
    H, D = CFG.num_heads, CFG.head_dim
    assert params["blocks"]["lnq_scale"].shape == (CFG.depth, H, D)
    assert params["blocks"]["lnk_scale"].shape == (CFG.depth, H, D)
    logits = forward(params, _images(), CFG)
    assert np.isfinite(np.asarray(logits)).all()
    with pytest.raises(ValueError, match="qk_norm"):
        ViTConfig(image_size=16, patch_size=4, qk_norm=True,
                  parity="bug_exact")
    with pytest.raises(ValueError, match="qk_norm"):
        CFG.replace(tome_r=1)
    # the fused MHA block kernel computes QKV in-kernel, unnormalized —
    # qk_norm must never select it, even when forced "on"
    bp = {k: v[0] for k, v in
          init_params(jax.random.PRNGKey(0), CFG)["blocks"].items()}
    assert not _use_fused_mha(CFG.replace(fuse_mha="on"), bp, False)


def test_logits_invariant_to_query_gain():
    """LayerNorm on q (mean-subtract + variance-normalize) makes attention
    invariant to a per-head affine gain on the query projection; without
    qk_norm the same gain changes the output."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    x = _images()

    def with_q_gain(p, gain):
        b = dict(p["blocks"])
        wqkv = np.asarray(b["wqkv"]).copy()
        wqkv[:, :, 0, :, :] *= gain            # scale the q slice only
        b["wqkv"] = jnp.asarray(wqkv)
        return {**p, "blocks": b}

    base = np.asarray(forward(params, x, CFG))
    gained = np.asarray(forward(with_q_gain(params, 10.0), x, CFG))
    np.testing.assert_allclose(gained, base, rtol=2e-4, atol=1e-5)

    cfg_off = CFG.replace(qk_norm=False)
    p_off = init_params(jax.random.PRNGKey(1), cfg_off)
    base_off = np.asarray(forward(p_off, x, cfg_off))
    gained_off = np.asarray(forward(
        {**with_q_gain(p_off, 10.0)}, x, cfg_off))
    assert np.abs(gained_off - base_off).max() > 1e-3


def test_qk_norm_matches_manual_math():
    """multi_head_attention(qk_scales=...) equals normalizing q/k by hand
    and calling the plain path."""
    from vitx.nn.attention import multi_head_attention

    rng = jax.random.PRNGKey(3)
    B, T, E, H = 2, 5, 8, 2
    D = E // H
    ks = jax.random.split(rng, 5)
    x = jax.random.normal(ks[0], (B, T, E))
    wqkv = jax.random.normal(ks[1], (E, 3, H, D)) * 0.3
    wo = jax.random.normal(ks[2], (E, E)) * 0.3
    sq = 1.0 + 0.1 * jax.random.normal(ks[3], (H, D))
    sk = 1.0 + 0.1 * jax.random.normal(ks[4], (H, D))

    out, _ = multi_head_attention(x, wqkv, None, wo, None, num_heads=H,
                                  impl="reference",
                                  qk_scales=(sq, sk), qk_eps=1e-5)

    def ln(t, s):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return (t - mu) / np.sqrt(var + 1e-5) * np.asarray(s)[None, :, None]

    q = np.einsum("bte,ehd->bhtd", np.asarray(x), np.asarray(wqkv[:, 0]))
    k = np.einsum("bte,ehd->bhtd", np.asarray(x), np.asarray(wqkv[:, 1]))
    v = np.einsum("bte,ehd->bhtd", np.asarray(x), np.asarray(wqkv[:, 2]))
    q, k = ln(q, sq), ln(k, sk)
    lg = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
    p = np.exp(lg - lg.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)
    ref = np.einsum("bhtd,hdf->btf", ref,
                    np.asarray(wo).reshape(H, D, E))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-6)


def test_qk_norm_trains_and_scales_move():
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    s0 = np.asarray(state.params["blocks"]["lnq_scale"]).copy()
    step = make_train_step(CFG, opt)
    batch = {"image": _images(B=8, seed=5),
             "label": jax.random.randint(jax.random.PRNGKey(6), (8,), 0, 4)}
    first = None
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        first = float(m["loss"]) if first is None else first
    assert float(m["loss"]) < first * 0.3
    assert np.abs(np.asarray(state.params["blocks"]["lnq_scale"])
                  - s0).max() > 1e-5


def test_qk_norm_under_meshes():
    """dp=2 and tp=2 trajectories match single-device (pins the new
    lnq/lnk PartitionSpecs)."""
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
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    _, ref_m = make_train_step(CFG, opt)(state, batch, jax.random.PRNGKey(1))

    for kind, kw in (("dp", dict(dp=2)), ("tp", dict(dp=1, tp=2))):
        mesh = make_mesh(**kw)
        tp = kw.get("tp", 1) > 1
        pstate = place_state(
            create_train_state(jax.random.PRNGKey(0), CFG, opt), CFG, mesh,
            tp=tp)
        shardings = state_sharding(pstate, CFG, mesh, tp, False, False)
        pstep = make_parallel_train_step(CFG, opt, mesh, tp=tp,
                                         state_shardings=shardings)
        _, pm = pstep(pstate, batch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(pm["loss"]), float(ref_m["loss"]),
                                   rtol=1e-5, err_msg=kind)


def test_pt_export_rejects_qk_norm():
    from vitx.interop.torch_ref import export_reference_state_dict

    params = init_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="QK-Norm"):
        export_reference_state_dict(params, CFG)


def test_cli_train_qk_norm(tmp_path, capsys):
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main

    rc = main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3", "--qk-norm",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["loss"])
    rc = eval_main(["--preset", "tiny", "--data", "synthetic",
                    "--batch-size", "16",
                    "--checkpoint", str(tmp_path / "c")])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(report["accuracy"])
