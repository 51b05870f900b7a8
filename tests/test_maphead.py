"""MAP attention-pooling head (Zhai et al. 2022 "Scaling Vision
Transformers" / ViT-22B) and GAP pooling (global_pool="gap", the MAE
fine-tune protocol): alternative classifier-head family next to the
reference's Linear-GELU-LN-Linear and the vanilla LN-Linear heads."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.nn.vit import classify, forward, init_params

MAP_CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32",
                    head_type="map")


def _images(B=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, 16, 16, 3))


def test_validation_and_params():
    with pytest.raises(ValueError, match="head_type"):
        MAP_CFG.replace(head_type="avg")
    with pytest.raises(ValueError, match="global_pool"):
        MAP_CFG.replace(global_pool="mean")
    with pytest.raises(ValueError, match="beyond-reference"):
        ViTConfig(image_size=16, patch_size=4, head_type="map",
                  parity="bug_exact")
    with pytest.raises(ValueError, match="beyond-reference"):
        ViTConfig(image_size=16, patch_size=4, global_pool="gap",
                  parity="bug_exact")
    params = init_params(jax.random.PRNGKey(0), MAP_CFG)
    E = MAP_CFG.embed_dim
    assert params["head"]["probe"].shape == (1, 1, E)
    assert params["head"]["mw1"].shape == (E, MAP_CFG.mlp_dim)
    logits = forward(params, _images(), MAP_CFG)
    assert logits.shape == (3, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_map_pool_matches_manual_math():
    from vitx.nn.vit import _map_pool

    cfg = MAP_CFG
    H, D, E = cfg.num_heads, cfg.head_dim, cfg.embed_dim
    rng = jax.random.PRNGKey(3)
    hp = init_params(rng, cfg)["head"]
    # give the zero-init leaves real values so the math is exercised
    hp = dict(hp)
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    hp["bo_p"] = 0.1 * jax.random.normal(ks[0], (E,))
    x = jax.random.normal(ks[2], (2, 7, E))

    out = np.asarray(_map_pool(hp, x, cfg))

    # input LN (the MAP head normalizes the raw residual stream)
    xn = np.asarray(x)
    mu0 = xn.mean(-1, keepdims=True)
    var0 = ((xn - mu0) ** 2).mean(-1, keepdims=True)
    xn = (xn - mu0) / np.sqrt(var0 + cfg.layer_norm_eps)
    xn = xn * np.asarray(hp["in_ln_scale"]) + np.asarray(hp["in_ln_bias"])
    q = (np.asarray(hp["probe"])[0, 0] @ np.asarray(hp["wq"])).reshape(H, D)
    k = np.einsum("bte,ehd->bhtd", xn,
                  np.asarray(hp["wk"]).reshape(E, H, D))
    v = np.einsum("bte,ehd->bhtd", xn,
                  np.asarray(hp["wv"]).reshape(E, H, D))
    lg = np.einsum("hd,bhtd->bht", q, k) / np.sqrt(D)
    p = np.exp(lg - lg.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    a = np.einsum("bht,bhtd->bhd", p, v)
    a = np.einsum("bhd,hde->be", a,
                  np.asarray(hp["wo_p"]).reshape(H, D, E))
    a = a + np.asarray(hp["bo_p"])
    mu = a.mean(-1, keepdims=True)
    var = ((a - mu) ** 2).mean(-1, keepdims=True)
    h = (a - mu) / np.sqrt(var + cfg.layer_norm_eps)
    h = h * np.asarray(hp["mlp_ln_scale"]) + np.asarray(hp["mlp_ln_bias"])
    import scipy.special as sp

    hid = h @ np.asarray(hp["mw1"]) + np.asarray(hp["mb1"])
    hid = hid * 0.5 * (1.0 + sp.erf(hid / np.sqrt(2.0)))
    ref = a + hid @ np.asarray(hp["mw2"]) + np.asarray(hp["mb2"])
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


def test_gap_pooling_semantics():
    """global_pool='gap' == mean over the patch tokens only (prefix kept
    out in front, registers at the tail)."""
    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32",
                    head_type="standard", global_pool="gap", num_registers=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.seq_len
    x = jax.random.normal(jax.random.PRNGKey(4), (2, T, cfg.embed_dim))

    got = np.asarray(classify(params, x, cfg))
    pooled = np.asarray(x)[:, 1:1 + cfg.num_patches].mean(1)
    mu = pooled.mean(-1, keepdims=True)
    var = ((pooled - mu) ** 2).mean(-1, keepdims=True)
    h = (pooled - mu) / np.sqrt(var + cfg.layer_norm_eps)
    h = h * np.asarray(params["head"]["ln_scale"]) \
        + np.asarray(params["head"]["ln_bias"])
    ref = h @ np.asarray(params["head"]["w"]) + np.asarray(params["head"]["b"])
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)

    # changing a register token must not change gap logits
    x2 = np.asarray(x).copy()
    x2[:, -1, :] += 3.0
    np.testing.assert_array_equal(
        got, np.asarray(classify(params, jnp.asarray(x2), cfg)))


def test_map_head_trains_and_probe_moves():
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), MAP_CFG, opt)
    probe0 = np.asarray(state.params["head"]["probe"]).copy()
    step = make_train_step(MAP_CFG, opt)
    batch = {"image": _images(B=8, seed=5),
             "label": jax.random.randint(jax.random.PRNGKey(6), (8,), 0, 4)}
    first = None
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        first = float(m["loss"]) if first is None else first
    assert float(m["loss"]) < first * 0.3
    assert np.abs(np.asarray(state.params["head"]["probe"])
                  - probe0).max() > 1e-5


def test_gap_trains():
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    cfg = MAP_CFG.replace(head_type="standard", global_pool="gap")
    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = {"image": _images(B=8, seed=5),
             "label": jax.random.randint(jax.random.PRNGKey(6), (8,), 0, 4)}
    first = None
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        first = float(m["loss"]) if first is None else first
    assert float(m["loss"]) < first * 0.3


def test_map_head_under_dp_mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from vitx.parallel import make_mesh
    from vitx.parallel.sharded import make_parallel_train_step, place_state
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    opt = make_optimizer(lr=1e-3)
    batch = {"image": _images(B=8, seed=5),
             "label": jax.random.randint(jax.random.PRNGKey(6), (8,), 0, 4)}
    state = create_train_state(jax.random.PRNGKey(0), MAP_CFG, opt)
    _, ref_m = make_train_step(MAP_CFG, opt)(state, batch,
                                             jax.random.PRNGKey(1))
    mesh = make_mesh(dp=2)
    pstate = place_state(
        create_train_state(jax.random.PRNGKey(0), MAP_CFG, opt), MAP_CFG,
        mesh)
    pstep = make_parallel_train_step(MAP_CFG, opt, mesh)
    _, pm = pstep(pstate, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(pm["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)


def test_tome_composes_with_gap():
    """ToMe-merged token sets still gap-pool (patches = whatever sits
    between prefix and registers)."""
    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32",
                    head_type="standard", global_pool="gap", tome_r=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    logits = forward(params, _images(), cfg)
    assert logits.shape == (3, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_cli_train_map_head(tmp_path, capsys):
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main

    rc = main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3", "--head-type", "map",
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
