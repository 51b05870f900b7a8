"""SwiGLU gated MLP (cfg.mlp_act="swiglu"; Shazeer 2020 / EVA-02's FFN).

Beyond-reference extension: the reference FeedForward is
Linear->act->Linear (transformer.py:55-60); SwiGLU adds a w3 gate
projection per block — hidden = SiLU(x@w1 + b1) * (x@w3 + b3).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.nn.layers import mlp
from vitx.nn.vit import forward, init_params
from vitx.train.step import (create_train_state, make_optimizer,
                             make_train_step)

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, mlp_act="swiglu",
                compute_dtype="float32")


def test_swiglu_mlp_matches_manual_math():
    E, M = 8, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (3, 5, E))
    w1, w3 = (jax.random.normal(k, (E, M)) * 0.3 for k in ks[1:3])
    w2 = jax.random.normal(ks[3], (M, E)) * 0.3
    b1, b3 = (jax.random.normal(k, (M,)) * 0.1 for k in ks[4:6])
    b2 = jnp.zeros((E,))
    got = mlp(x, w1, b1, w2, b2, act="swiglu", w3=w3, b3=b3)
    h = jax.nn.silu(x @ w1 + b1) * (x @ w3 + b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(h @ w2 + b2),
                               rtol=0, atol=1e-5)


def test_swiglu_blocks_have_gate_leaves_and_train():
    params = init_params(jax.random.PRNGKey(0), CFG)
    assert params["blocks"]["w3"].shape == (2, 32, 128)
    assert params["blocks"]["b3"].shape == (2, 128)
    # gate participates: zeroing w3+b3 must change the logits
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    a = forward(params, img, CFG)
    z = dict(params)
    z["blocks"] = dict(params["blocks"],
                       w3=jnp.zeros_like(params["blocks"]["w3"]),
                       b3=jnp.zeros_like(params["blocks"]["b3"]))
    b = forward(z, img, CFG)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-5

    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2), (8, 16, 16, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 4)}
    g0 = np.asarray(state.params["blocks"]["w3"])  # copy: the step donates
    for _ in range(150):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1
    # the gate actually moved during training
    assert float(np.max(np.abs(np.asarray(
        state.params["blocks"]["w3"]) - g0))) > 0


def test_swiglu_validation():
    with pytest.raises(ValueError, match="bug_exact"):
        CFG.replace(parity="bug_exact", head_type="reference")
    with pytest.raises(ValueError, match="moe"):
        CFG.replace(moe_experts=2)
    with pytest.raises(ValueError, match="fuse_mlp"):
        CFG.replace(fuse_mlp="on")
    from vitx.nn.vit import _use_fused_mlp
    assert not _use_fused_mlp(CFG)
    # export guard: no w3 slot in the reference layout
    from vitx.interop.torch_ref import export_reference_state_dict
    cfg = CFG.replace(head_type="reference")
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="swiglu"):
        export_reference_state_dict(params, cfg)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_swiglu_tp_trajectory_matches_single_device():
    """w3 shards column-parallel like w1 — a (dp=4, tp=2) run must follow
    the single-device trajectory exactly."""
    from vitx.parallel import (make_mesh, make_parallel_train_step,
                               shard_batch)
    from vitx.parallel.sharded import place_state, tp_safe_cfg

    def batch(i):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        return {"image": jax.random.normal(k1, (16, 16, 16, 3)),
                "label": jax.random.randint(k2, (16,), 0, 4)}

    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    ref = []
    for i in range(3):
        state, m = step(state, batch(i), None)
        ref.append(float(m["loss"]))

    mesh = make_mesh(dp=4, tp=2)
    cfg_tp = tp_safe_cfg(CFG, True)
    pstep = make_parallel_train_step(cfg_tp, opt, mesh, tp=True)
    pstate = place_state(
        create_train_state(jax.random.PRNGKey(0), cfg_tp, opt), cfg_tp,
        mesh, tp=True)
    for i in range(3):
        pstate, m = pstep(pstate, shard_batch(batch(i), mesh), None)
        assert float(m["loss"]) == pytest.approx(ref[i], abs=1e-5)


def test_cli_swiglu_roundtrip(tmp_path, capsys):
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--mlp-act", "swiglu",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    train_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["accuracy"] == pytest.approx(train_out["val_accuracy"])
