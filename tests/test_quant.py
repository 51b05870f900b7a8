"""Weight-only int8 quantization (vitx/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitx.core.config import ViTConfig
from vitx.nn.vit import forward, init_params
from vitx.quant import (
    load_quantized,
    quantization_error,
    quantize_leaf,
    save_quantized,
)

CFG = ViTConfig(image_size=32, patch_size=4, num_classes=4, embed_dim=32,
                depth=3, num_heads=2, compute_dtype="float32")


def test_quantize_leaf_error_bound():
    """Symmetric per-channel int8: elementwise error <= scale/2, i.e.
    <= amax_channel / 254 — for both the unstacked (in, out) form and the
    stacked block form (depth, in, out) with per-layer scales."""
    w = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (64, 32)))
    q, s = quantize_leaf(w, "head/w1")
    assert q.dtype == np.int8 and s.shape == (1, 32)
    err = np.abs(w - q.astype(np.float32) * s)
    assert np.all(err <= s / 2 + 1e-8)

    wb = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 64, 32)))
    qb, sb = quantize_leaf(wb, "blocks/w1")
    assert sb.shape == (3, 1, 32)      # per-layer, per-output-channel
    err = np.abs(wb - qb.astype(np.float32) * sb)
    assert np.all(err <= sb / 2 + 1e-8)


def test_only_matmul_weights_are_quantized(tmp_path):
    """LayerNorm params, biases (stacked (L, E) leaves included), and every
    token embedding must pass through float; the block weights must carry
    per-layer, per-output-channel scales — wqkv per (layer, qkv, head,
    channel), NOT shared across q/k/v or heads."""
    cfg = CFG.replace(num_registers=2, distill_token=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = save_quantized(tmp_path / "m.quant.npz", params)
    with np.load(path) as z:
        keys = set(z.files)
        for float_leaf in ("blocks/ln1_scale", "blocks/ln1_bias",
                           "blocks/b1", "blocks/bo", "reg_tokens",
                           "dist_token", "cls_token", "pos_embed",
                           "patch_embed/bias", "head/ln_scale"):
            assert f"f::{float_leaf}" in keys, float_leaf
            assert f"q::{float_leaf}" not in keys, float_leaf
        for w in ("blocks/wqkv", "blocks/wo", "blocks/w1", "blocks/w2",
                  "patch_embed/kernel", "head/w1", "head/w2",
                  "dist_head/w"):
            assert f"q::{w}" in keys, w
        L, E, H = cfg.depth, cfg.embed_dim, cfg.num_heads
        assert z["s::blocks/wqkv"].shape == (L, 1, 3, H, E // H)
        assert z["s::blocks/w1"].shape == (L, 1, 4 * E)
        assert z["s::patch_embed/kernel"].shape == (1, E)


def test_round_trip_preserves_structure_and_dtypes(tmp_path):
    cfg = CFG.replace(compute_dtype="bfloat16")  # params stay fp32
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = save_quantized(tmp_path / "m.quant.npz", params,
                          meta={"note": "test"})
    template = init_params(jax.random.PRNGKey(1), cfg)
    restored, user = load_quantized(path, template)
    assert user == {"note": "test"}
    assert (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(params))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(restored)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # embeddings pass through bit-exactly (never quantized)
    np.testing.assert_array_equal(np.asarray(params["pos_embed"]),
                                  np.asarray(restored["pos_embed"]))
    np.testing.assert_array_equal(np.asarray(params["cls_token"]),
                                  np.asarray(restored["cls_token"]))


def test_quantized_model_keeps_predictions(tmp_path):
    """int8 weights on an overfit model must preserve argmax predictions
    and keep logits within the weight-only-int8 regime."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (8, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 4)}
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1

    path = save_quantized(tmp_path / "m.quant.npz", state.params)
    qparams, _ = load_quantized(path, init_params(jax.random.PRNGKey(9), CFG))

    full = np.asarray(forward(state.params, batch["image"], CFG))
    quant = np.asarray(forward(qparams, batch["image"], CFG))
    np.testing.assert_array_equal(quant.argmax(-1), full.argmax(-1))
    rel = np.max(np.abs(quant - full)) / np.max(np.abs(full))
    assert rel < 0.05, rel

    errs = quantization_error(state.params)
    assert errs and all(e <= 1.0 / 254 + 1e-6 for e in errs.values())
    # artifact is ~4x smaller than the fp32 leaves it encodes
    import os
    fp32_bytes = sum(np.asarray(l).nbytes
                     for l in jax.tree.leaves(state.params))
    assert os.path.getsize(path) < 0.45 * fp32_bytes


def test_serve_loads_quantized_artifact(tmp_path):
    from vitx.serve import load_server

    params = init_params(jax.random.PRNGKey(0), CFG)
    path = save_quantized(tmp_path / "m.quant.npz", params)
    server = load_server(str(path), CFG, batch_size=4)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(4),
                                     (CFG.image_size, CFG.image_size, 3)))
    out = server.predict(x)
    assert len(out["probs"]) == server.top_k
    server.close()


def test_cli_eval_export_quantized(tmp_path, capsys):
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    art = tmp_path / "m.quant.npz"
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32",
                    "--export-quantized", str(art)])
    assert rc == 0 and art.exists()
    import json
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["accuracy"] <= 1.0

    # the artifact itself evaluates directly (self-describing config) and
    # must land within the weight-only-int8 regime of the fp32 number
    rc = eval_main(["--data", "synthetic", "--checkpoint", str(art),
                    "--batch-size", "32"])
    assert rc == 0
    qout = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(qout["accuracy"] - out["accuracy"]) <= 0.02
