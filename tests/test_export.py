"""StableHLO export (vitx/export.py, jax.export)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.export import export_forward, load_exported, save_exported
from vitx.nn.vit import forward, init_params

CFG = ViTConfig(image_size=32, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")


def test_export_round_trip_parity(tmp_path):
    """serialize -> deserialize -> call must equal the live forward."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    path = tmp_path / "m.stablehlo"
    nbytes = save_exported(path, params, CFG, batch_size=4)
    assert nbytes == path.stat().st_size > 1000

    exported = load_exported(path)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    got = np.asarray(exported.call(x))
    want = np.asarray(forward(params, x, CFG)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_symbolic_batch_runs_any_size():
    """One artifact with a symbolic batch dim serves b=1 and b=16 alike."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    exported = export_forward(params, CFG)   # batch_size=None -> symbolic
    blob = exported.serialize()
    again = jax.export.deserialize(bytearray(blob))
    for b in (1, 16):
        x = jax.random.normal(jax.random.PRNGKey(b), (b, 32, 32, 3))
        got = np.asarray(again.call(x))
        assert got.shape == (b, 4)
        want = np.asarray(forward(params, x, CFG)).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_with_softmax_and_jit():
    params = init_params(jax.random.PRNGKey(0), CFG)
    exported = export_forward(params, CFG, batch_size=2, with_softmax=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    probs = np.asarray(jax.jit(exported.call)(x))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_cli_eval_export_stablehlo(tmp_path, capsys):
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    art = tmp_path / "m.stablehlo"
    rc = eval_main(["--data", "synthetic", "--checkpoint",
                    str(tmp_path / "c"), "--batch-size", "32",
                    "--export-stablehlo", str(art)])
    assert rc == 0 and art.stat().st_size > 1000
    exported = load_exported(art)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 64, 3))
    assert np.asarray(exported.call(x)).shape == (3, 4)


def test_export_tome_requires_pinned_batch():
    params = init_params(jax.random.PRNGKey(0), CFG.replace(tome_r=4))
    with pytest.raises(ValueError, match="tome_r"):
        export_forward(params, CFG.replace(tome_r=4))
    exported = export_forward(params, CFG.replace(tome_r=4), batch_size=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    got = np.asarray(exported.call(x))
    want = np.asarray(forward(params, x, CFG.replace(tome_r=4)))
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-5, atol=1e-6)


def test_stablehlo_serving_e2e(tmp_path):
    """Deployment loop closed: export -> sidecar config discovery ->
    load_server serves the artifact; predictions match the live forward;
    /explain is refused (the artifact bakes only the logits program)."""
    from vitx.serve import load_server
    from vitx.train.checkpoint import resolve_artifact_config

    params = init_params(jax.random.PRNGKey(0), CFG)
    path = tmp_path / "m.stablehlo"
    save_exported(path, params, CFG)          # symbolic batch
    assert (tmp_path / "m.stablehlo.json").exists()

    cfg = resolve_artifact_config(str(path), None, "tiny")
    assert cfg.image_size == 32 and cfg.num_classes == 4

    srv = load_server(str(path), cfg, batch_size=4, top_k=3)
    try:
        img = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                           (32, 32, 3)), np.float32)
        out = srv.predict(img)
        want = np.asarray(forward(params, img[None], CFG))[0]
        assert out["classes"][0] == int(want.argmax())
        e = np.exp(want - want.max())
        p = (e / e.sum()).astype(np.float64)
        np.testing.assert_allclose(out["probs"][0], float(np.max(p)),
                                   rtol=1e-4, atol=1e-5)
        with pytest.raises(RuntimeError, match="StableHLO"):
            srv.explain(img)
    finally:
        srv.close()


def test_stablehlo_serving_guards(tmp_path):
    """with_softmax artifacts are refused (double softmax); pinned-batch
    artifacts demand the matching server batch and serve at it."""
    from vitx.serve import load_server

    params = init_params(jax.random.PRNGKey(0), CFG)
    soft = tmp_path / "soft.stablehlo"
    save_exported(soft, params, CFG, with_softmax=True, batch_size=4)
    with pytest.raises(ValueError, match="with_softmax"):
        load_server(str(soft), CFG, batch_size=4)

    pinned = tmp_path / "p.stablehlo"
    save_exported(pinned, params, CFG, batch_size=8)
    with pytest.raises(ValueError, match="batch_size=8"):
        load_server(str(pinned), CFG, batch_size=4)
    srv = load_server(str(pinned), CFG, batch_size=8, top_k=1)
    try:
        img = np.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                           (32, 32, 3)), np.float32)
        want = np.asarray(forward(params, img[None], CFG))[0]
        assert srv.predict(img)["classes"][0] == int(want.argmax())
    finally:
        srv.close()
