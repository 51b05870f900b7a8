"""Cross-implementation golden test: JAX model vs the standalone C oracle.

The reference validated its C stack against PyTorch golden values
(tests/multihead-attention-test.ipynb); here the full corrected forward is
validated C-vs-JAX at <= 1e-4 rel err (BASELINE.md metric), including under
ASan/UBSan (SURVEY §5 sanitizer plan).
"""

import pathlib
import shutil
import subprocess

import jax
import numpy as np
import pytest

from vitx import ViTConfig, forward, init_params
from vitx.interop.cbin import (
    build_vitc,
    read_output_bin,
    run_vitc,
    write_input_bin,
    write_model_bin,
)

SRC = pathlib.Path(__file__).parent.parent / "csrc" / "vitc.c"

pytestmark = pytest.mark.skipif(shutil.which("gcc") is None,
                                reason="gcc not available")


@pytest.fixture(scope="module")
def vitc_bin(tmp_path_factory):
    out = tmp_path_factory.mktemp("cbin") / "vitc"
    build_vitc(SRC, out)
    return out


def _case(cfg, seed=0, batch=2):
    params = jax.device_get(init_params(jax.random.PRNGKey(seed), cfg))
    x = np.asarray(jax.random.normal(
        jax.random.PRNGKey(seed + 1),
        (batch, cfg.image_size, cfg.image_size, cfg.num_channels)),
        np.float32)
    return params, x


def _compare(vitc_bin, cfg, tmp_path, seed=0, batch=2, rtol=1e-4):
    params, x = _case(cfg, seed, batch)
    jax_logits = np.asarray(forward(params, x, cfg))

    m, i, o = tmp_path / "m.bin", tmp_path / "i.bin", tmp_path / "o.bin"
    write_model_bin(m, params, cfg)
    write_input_bin(i, x)
    stdout = run_vitc(vitc_bin, m, i, o)
    assert "logits[0]:" in stdout
    c_logits = read_output_bin(o, batch, cfg.num_classes)

    rel = np.max(np.abs(c_logits - jax_logits)) / max(
        np.max(np.abs(jax_logits)), 1e-12)
    assert rel < rtol, f"rel err {rel}"


def test_c_oracle_tiny(vitc_bin, tmp_path):
    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32",
                    mlp_act="gelu")
    _compare(vitc_bin, cfg, tmp_path)


def test_c_oracle_relu_multihead(vitc_bin, tmp_path):
    cfg = ViTConfig(image_size=32, patch_size=8, num_classes=7, embed_dim=48,
                    depth=3, num_heads=4, compute_dtype="float32",
                    mlp_act="relu")
    _compare(vitc_bin, cfg, tmp_path, seed=3)


def test_c_oracle_vit_tiny_preset(vitc_bin, tmp_path):
    from vitx.core.config import get_config

    cfg = get_config("tiny", compute_dtype="float32")
    _compare(vitc_bin, cfg, tmp_path, seed=5, batch=1)


def test_c_oracle_under_asan(tmp_path):
    """Memory-safety gate: the oracle runs clean under ASan+UBSan."""
    out = tmp_path / "vitc_asan"
    cmd = ["gcc", "-O1", "-g", "-std=c99", "-fsanitize=address,undefined",
           "-o", str(out), str(SRC), "-lm"]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"asan build unavailable: {r.stderr[:200]}")
    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32")
    params, x = _case(cfg)
    m, i, o = tmp_path / "m.bin", tmp_path / "i.bin", tmp_path / "o.bin"
    write_model_bin(m, params, cfg)
    write_input_bin(i, x)
    run_vitc(out, m, i, o)   # raises on sanitizer failure (non-zero exit)


def test_model_bin_rejects_unsupported(tmp_path):
    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, head_type="standard")
    params = jax.device_get(init_params(jax.random.PRNGKey(0), cfg))
    with pytest.raises(ValueError):
        write_model_bin(tmp_path / "m.bin", params, cfg)


TRAIN_SRC = pathlib.Path(__file__).parent.parent / "csrc" / "trainc.c"


@pytest.fixture(scope="module")
def trainc_bin(tmp_path_factory):
    out = tmp_path_factory.mktemp("cbin_train") / "trainc"
    subprocess.run(["gcc", "-O2", "-std=c99", "-o", str(out),
                    str(TRAIN_SRC), "-lm"], check=True, capture_output=True)
    return out


def test_c_training_step_matches_vitx_trajectory(trainc_bin, tmp_path):
    """trainc (full C forward+backward+AdamW — the csrc/train.c the reference
    README advertises but never shipped) must follow the vitx training
    trajectory: per-step losses and final params match."""
    import jax.numpy as jnp

    from vitx.interop.cbin import read_model_bin, write_train_bin
    from vitx.train import create_train_state, make_train_step
    from vitx.train.step import make_optimizer

    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=16,
                    depth=2, num_heads=2, compute_dtype="float32",
                    mlp_act="gelu")
    B, steps, lr, wd = 4, 3, 1e-3, 1e-4
    params, x = _case(cfg, seed=3, batch=B)
    labels = np.asarray(jax.random.randint(jax.random.PRNGKey(9), (B,), 0,
                                           cfg.num_classes), np.int32)

    m_in = tmp_path / "m.bin"
    d_bin = tmp_path / "d.bin"
    m_out = tmp_path / "m_out.bin"
    write_model_bin(m_in, params, cfg)
    write_train_bin(d_bin, x, labels)
    proc = subprocess.run(
        [str(trainc_bin), str(m_in), str(d_bin), str(steps), str(lr),
         str(wd), str(m_out)], check=True, capture_output=True, text=True)
    c_losses = [float(line.split()[-1])
                for line in proc.stdout.strip().splitlines()]
    assert len(c_losses) == steps

    opt = make_optimizer(lr=lr, weight_decay=wd, fused=False)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    state = state._replace(params=jax.tree.map(jnp.asarray, params))
    step = make_train_step(cfg, opt)
    batch = {"image": jnp.asarray(x), "label": jnp.asarray(labels)}
    jax_losses = []
    for _ in range(steps):
        state, metrics = step(state, batch, None)
        jax_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(c_losses, jax_losses, rtol=5e-4)

    # final params: C model.bin vs the vitx param vector in carve order
    from vitx.interop.cbin import write_model_bin as _wmb
    ref_out = tmp_path / "ref_out.bin"
    _wmb(ref_out, jax.device_get(state.params), cfg)
    c_vec = read_model_bin(m_out, cfg)
    j_vec = read_model_bin(ref_out, cfg)
    np.testing.assert_allclose(c_vec, j_vec, rtol=5e-3, atol=2e-5)


def test_c_training_step_under_asan(trainc_bin, tmp_path):
    """Full train loop under AddressSanitizer/UBSan — the native stack's
    race/memory-safety check (SURVEY §5)."""
    from vitx.interop.cbin import write_train_bin

    asan = tmp_path / "trainc_asan"
    subprocess.run(["gcc", "-O1", "-g", "-std=c99",
                    "-fsanitize=address,undefined", "-o", str(asan),
                    str(TRAIN_SRC), "-lm"], check=True, capture_output=True)
    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=16,
                    depth=2, num_heads=2, compute_dtype="float32")
    params, x = _case(cfg, seed=1, batch=2)
    labels = np.zeros((2,), np.int32)
    m_in, d_bin, m_out = (tmp_path / n for n in ("m.bin", "d.bin", "o.bin"))
    write_model_bin(m_in, params, cfg)
    write_train_bin(d_bin, x, labels)
    proc = subprocess.run([str(asan), str(m_in), str(d_bin), "2", "1e-3",
                           "1e-4", str(m_out)], capture_output=True,
                          text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "loss" in proc.stdout
