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
