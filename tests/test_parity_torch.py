"""Logit parity vs the corrected PyTorch reference (BASELINE.md target:
<= 1e-4 relative error, fp32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vitx import ViTConfig, forward, forward_with_attn

from tests.torch_reference import TorchViT, export_to_vitx


def _parity_case(image_size, patch_size, embed_dim, depth, num_heads,
                 num_classes=10, batch=2, seed=0):
    torch.manual_seed(seed)
    model = TorchViT(
        image_size=image_size, patch_size=patch_size, num_channels=3,
        num_classes=num_classes, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads,
    ).eval()

    cfg = ViTConfig(
        image_size=image_size, patch_size=patch_size, num_channels=3,
        num_classes=num_classes, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, mlp_act="relu", head_type="reference",
        final_norm=False, qkv_bias=False, dropout=0.0,
        compute_dtype="float32",
    )
    params = jax.tree.map(jnp.asarray,
                          export_to_vitx(model, patch_size, num_heads))

    x_nchw = torch.randn(batch, 3, image_size, image_size)
    with torch.no_grad():
        ref_logits = model(x_nchw).numpy()

    x_nhwc = jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))
    return model, cfg, params, x_nhwc, ref_logits


def _rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)


@pytest.mark.parametrize(
    "image_size,patch_size,embed_dim,depth,num_heads",
    [
        (32, 8, 16, 2, 2),       # micro
        (64, 8, 64, 4, 4),       # ViT-Tiny shape (BASELINE config 1)
        (256, 16, 8, 8, 8),      # the reference notebook config (BASELINE.md)
    ],
)
def test_logit_parity(image_size, patch_size, embed_dim, depth, num_heads):
    _, cfg, params, x, ref_logits = _parity_case(
        image_size, patch_size, embed_dim, depth, num_heads, num_classes=10)
    logits = np.asarray(forward(params, x, cfg))
    assert _rel_err(logits, ref_logits) < 1e-4, _rel_err(logits, ref_logits)


def test_attention_probs_parity():
    """Per-head attention probabilities match the torch reference stash
    (the attention_probs API, reference transformer.py:39,48)."""
    model, cfg, params, x, _ = _parity_case(32, 8, 16, 2, 2)
    with torch.no_grad():
        model(torch.asarray(np.asarray(x).transpose(0, 3, 1, 2)))
    ref_probs = np.stack([blk.attn.attention_probs.numpy()
                          for blk in model.blocks])   # (L, B, H, T, T)
    _, probs = forward_with_attn(params, x, cfg)
    np.testing.assert_allclose(np.asarray(probs), ref_probs,
                               rtol=1e-4, atol=1e-6)


def test_bf16_close_to_fp32():
    """bf16 compute path stays within loose tolerance of fp32 logits."""
    _, cfg, params, x, ref_logits = _parity_case(64, 8, 64, 4, 4,
                                                 num_classes=10)
    bf16_logits = np.asarray(forward(params, x, cfg.replace(
        compute_dtype="bfloat16")))
    assert _rel_err(bf16_logits, ref_logits) < 0.05


# ---------------------------------------------------------------------------
# Bug-exact parity: run reference-train.py-trained checkpoints EXACTLY
# ---------------------------------------------------------------------------

def _train_buggy_model(tmp_path, B=4, steps=2, seed=3):
    """Train the bug-exact torch oracle like the reference's train.py would
    (AdamW + CrossEntropyLoss) and save a reference-layout .pt."""
    from tests.torch_reference import TorchBuggyViT

    torch.manual_seed(seed)
    model = TorchBuggyViT(
        image_size=32, patch_size=8, num_channels=3, num_classes=10,
        embed_dim=16, depth=2, num_heads=2, batch_size=B)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-2, weight_decay=1e-4)
    lossf = torch.nn.CrossEntropyLoss()
    model.train()
    for _ in range(steps):
        x = torch.randn(B, 3, 32, 32)
        y = torch.randint(0, 10, (B,))
        opt.zero_grad()
        loss = lossf(model(x), y)
        loss.backward()
        opt.step()
    model.eval()
    path = tmp_path / "1.pt"
    torch.save({"epoch": 1, "model_state_dict": model.state_dict(),
                "optimizer_state_dict": opt.state_dict(),
                "loss": float(loss.detach()), "step": steps}, path)
    return model, path, B


def test_bug_exact_parity_reference_trained_checkpoint(tmp_path):
    """VERDICT r2 item 3: a checkpoint trained by the reference's own
    train.py semantics (CLS appended + per-slot CLS + *sqrt(d) scaling)
    reproduces its predictions <= 1e-4 under parity='bug_exact' — and the
    import warning fires only for the corrected mode."""
    import warnings as _w

    from vitx.train.checkpoint import load_reference_pt

    model, path, B = _train_buggy_model(tmp_path)
    cfg = ViTConfig(
        image_size=32, patch_size=8, num_channels=3, num_classes=10,
        embed_dim=16, depth=2, num_heads=2, mlp_act="relu",
        head_type="reference", final_norm=False, qkv_bias=False,
        compute_dtype="float32", parity="bug_exact")

    with _w.catch_warnings():
        _w.simplefilter("error")        # bug_exact import must NOT warn
        params, meta = load_reference_pt(path, cfg)
    assert meta["epoch"] == 1
    # the full per-slot CLS survives the import
    assert np.asarray(params["cls_token"]).shape == (B, 1, 16)

    x_eval = torch.randn(B, 3, 32, 32)
    with torch.no_grad():
        ref_logits = model(x_eval).numpy()
    x_nhwc = jnp.asarray(x_eval.numpy().transpose(0, 2, 3, 1))
    logits = np.asarray(forward(params, x_nhwc, cfg))
    assert _rel_err(logits, ref_logits) < 1e-4, _rel_err(logits, ref_logits)

    # per-slot CLS is honored: the same image in different batch slots gets
    # different logits (each slot owns a distinct CLS vector) — matching
    # the torch oracle row-for-row
    x_rep = x_eval[:1].expand(B, -1, -1, -1).contiguous()
    with torch.no_grad():
        ref_rep = model(x_rep).numpy()
    got_rep = np.asarray(forward(
        params, jnp.asarray(x_rep.numpy().transpose(0, 2, 3, 1)), cfg))
    assert _rel_err(got_rep, ref_rep) < 1e-4
    assert not np.allclose(ref_rep[0], ref_rep[1])

    # corrected mode: same file loads with a warning and different outputs
    cfg_corr = cfg.replace(parity="corrected")
    with pytest.warns(UserWarning, match="corrected semantics"):
        params_corr, _ = load_reference_pt(path, cfg_corr)
    logits_corr = np.asarray(forward(params_corr, x_nhwc, cfg_corr))
    assert _rel_err(logits_corr, ref_logits) > 1e-3


def test_bug_exact_batch_size_guard():
    """bug_exact with an N-slot CLS rejects other batch sizes with a clear
    error (the reference model only runs at its training batch size)."""
    from tests.torch_reference import TorchBuggyViT
    from tests.torch_reference import export_to_vitx  # noqa: F401 (style)
    from vitx.interop import import_reference_state_dict

    torch.manual_seed(0)
    model = TorchBuggyViT(
        image_size=32, patch_size=8, num_channels=3, num_classes=10,
        embed_dim=16, depth=2, num_heads=2, batch_size=4)
    cfg = ViTConfig(
        image_size=32, patch_size=8, num_channels=3, num_classes=10,
        embed_dim=16, depth=2, num_heads=2, mlp_act="relu",
        compute_dtype="float32", parity="bug_exact")
    params = jax.tree.map(jnp.asarray,
                          import_reference_state_dict(model.state_dict(), cfg))
    x = jnp.zeros((3, 32, 32, 3))          # 3 rows vs 4 CLS slots
    with pytest.raises(ValueError, match="per-slot CLS"):
        forward(params, x, cfg)


def test_bug_exact_pt_roundtrip(tmp_path):
    """A bug_exact import exports back to a .pt the reference code accepts:
    the per-slot CLS round-trips untiled and every weight is bit-equal."""
    from vitx.interop import (export_reference_state_dict,
                              import_reference_state_dict)

    model, path, B = _train_buggy_model(tmp_path, seed=11)
    cfg = ViTConfig(
        image_size=32, patch_size=8, num_channels=3, num_classes=10,
        embed_dim=16, depth=2, num_heads=2, mlp_act="relu",
        compute_dtype="float32", parity="bug_exact")
    sd = model.state_dict()
    params = import_reference_state_dict(sd, cfg)
    sd_back = export_reference_state_dict(params, cfg, batch_size=B)
    for k, v in sd.items():
        np.testing.assert_array_equal(sd_back[k], v.numpy(), err_msg=k)
